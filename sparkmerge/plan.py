"""MergePlan — schema introspection + validation.

Replaces the reference's ``#columnList`` catalog IR (sp_SimpleMerge.sql:151-201):
one row per column annotated with source/target membership, key position, type
and nullability.  The reference reads ``sys.columns`` and
``dm_exec_describe_first_result_set`` and full-outer-joins them with the split
key list (:187-191); we read ``DataFrame.schema`` (``StructType``) from both
sides — one catalog read per side, cached in the dataclass (the reference's
changelog :31-32 records the same de-duplication of catalog queries).

Validation rules enforced (reference citations):
- threshold numeric                         (:92-95)
- every key column exists in source         (:196-197)
- every key column exists in target         (:198-199)
- source columns are a subset of target     (:200-201, README.md:27-29)

The reference's copy-paste bug — a missing-source-database error that says
"Target:" (:116-119) — is deliberately fixed, per SURVEY.md §7.4.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import DataType, StructType

from sparkmerge.errors import MergeValidationError


def normalize_ident(name: str) -> str:
    """Strip whitespace and T-SQL bracket quoting from an identifier.

    Reference: ``parsename(ltrim(rtrim(s.Item)),1)`` (sp_SimpleMerge.sql:190-191).
    Also accepts backtick quoting (the Spark dialect's equivalent of quotename,
    used throughout the reference, e.g. :218,:258-261).
    """
    return name.strip().strip("[]").strip("`").strip()


def split_csv(csv: str) -> list[str]:
    """Split a CSV parameter into normalized identifiers.

    Replaces the inlined DelimitedSplit8K tally-CTE splitter
    (sp_SimpleMerge.sql:163-172) with a driver-side split; ordering is
    preserved (the reference orders by ItemNumber → joinCol, :266).
    """
    return [normalize_ident(item) for item in csv.split(",") if normalize_ident(item)]


@dataclass(frozen=True)
class ColumnInfo:
    """One row of the column-catalog IR (mirror of #columnList,
    sp_SimpleMerge.sql:154-161: name, sourceId, targetId, joinCol,
    system_type_name, is_nullable)."""

    name: str
    in_source: bool
    in_target: bool
    key_position: int | None  # 0-based position in the join key, None if non-key
    data_type: DataType | None
    nullable: bool

    @property
    def is_key(self) -> bool:
        return self.key_position is not None


@dataclass(frozen=True)
class MergePlan:
    """Validated column catalog for one merge.

    ``columns`` is ordered by target ordinal (the reference orders emitted
    fragments by targetId/sourceId, e.g. :306,:324,:371).
    """

    key_columns: list[str]
    columns: list[ColumnInfo] = field(repr=False)
    target_schema: StructType = field(repr=False)
    source_schema: StructType = field(repr=False)

    @staticmethod
    def build(target_schema: StructType, source_schema: StructType, join_columns: str | list[str]) -> "MergePlan":
        """Classify every column and enforce the reference's schema rules."""
        if isinstance(join_columns, str):
            keys = split_csv(join_columns)
        else:
            keys = [normalize_ident(k) for k in join_columns]
        if not keys:
            raise MergeValidationError("Join columns: at least one key column is required.")
        if len(keys) != len(set(keys)):
            raise MergeValidationError(f"Join columns: duplicate key column in {keys!r}.")

        t_fields = {f.name: f for f in target_schema.fields}
        s_fields = {f.name: f for f in source_schema.fields}

        # sp_SimpleMerge.sql:196-199 — key must exist on both sides.
        missing_src = [k for k in keys if k not in s_fields]
        if missing_src:
            raise MergeValidationError(f"Join columns missing from source: {missing_src!r}.")
        missing_tgt = [k for k in keys if k not in t_fields]
        if missing_tgt:
            raise MergeValidationError(f"Join columns missing from target: {missing_tgt!r}.")
        # sp_SimpleMerge.sql:200-201 — source ⊆ target (target may have extras).
        extra_src = [c for c in s_fields if c not in t_fields]
        if extra_src:
            raise MergeValidationError(
                f"Source columns not present in target: {extra_src!r} "
                f"(source must be a subset of target, README.md:27-29)."
            )

        key_pos = {k: i for i, k in enumerate(keys)}
        columns = [
            ColumnInfo(
                name=f.name,
                in_source=f.name in s_fields,
                in_target=True,
                key_position=key_pos.get(f.name),
                data_type=f.dataType,
                nullable=f.nullable or (f.name in s_fields and s_fields[f.name].nullable),
            )
            for f in target_schema.fields
        ]
        return MergePlan(
            key_columns=keys,
            columns=columns,
            target_schema=target_schema,
            source_schema=source_schema,
        )

    # ---- column-set views (each mirrors a #columnList filter) ----

    @property
    def target_columns(self) -> list[str]:
        return [c.name for c in self.columns]

    @property
    def source_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.in_source]

    @property
    def non_key_source_columns(self) -> list[str]:
        """Columns the UPDATE branch touches: in source, not in the key
        (``where joinCol is null and sourceId is not null``,
        sp_SimpleMerge.sql:304-305)."""
        return [c.name for c in self.columns if c.in_source and not c.is_key]

    @property
    def non_key_target_columns(self) -> list[str]:
        """Columns in the audit d_*/i_* image: all non-key TARGET columns —
        including target-only ones (sp_SimpleMerge.sql:367-368 filters only
        ``joinCol is null``; SURVEY.md §7.4 'audit column-set quirk')."""
        return [c.name for c in self.columns if not c.is_key]

    @property
    def target_only_columns(self) -> list[str]:
        return [c.name for c in self.columns if not c.in_source]

    @property
    def update_suppressed(self) -> bool:
        """True when every source column is in the key → no UPDATE branch
        (sp_SimpleMerge.sql:275-276, README.md:18-19)."""
        return not self.non_key_source_columns
