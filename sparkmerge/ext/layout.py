"""Data-layout primitives for scan efficiency at scale: z-order clustering
and min/max (footer-stats) file skipping.

At 100 TB the dominant cost of most queries is the scan; the two standard
levers a table format pulls are (a) clustering correlated columns so each
file covers a narrow value range on EVERY filter column (z-order / Hilbert,
as in Delta OPTIMIZE ZORDER BY), and (b) skipping files whose footer
min/max stats cannot satisfy the predicate (Delta data skipping, Iceberg
manifests, parquet row-group pruning).  Both are implemented here against
plain parquet directories: the z-value is a native-expression bit
interleave (no UDF), and the skipping reads ONLY parquet footers — never
row data — before constructing the pruned scan.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (z-order) interleave of the low ``bits`` bits of two
    non-negative integer columns — bit i of x lands at position 2i, bit i
    of y at 2i+1.  Pure native expressions unrolled at plan-build time
    (``bits`` is a constant), so the whole key is one codegen'd chain of
    shifts and ORs — usable as a repartitionByRange /
    sortWithinPartitions key at any scale."""
    xs, ys = x.cast("long"), y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame, x: Column, y: Column, path: str, *, n_files: int, bits: int = 16
) -> None:
    """Rewrite ``df`` into ``n_files`` parquet files clustered by z-value:
    range-partition on the interleaved key, sort within each file, drop the
    helper column on write.  Each output file then covers a small rectangle
    of (x, y) space, so footer min/max on BOTH columns become selective."""
    (
        df.withColumn("_z", zorder_value(x, y, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """(file, min, max) for ``column`` per parquet data file under ``path``,
    read from footers only (pyarrow metadata — no row data is touched).
    Files with no stats for the column yield (file, None, None) and must be
    kept by any pruning decision."""
    import pyarrow.parquet as pq

    out: list[tuple[str, object, object]] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(path, name)
        md = pq.ParquetFile(full).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema != column:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    return out + [(full, None, None)]
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        out.append((full, lo, hi))
    return out


def pruned_parquet_scan(
    spark: SparkSession, path: str, column: str, lo, hi
) -> tuple[DataFrame, int, int]:
    """Scan only the files whose [min, max] for ``column`` overlaps
    [lo, hi]; returns (df, files_read, files_total).  The returned frame
    still carries the predicate as a filter — stats pruning is an
    OPTIMIZATION, never a correctness dependency (files without stats are
    conservatively kept)."""
    stats = file_column_stats(path, column)
    keep = [
        f
        for f, fmin, fmax in stats
        if fmin is None or fmax is None or (fmax >= lo and fmin <= hi)
    ]
    df = spark.read.parquet(*keep) if keep else spark.read.parquet(path).limit(0)
    return df.filter(F.col(column).between(lo, hi)), len(keep), len(stats)
