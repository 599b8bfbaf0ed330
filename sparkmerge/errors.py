"""Error types (replaces throw 50000 / raiserror, sp_SimpleMerge.sql:128,195-201,483).

The reference distinguishes fatal validation throws (``throw 50000`` —
sp_SimpleMerge.sql:128) from runtime ``raiserror(...,16,1)`` (severity 16 does
NOT abort the batch — the source of the stamp-after-rollback quirk at :488-491
that we deliberately do not replicate).  We map them to two exception types and
always abort on both.
"""

from __future__ import annotations


class MergeError(Exception):
    """Base class for all sparkmerge errors."""


class MergeValidationError(MergeError):
    """Parameter/schema validation failure (reference: throw 50000,
    sp_SimpleMerge.sql:82-128 and :194-201)."""


class MergeConflictError(MergeError):
    """Optimistic-concurrency failure: another writer committed a version
    after this merge read its snapshot, so publishing would silently drop
    the other writer's changes.  The analog of a serialization failure in
    the reference's transaction (sp_SimpleMerge.sql:470-479); retry the
    merge against the new current version."""

    def __init__(self, expected: int, found: int):
        self.expected = expected
        self.found = found
        super().__init__(
            f"Commit conflict: expected current version {expected}, found "
            f"{found} — a concurrent writer committed first. Retry the merge."
        )


class MergeThresholdExceeded(MergeError):
    """Variance guard tripped: the merge changed more rows than the caller's
    threshold allows; the snapshot pointer was NOT swapped (reference:
    rollback + raiserror, sp_SimpleMerge.sql:478-484)."""

    def __init__(self, variance: float, threshold: float, changed: int, target_count: int):
        self.variance = variance
        self.threshold = threshold
        self.changed = changed
        self.target_count = target_count
        super().__init__(
            f"Merge aborted: variance {variance:.1f}% exceeds threshold "
            f"{threshold:.1f}% ({changed} changed rows / {target_count} target rows). "
            f"Target snapshot unchanged."
        )
