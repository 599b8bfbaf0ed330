"""[EXT] round-5 spatial operators (SURVEY.md §2.E, r5 batch 1).

Grid-binned spatial join — the geohash/S2-cell pattern every large-scale
geo pipeline uses: points land in fixed cells of side = search radius, the
PROBE side explodes into its 3×3 cell neighborhood, candidates equi-join on
the cell id, and the exact distance predicate filters.  Cost is bounded by
cell occupancy (shuffle on the cell key), never an all-pairs theta join —
the 2-D generalization of ``range_join_binned``.

Coordinates are derived deterministically from the events table (integer
mixes of event_id/user_id onto a 1024×1024 grid) because the corpus has no
native geo columns; the metric is Chebyshev (max of |dx|,|dy|) so every
comparison stays in exact integers (no sqrt — same bit-portability
discipline as the rest of the registry; an L2 variant would compare squared
sums, also exact).  The oracle replays the same coordinates with an
all-pairs formulation inside a sampled population, proving the grid
decomposition loses no pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkmerge.queries import load, register

_GRID = 1024
_RADIUS = 8  # Chebyshev radius = cell side

# splitmix-style integer mixes (same family as ext/hashing.py) — the
# coordinates must be identically computable in DuckDB, so they are plain
# multiply/mod arithmetic on BIGINT, not engine hash builtins.  Every id is
# reduced mod a ~2^20 prime BEFORE the big multiplier so no intermediate
# exceeds ~2^52: raw ids reach 1e9+ under gen_scale's key-offset
# replication, and the original unreduced mix overflowed int64 at sf10
# (caught by tools/scale10_report.py — both engines raise on BIGINT
# overflow, so "portable" must also mean bounded).
_P = 1048573  # prime < 2^20
_XC = f"(((event_id % {_P}) * 2654435761) % 4294967296) % {_GRID}"
_YC = (
    f"((((user_id % {_P}) * 40503 + (event_id % {_P})) % {_P})"
    f" * 2246822519) % 4294967296 % {_GRID}"
)


@register(
    "join_spatial_grid",
    oracle=f"""
WITH pts AS (
  SELECT event_id AS pid,
         CAST({_XC} AS BIGINT) AS x,
         CAST({_YC} AS BIGINT) AS y
    FROM events WHERE event_id % 7 = 0
)
SELECT a.pid AS a_id, b.pid AS b_id,
       CAST(greatest(abs(a.x - b.x), abs(a.y - b.y)) AS BIGINT) AS cheb
  FROM pts a JOIN pts b
    ON a.pid < b.pid
 WHERE greatest(abs(a.x - b.x), abs(a.y - b.y)) <= {_RADIUS}
""",
    description="grid-binned spatial join (geohash/S2 pattern): points on a "
    f"{_GRID}² integer grid, all pairs within Chebyshev radius {_RADIUS} — "
    "probe side explodes into its 3×3 cell neighborhood, candidates "
    "equi-join on the cell id, exact integer predicate filters; cost "
    "bounded by cell occupancy, never all-pairs (the oracle RUNS the "
    "all-pairs formulation to certify zero lost pairs)",
)
def join_spatial_grid(spark, sf_dir):
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    ek, uk = F.col("event_id") % _P, F.col("user_id") % _P
    x = (((ek) * 2654435761) % 4294967296) % _GRID
    y = ((((uk * 40503 + ek) % _P) * 2246822519) % 4294967296) % _GRID
    pts = e.select(
        F.col("event_id").alias("pid"),
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
    )
    cx, cy = (F.col("x") / _RADIUS).cast("long"), (F.col("y") / _RADIUS).cast("long")
    build = pts.select("pid", "x", "y", cx.alias("cx"), cy.alias("cy"))
    # probe rows visit the 3×3 neighborhood of their own cell, so every pair
    # within the radius shares at least one (cell, neighbor-visit) key
    offsets = F.expr("sequence(-1, 1)")
    probe = (
        pts.select("pid", "x", "y", cx.alias("cx0"), cy.alias("cy0"))
        .withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            F.col("pid").alias("b_pid"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            (F.col("cx0") + F.col("dx")).alias("cx"),
            (F.col("cy0") + F.col("dy")).alias("cy"),
        )
    )
    cheb = F.greatest(
        F.abs(F.col("x") - F.col("bx")), F.abs(F.col("y") - F.col("by"))
    )
    return (
        build.join(probe, ["cx", "cy"])
        .filter((F.col("pid") < F.col("b_pid")) & (cheb <= _RADIUS))
        .select(
            F.col("pid").alias("a_id"),
            F.col("b_pid").alias("b_id"),
            cheb.alias("cheb"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
