"""Neighbor-selection operators (SURVEY.md §2.6 T1-T3).

- knn_neighbors (T1 'nrst'): k nearest refs per destination, the
  row_number-over-distance pattern (reference interp/grps.py:147-166).
- pie_neighbors (T2 'pie'): classify refs into n_pies angular sectors around
  each destination, rank by distance within sector, then select n_nebs by
  (sector-rank, distance) — round-robin across sectors so neighbors surround
  the destination instead of clustering on one side
  (cyth/interpmthds.pyx:811-890; driver interp/grps.py:168-247).

Angle convention copied from the Cython kernel: atan(dy/dx) with quadrant
shifts (x<0 -> +pi; x>0,y<0 -> +2pi), and the quirk that dx == 0 maps to
angle 0 regardless of dy (interpmthds.pyx:848-860) — preserved for parity.

Everything is plain DataFrame algebra (window ranks over a distance join):
broadcast the destination set when small, otherwise a bucketed range join
feeds the same ranking.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W, functions as F


def _dist(ax, ay, bx, by):
    return F.sqrt((ax - bx) ** 2 + (ay - by) ** 2)


# join_on=None cross-joins EVERY dst row against the whole refs table — the
# all-neighbors semantic (T3) is only sane for dim-sized refs (coords
# tables). The loud bound stops a future caller from feeding a fact table
# into an O(dst x refs) plan (VERDICT r7 next-step #5).
CROSSJOIN_REFS_MAX = 1_000_000


def _crossjoin_guard(refs: DataFrame, fn_name: str) -> None:
    n = refs.limit(CROSSJOIN_REFS_MAX + 1).count()
    if n > CROSSJOIN_REFS_MAX:
        raise ValueError(
            f"{fn_name}: join_on=None cross-joins every dst row against "
            f"the refs table, which has more than {CROSSJOIN_REFS_MAX:,} "
            "rows — pass join_on (a cluster key) or pre-bucket the refs"
        )


def knn_neighbors(
    dst: DataFrame, refs: DataFrame, k: int,
    join_on: str | None = "cluster_id",
    id_cols: tuple[str, str] = ("conv_id", "conv_id"),
) -> DataFrame:
    """(dst_id, neighbor_id, dist, rn<=k), deterministic rank tiebreak."""
    d = dst.select(
        F.col(id_cols[0]).alias("dst_id"), F.col("x").alias("dx"),
        F.col("y").alias("dy"),
        *( [F.col(join_on).alias("_j")] if join_on else [] ),
    )
    r = refs.select(
        F.col(id_cols[1]).alias("neighbor_id"), F.col("x").alias("rx"),
        F.col("y").alias("ry"),
        *( [F.col(join_on).alias("_jr")] if join_on else [] ),
    )
    if join_on:
        j = d.join(r, F.col("_j") == F.col("_jr"))
    else:
        _crossjoin_guard(refs, "knn_neighbors")
        j = d.crossJoin(r)
    j = j.where(F.col("dst_id") != F.col("neighbor_id"))
    j = j.withColumn("dist", F.round(_dist(F.col("dx"), F.col("dy"), F.col("rx"), F.col("ry")), 4))
    w = W.partitionBy("dst_id").orderBy("dist", "neighbor_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("dst_id", "neighbor_id", "dist", "rn")
    )


def horizon_pairs(
    gaps: DataFrame,
    refs: DataFrame,
    horizon: int,
    key: str = "conv_id",
    gt_col: str = "gt",
    rt_col: str = "rt",
    explode_side: str = "gaps",
) -> DataFrame:
    """All (gap, ref) pairs of the same key within |gt-rt| <= horizon,
    WITHOUT an unbounded per-key join (VERDICT r1 'What's wrong #4'): one
    side explodes into its 3 neighboring horizon buckets and joins the
    other on (key, bucket), so per-join-key pair width is bounded by the
    rows in one horizon window — a mega-key costs O(rows * horizon_density),
    never O(G*R). Each qualifying pair matches exactly once (the unexploded
    row's own bucket is one of the exploded row's 3 membership buckets, and
    memberships are distinct).

    explode_side: which side pays the 3x row explode before the shuffle —
    pick the SMALLER one (VERDICT r2 #3: a sparse spine has far more gaps
    than refs, so 'refs' cuts the shuffled volume; output is identical
    because bucket membership is symmetric: gb in {rb-1,rb,rb+1} iff
    rb in {gb-1,gb,gb+1}).
    """
    gd = F.floor(F.col(gt_col) / F.lit(horizon))
    rd = F.floor(F.col(rt_col) / F.lit(horizon))
    if explode_side == "gaps":
        g = gaps.withColumn("_hb", F.explode(F.array(gd - 1, gd, gd + 1)))
        r = refs.withColumn("_hb", rd)
    elif explode_side == "refs":
        g = gaps.withColumn("_hb", gd)
        r = refs.withColumn("_hb", F.explode(F.array(rd - 1, rd, rd + 1)))
    else:
        raise ValueError(explode_side)
    return (
        g.join(r, [key, "_hb"])
        .where(F.abs(F.col(gt_col) - F.col(rt_col)) <= horizon)
        .drop("_hb")
    )


def pie_sector_col(dx_col, dy_col, n_pies: int):
    """Sector index 0..n_pies-1 per the reference's quadrant logic."""
    x = dx_col
    y = dy_col
    two_pi = 2.0 * math.pi
    ang = F.atan(y / x)
    ang = (
        F.when(x == 0, F.lit(0.0))
        .when(x < 0, ang + F.lit(math.pi))
        .when((x > 0) & (y < 0), ang + F.lit(two_pi))
        .otherwise(ang)
    )
    return F.floor(ang * n_pies / two_pi).cast("int")


def pie_neighbors(
    dst: DataFrame, refs: DataFrame, n_nebs: int, n_pies: int = 8,
    join_on: str | None = "cluster_id",
    id_cols: tuple[str, str] = ("conv_id", "conv_id"),
) -> DataFrame:
    """(dst_id, neighbor_id, sector, dist, pie_rank, rn<=n_nebs)."""
    d = dst.select(
        F.col(id_cols[0]).alias("dst_id"), F.col("x").alias("dx"),
        F.col("y").alias("dy"),
        *( [F.col(join_on).alias("_j")] if join_on else [] ),
    )
    r = refs.select(
        F.col(id_cols[1]).alias("neighbor_id"), F.col("x").alias("rx"),
        F.col("y").alias("ry"),
        *( [F.col(join_on).alias("_jr")] if join_on else [] ),
    )
    if join_on:
        j = d.join(r, F.col("_j") == F.col("_jr"))
    else:
        _crossjoin_guard(refs, "pie_neighbors")
        j = d.crossJoin(r)
    j = j.where(F.col("dst_id") != F.col("neighbor_id"))
    xd = F.col("rx") - F.col("dx")
    yd = F.col("ry") - F.col("dy")
    j = j.select(
        "dst_id", "neighbor_id",
        F.round(_dist(F.col("dx"), F.col("dy"), F.col("rx"), F.col("ry")), 4).alias("dist"),
        pie_sector_col(xd, yd, n_pies).alias("sector"),
    )
    w_sector = W.partitionBy("dst_id", "sector").orderBy("dist", "neighbor_id")
    j = j.withColumn("pie_rank", F.row_number().over(w_sector) - 1)
    w_all = W.partitionBy("dst_id").orderBy("pie_rank", "dist", "neighbor_id")
    return (
        j.withColumn("rn", F.row_number().over(w_all))
        .where(F.col("rn") <= n_nebs)
        .select("dst_id", "neighbor_id", "sector", "dist", "pie_rank", "rn")
    )
