"""Distributed EXACT quantiles without per-group buffering — the
two-pass banded-rank algorithm, reusable across queries.

Spark's exact `percentile` aggregate collects each group's full value
multiset into executor memory (the canonical OOM at 100 TB), and
`percentile_approx` changes answers. This computes the same
linear-interpolated quantiles as `percentile`/DuckDB's quantile_cont
with O(bands) memory:

1. count rows per (group, value-band) — tiny partial+final agg;
2. exclusive prefix over each group's band table gives band rank
   offsets; each requested quantile p needs the values at 0-based
   ranks floor/ceil((N-1)·p);
3. re-scan ONLY the bands containing needed ranks (broadcast band
   list), rank within band by value: global rank = offset + rn − 1;
4. interpolate per group from the picked values (double arithmetic
   identical to `percentile`).

Equivalence vs the buffering aggregate is pinned in
tests/test_distributed_rank_equivalence.py (ties, single-row, band
boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def banded_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: dict[str, float],
    band_width: float = 1000.0,
    round_to: int = 4,
) -> DataFrame:
    """Exact per-group quantiles of `value_col`, one output column per
    entry of `quantiles` (name -> p), plus n_total/min/max columns.

    `band_width` is the scale knob: band-table size = value-range /
    band_width rows per group (keep it thousands-to-millions, never
    O(rows)); the pass-2 re-scan touches ~|needed ranks| bands.

    NULLs in `value_col` are ignored, matching Spark `percentile` and
    DuckDB `quantile_cont` (without the filter they would inflate
    n_total and land in a NULL band, shifting every rank).
    """
    d = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.floor(F.col(value_col) / band_width).cast("long").alias("band"),
    )
    # one scan of d yields band counts AND per-band min/max; totals
    # (n_total, global min/max) then roll up from the band table — no
    # second full-table scan, and the shared groupBy(g, band) exchange
    # is computed once (ReusedExchange) for both consumers
    bc = d.groupBy("g", "band").agg(
        F.count(F.lit(1)).alias("n_band"),
        F.min("v").alias("bmin"),
        F.max("v").alias("bmax"),
    )
    w_off = W.partitionBy("g").orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    bands = bc.withColumn("offset", F.coalesce(F.sum("n_band").over(w_off), F.lit(0)))
    totals = bc.groupBy("g").agg(
        F.sum("n_band").alias("n_total"),
        F.min("bmin").alias("min_v"),
        F.max("bmax").alias("max_v"),
    )
    rank_exprs = []
    for p in set(quantiles.values()):
        rp = (F.col("n_total") - 1) * F.lit(p)
        rank_exprs += [F.floor(rp).cast("long"), F.ceil(rp).cast("long")]
    needed = totals.select(
        "g", F.explode(F.array_distinct(F.array(*rank_exprs))).alias("rk_needed")
    )
    target_bands = (
        bands.join(F.broadcast(needed), "g")
        .filter(
            (F.col("rk_needed") >= F.col("offset"))
            & (F.col("rk_needed") < F.col("offset") + F.col("n_band"))
        )
        .select("g", "band", "offset")
        .distinct()
    )
    w_in = W.partitionBy("g", "band").orderBy("v")
    ranked = d.join(F.broadcast(target_bands), ["g", "band"]).select(
        "g", "v", (F.col("offset") + F.row_number().over(w_in) - 1).alias("rk")
    )
    nd = needed.select(F.col("g").alias("ng"), "rk_needed")
    picked = ranked.join(
        F.broadcast(nd),
        (F.col("g") == F.col("ng")) & (F.col("rk") == F.col("rk_needed")),
    ).select("g", "rk", "v")
    gathered = picked.groupBy("g").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("rk", "v")))
        ).alias("vals")
    )
    out_cols = []
    for name, p in quantiles.items():
        rp = (F.col("n_total") - 1) * F.lit(p)
        lo, hi = F.floor(rp).cast("long"), F.ceil(rp).cast("long")
        v_lo, v_hi = F.col("vals")[lo], F.col("vals")[hi]
        out_cols.append(F.round(v_lo + (rp - lo) * (v_hi - v_lo), round_to).alias(name))
    return (
        totals.join(gathered, "g")
        .select(
            F.col("g").alias(group_col),
            *out_cols,
            F.col("n_total"),
            F.col("min_v"),
            F.col("max_v"),
        )
    )
