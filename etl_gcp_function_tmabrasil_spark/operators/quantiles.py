"""Distributed EXACT quantiles without per-group buffering — the
two-pass banded-rank algorithm, reusable across queries.

Spark's exact `percentile` aggregate collects each group's full value
multiset into executor memory (the canonical OOM at 100 TB), and
`percentile_approx` changes answers. This computes the same
linear-interpolated quantiles as `percentile`/DuckDB's quantile_cont
with O(bands) memory:

1. count rows per (group, value-band) — tiny partial+final agg;
2. gather each group's O(bands) band table into one row and fold it
   row-locally: each requested quantile p needs the values at 0-based
   ranks floor/ceil((N-1)·p), and one linear pass per needed rank
   finds the containing band plus its exclusive cumulative offset
   (O(bands × ranks), replacing the window/join/distinct orchestration
   that cost four exchanges over bounded frames);
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
    # one scan of d yields band counts AND per-band min/max
    bc = d.groupBy("g", "band").agg(
        F.count(F.lit(1)).alias("n_band"),
        F.min("v").alias("bmin"),
        F.max("v").alias("bmax"),
    )
    # collapse the band-table orchestration (offsets window + totals
    # rollup + needed-ranks explode + containing-band join + distinct —
    # four exchanges and two broadcast builds over bounded frames in the
    # r14 shape) into ONE row per group: the band list is O(bands) by
    # construction, so gathering it and folding row-locally is exact
    # and bounded (r15; measured at sf0.1: agg_robust_outliers, which
    # runs this twice, 3.53 s -> 3.03 s min-of-4 head-to-head)
    grp = bc.groupBy("g").agg(
        F.array_sort(
            F.collect_list(F.struct("band", "n_band", "bmin", "bmax"))
        ).alias("bs"),
        F.sum("n_band").alias("n_total"),
        F.min("bmin").alias("min_v"),
        F.max("bmax").alias("max_v"),
    )
    rank_exprs = []
    for p in set(quantiles.values()):
        rp = (F.col("n_total") - 1) * F.lit(p)
        rank_exprs += [F.floor(rp).cast("long"), F.ceil(rp).cast("long")]
    grp = grp.withColumn("rks", F.array_distinct(F.array(*rank_exprs)))
    # per-rank linear fold: for each needed rank one O(bands) pass over
    # the sorted band list records the band containing it and that
    # band's exclusive cumulative offset — O(bands x ranks) total,
    # never O(bands^2) (no array-accumulator append). Every new struct
    # field reads only OLD accumulator fields (Spark aggregate()
    # semantics, pinned in the round-9 fold probes), so the running
    # count and the first-hit latch cannot race.
    grp = grp.withColumn(
        "tb",
        F.expr(
            "array_distinct(transform(rks, rk -> aggregate(bs,"
            " named_struct('cum', cast(0 as bigint),"
            "              'band', cast(null as bigint),"
            "              'off', cast(null as bigint)),"
            " (s, b) -> named_struct("
            "   'cum', s.cum + b.n_band,"
            "   'band', if(s.band is null and rk < s.cum + b.n_band, b.band, s.band),"
            "   'off', if(s.band is null and rk < s.cum + b.n_band, s.cum, s.off)),"
            " s -> named_struct('band', s.band, 'offset', s.off))))"
        ),
    )
    target_bands = grp.select("g", "rks", F.explode("tb").alias("o")).select(
        "g",
        "rks",
        F.col("o.band").alias("band"),
        F.col("o.offset").alias("offset"),
    )
    w_in = W.partitionBy("g", "band").orderBy("v")
    ranked = d.join(F.broadcast(target_bands), ["g", "band"]).select(
        "g",
        "v",
        "rks",
        (F.col("offset") + F.row_number().over(w_in) - 1).alias("rk"),
    )
    picked = ranked.filter(F.expr("array_contains(rks, rk)")).select(
        "g", "rk", "v"
    )
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
        grp.join(gathered, "g")
        .select(
            F.col("g").alias(group_col),
            *out_cols,
            F.col("n_total"),
            F.col("min_v"),
            F.col("max_v"),
        )
    )


def banded_weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    band_width: float = 1000.0,
) -> DataFrame:
    """Exact WEIGHTED median per group with O(bands) state: the
    smallest value v whose cumulative weight (value peers pooled)
    reaches half the group total — identical to the single-window
    formulation ``filter(2*cumw >= total).min(v)`` but without a
    per-group sort over every row (r15; the agg_weighted_median
    rewrite):

    1. one scan sums weights per (group, value-band) — tiny agg;
    2. the O(bands) band list gathers into one row per group and a
       row-local fold finds the CROSSING band (first band whose
       through-weight doubles to >= total) plus its exclusive weight
       offset — every value below that band provably cannot cross;
    3. re-scan ONLY the crossing band (broadcast), pool weights per
       distinct value, one within-band running sum gives cumw =
       offset + running, and min(v | 2*cumw >= total) is the answer.

    All weight arithmetic stays in exact decimals (inputs are cast to
    DECIMAL(18,2); the fold accumulates DECIMAL(28,2) — the widened
    sum type), so band grouping cannot move the crossing by even one
    peer group. Returns (group_col, weighted_median DOUBLE,
    total_weight DOUBLE).
    """
    d = df.select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(weight_col).cast("decimal(18,2)").alias("w"),
        F.floor(F.col(value_col) / band_width).cast("long").alias("band"),
    )
    bc = d.groupBy("g", "band").agg(F.sum("w").alias("wb"))
    grp = bc.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("band", "wb"))).alias("bs"),
        F.sum("wb").alias("total"),
    )
    # row-local crossing-band fold (same accumulator discipline as the
    # rank fold above: every new field reads only OLD fields)
    grp = grp.withColumn(
        "tb",
        F.expr(
            "aggregate(bs,"
            " named_struct('cum', cast(0 as decimal(28,2)),"
            "              'band', cast(null as bigint),"
            "              'off', cast(null as decimal(28,2))),"
            " (s, b) -> named_struct("
            "   'cum', cast(s.cum + b.wb as decimal(28,2)),"
            "   'band', if(s.band is null and 2 * (s.cum + b.wb) >= total,"
            "              b.band, s.band),"
            "   'off', if(s.band is null and 2 * (s.cum + b.wb) >= total,"
            "             s.cum, s.off)),"
            " s -> named_struct('band', s.band, 'off', s.off))"
        ),
    )
    target = grp.select(
        "g",
        "total",
        F.col("tb.band").alias("band"),
        F.col("tb.off").alias("off"),
    )
    inband = (
        d.join(F.broadcast(target), ["g", "band"])
        .groupBy("g", "v")
        .agg(
            F.sum("w").alias("wv"),
            F.first("off").alias("off"),
            F.first("total").alias("total"),
        )
    )
    w_run = W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    crossed = inband.select(
        "g",
        "v",
        "total",
        (F.col("off") + F.sum("wv").over(w_run)).alias("cumw"),
    ).filter(F.col("cumw") * 2 >= F.col("total"))
    return crossed.groupBy("g").agg(
        F.min("v").cast("double").alias("weighted_median"),
        F.max("total").cast("double").alias("total_weight"),
    ).select(
        F.col("g").alias(group_col), "weighted_median", "total_weight"
    )
