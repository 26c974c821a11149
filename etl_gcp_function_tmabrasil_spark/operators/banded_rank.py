"""Distributed global rank via value banding — the shared two-pass
machinery behind window_ntile, window_cume_dist, and any other global
ORDER BY rank that must not serialize the corpus through one window
task.

A bare ``row_number()/ntile()/percent_rank() OVER (ORDER BY ...)``
(no PARTITION BY, or a low-cardinality one) moves every row of the
partition through a single task. When the caller can supply a *band*
column that is monotone non-decreasing in the sort order (e.g.
``floor(price / width)``), the global rank decomposes exactly:

1. within-(group, band) ``row_number`` — shuffles on the band key,
   fully parallel;
2. per-(group, band) counts → exclusive prefix sum over the tiny band
   table (the ONLY single-task data: one row per band);
3. broadcast the offsets back: global rank = band offset + within-band
   row_number. Bit-identical to the single-task window, parallelism =
   groups × bands.

Skew lives in the band width knob (value-range/width tasks per band);
AQE skew-split handles residue.

Reference parity: re-expresses the ranking-window surface of
SURVEY.md §2.2 (reference main.py:1-17 delegates all transformation
semantics to its ETL placeholder).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def banded_global_rank(
    df: DataFrame,
    band: str,
    order: Sequence[Column | str],
    group: Sequence[str] = (),
    rank_col: str = "r",
    total_col: str = "n_total",
) -> DataFrame:
    """Annotate ``df`` with its 1-based global rank under ``order``
    (within ``group``, if given) and the group row count.

    ``band`` names an existing column that must be monotone
    NON-DECREASING in ``order`` within each group — band order then
    concatenates with within-band order into the total order. ``order``
    must be a total order (unique tiebreaker) for the rank to be
    deterministic.

    Contract (caller must guarantee — same hazard quantiles.py
    documents for its band table):

    - ``band`` and the ``order`` keys are NON-NULL. A NULL band row
      would be counted into ``total_col`` by the band aggregate and
      then poison the map-based offset fold: ``map_from_entries``
      rejects a NULL key at runtime (Spark 4 raises
      NULL_MAP_KEY/ANSI error) or, where the band list drops it, the
      row's ``element_at`` lookup yields a NULL rank while still
      inflating every survivor's denominator — filter NULLs out (or
      band them explicitly) first.
    - ``df`` carries no column named ``rank_col``, ``total_col``, or
      the internals ``_rn_in``/``_n_band``/``_bs``/``_offmap``;
      collisions are silently overwritten/shadowed.

    Returns all input columns plus ``rank_col`` and ``total_col``.
    """
    group = list(group)
    w_in = W.partitionBy(*group, band).orderBy(*order)
    ranked = df.withColumn("_rn_in", F.row_number().over(w_in))
    sub = df.groupBy(*group, band).agg(F.count(F.lit(1)).alias("_n_band"))
    # Band-table orchestration folded row-locally (r15; the
    # banded_exact_quantiles lesson): the old shape planned a window
    # over the band table PLUS two broadcast builds (offsets, totals)
    # over frames that are O(bands) by construction. Gather each
    # group's band list into ONE row, compute the exclusive prefix sum
    # with an aggregate() fold, and ship offsets back as a single
    # broadcast band→offset MAP per group — one aggregation and one
    # broadcast build instead of one window, two aggregations and two
    # broadcast builds. Bit-identical: the fold walks the same sorted
    # band order the window did.
    grouped = (
        sub.groupBy(*group)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(band).alias("b"), "_n_band"))
            ).alias("_bs"),
            F.sum("_n_band").alias(total_col),
        )
        .select(
            *group,
            total_col,
            F.expr(
                "map_from_entries(zip_with(_bs,"
                " slice(aggregate(_bs, array(cast(0 as bigint)),"
                "   (a, x) -> array_append(a, element_at(a, -1) + x._n_band)),"
                "   1, size(_bs)),"
                " (x, o) -> struct(x.b as key, o as value)))"
            ).alias("_offmap"),
        )
    )
    out = (
        ranked.join(F.broadcast(grouped), group)
        if group
        else ranked.crossJoin(F.broadcast(grouped))
    )
    return out.withColumn(
        rank_col, F.element_at("_offmap", F.col(band)) + F.col("_rn_in")
    ).drop("_rn_in", "_offmap", "_bs")
