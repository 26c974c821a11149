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
      would be counted into ``total_col`` by the band aggregate but
      dropped by the offsets equi-join (NULL never equals NULL), so it
      vanishes from the output while still inflating every survivor's
      denominator — filter NULLs out (or band them explicitly) first.
    - ``df`` carries no column named ``rank_col``, ``total_col``, or
      the internals ``_rn_in``/``_n_band``/``_offset``; collisions are
      silently overwritten/shadowed.

    Returns all input columns plus ``rank_col`` and ``total_col``.
    """
    group = list(group)
    w_in = W.partitionBy(*group, band).orderBy(*order)
    ranked = df.withColumn("_rn_in", F.row_number().over(w_in))
    sub = df.groupBy(*group, band).agg(F.count(F.lit(1)).alias("_n_band"))
    w_band = (W.partitionBy(*group) if group else W).orderBy(band).rowsBetween(
        W.unboundedPreceding, -1
    )
    offsets = sub.select(
        *group,
        band,
        F.coalesce(F.sum("_n_band").over(w_band), F.lit(0)).alias("_offset"),
    )
    totals = (
        sub.groupBy(*group).agg(F.sum("_n_band").alias(total_col))
        if group
        else sub.agg(F.sum("_n_band").alias(total_col))
    )
    out = ranked.join(F.broadcast(offsets), group + [band])
    out = out.join(F.broadcast(totals), group) if group else out.join(
        F.broadcast(totals)
    )
    return out.withColumn(rank_col, F.col("_offset") + F.col("_rn_in")).drop(
        "_rn_in", "_offset"
    )
