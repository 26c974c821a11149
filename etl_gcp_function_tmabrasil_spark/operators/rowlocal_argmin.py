"""Row-local argmin / top-N over a broadcast centroid array — the
zero-shuffle assignment core shared by the k-means trainer
(operators/kmeans._assign) and the IVF cell-probe query
(queries/similarity.ann_ivf_cosine).

All K centroids ride in ONE broadcast array-of-structs row; the
winning cell (or the N best cells) is then a row-local expression over
that array — assignment is a scan-speed projection with ZERO shuffle.
The tempting min_by/groupBy formulation is wrong twice over: it
shuffles the K× row expansion, and min_by's struct-with-array
accumulator forces ObjectHashAggregate, whose 128-distinct-key sort
fallback degenerates to sorting the whole expansion.

`metric_sql` is a Spark-SQL snippet evaluated per centroid struct `c`
(fields as passed to :func:`centroid_array`) with the data row's
columns in scope. Round the metric before comparison and the winner is
rounding-stable across engines; ties break on the lower cell_id
(struct comparison is field-ordered: metric first, then cell_id).
Built as SQL text, not Column lambdas — see dedup_approx's note on
PySpark mis-resolving same-shaped transform() lambdas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def centroid_array(cent: DataFrame, *cols: str) -> DataFrame:
    """All centroids as one broadcast single-row array<struct> column
    `cents`, sorted by the first field (cell_id) for determinism."""
    return F.broadcast(
        cent.groupBy().agg(
            F.array_sort(F.collect_list(F.struct(*cols))).alias("cents")
        )
    )


def _metric_structs(metric_sql: str) -> str:
    return (
        "transform(cents, c -> named_struct("
        f" 'metric', {metric_sql},"
        " 'cell_id', c.cell_id))"
    )


def argmin_cell(metric_sql: str) -> Column:
    """(metric, cell_id) struct of the minimizing centroid."""
    return F.expr(f"array_min({_metric_structs(metric_sql)})")


def top_cells(metric_sql: str, n: int) -> Column:
    """The n (metric, cell_id) structs with the smallest metric,
    ascending — row-local: sort the K-element struct array, slice."""
    return F.expr(f"slice(array_sort({_metric_structs(metric_sql)}), 1, {n})")
