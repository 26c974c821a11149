"""operators/banded_rank.banded_global_rank — equivalence with the
single-task window it replaces, on adversarial synthetic frames (ties
across band boundaries, negative values, empty bands, single group,
multi group)."""

from pyspark.sql import Window as W, functions as F


def _reference(df, order_cols, group):
    w = (W.partitionBy(*group) if group else W).orderBy(*order_cols)
    wt = W.partitionBy(*group) if group else W.partitionBy()
    return df.withColumn("r", F.row_number().over(w)).withColumn(
        "n_total", F.count(F.lit(1)).over(wt)
    )


def _check(spark, rows, band_expr, order_cols, group):
    from etl_gcp_function_tmabrasil_spark.operators.banded_rank import (
        banded_global_rank,
    )

    df = spark.createDataFrame(rows, "g string, v double, id long")
    banded = df.withColumn("band", band_expr)
    got = {
        (r.g, r.id): (r.r, r.n_total)
        for r in banded_global_rank(banded, "band", order_cols, group=group).collect()
    }
    want = {
        (r.g, r.id): (r.r, r.n_total)
        for r in _reference(df, order_cols, group).collect()
    }
    assert got == want


def test_matches_single_window_grouped(spark):
    rows = [
        ("a", 1.0, 1), ("a", 1.0, 2), ("a", -3.5, 3), ("a", 99.9, 4),
        ("b", 0.0, 5), ("b", 0.0, 6), ("b", 0.0, 7),
        ("c", -1.0, 8),
    ]
    _check(
        spark,
        rows,
        F.floor(F.col("v") / 2.0).cast("long"),
        [F.asc("v"), F.asc("id")],
        ["g"],
    )


def test_matches_single_window_global_desc(spark):
    # DESC ordering needs a band monotone in the DESC order: floor(-v/w)
    rows = [("x", float(v % 7), i) for i, v in enumerate(range(40))]
    _check(
        spark,
        rows,
        F.floor(-F.col("v") / 2.0).cast("long"),
        [F.desc("v"), F.asc("id")],
        [],
    )


def test_band_boundary_ties(spark):
    # equal values landing exactly on a band edge, tiebroken by id —
    # the within-band rank and the prefix offset must compose exactly
    rows = [("t", 2.0, i) for i in range(10)] + [("t", 4.0, i + 10) for i in range(10)]
    _check(
        spark,
        rows,
        F.floor(F.col("v") / 2.0).cast("long"),
        [F.asc("v"), F.asc("id")],
        ["g"],
    )


def test_empty_frame(spark):
    from etl_gcp_function_tmabrasil_spark.operators.banded_rank import (
        banded_global_rank,
    )

    df = spark.createDataFrame([], "g string, v double, id long").withColumn(
        "band", F.floor("v").cast("long")
    )
    assert banded_global_rank(df, "band", ["v", "id"], group=["g"]).count() == 0
