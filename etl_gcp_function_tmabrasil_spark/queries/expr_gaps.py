"""Expression-surface gap fill (SURVEY.md §2.2 scalar/window/agg rows):
cume_dist distribution windows, JSON encoding (to_json), higher-order
array predicates (forall/exists/flatten/slice), regexp_extract_all,
bitwise aggregates, deterministic string aggregation, and try_-prefixed
error-safe arithmetic.

All row-local expressions here are whole-stage-codegen projections; the
two aggregating queries use standard partial+final hash aggregation.
Parity notes: Spark's to_json omits null struct fields, so encoded
structs are built from non-null columns only; string aggregation is made
deterministic by sorting (Spark: array_sort(collect_set), DuckDB:
string_agg(DISTINCT .. ORDER BY)) — never rely on arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from etl_gcp_function_tmabrasil_spark.catalog import load_table


_CUME_BAND = 1000.0  # price-band width for the distributed rank


def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: cume_dist and percent_rank of each
    order's price within its priority class, deterministically ordered
    by (o_totalprice, o_orderkey).

    o_orderpriority has FIVE values, so the naive window moves a fifth
    of the corpus through each window task. Because the ordering is
    unique (o_orderkey tiebreak), percent_rank and cume_dist reduce to
    pure rank arithmetic — pr = r/(N−1), cd = (r+1)/N over the 0-based
    group rank r — and r comes from the banded two-pass rank (the
    window_ntile machinery, here per group): within-(group, band)
    row_number + prefix offsets over the per-group band table. Same
    output, full parallelism across (group × band).
    """
    from etl_gcp_function_tmabrasil_spark.operators.banded_rank import (
        banded_global_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.floor(F.col("o_totalprice") / _CUME_BAND).cast("long").alias("band"),
    )
    ranked = banded_global_rank(
        d,
        "band",
        ["o_totalprice", "o_orderkey"],
        group=["o_orderpriority"],
    )
    r = F.col("r") - 1  # 0-based group rank
    pr = F.when(
        F.col("n_total") > 1, r / (F.col("n_total") - 1)
    ).otherwise(F.lit(0.0))
    cd = (r + 1) / F.col("n_total")
    return (
        ranked.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(pr, 6).alias("pr"),
            F.round(cd, 6).alias("cd"),
        )
    )


_CUME_SQL = """
SELECT o_orderkey, o_orderpriority,
  ROUND(percent_rank() OVER w, 6) AS pr,
  ROUND(cume_dist() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
"""


def func_json_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON encoding: serialize a projected struct per event with
    to_json (the write-side twin of events_json's from_json). Fields are
    non-null (event_type, user_id, rounded value) because Spark's
    to_json drops null fields while DuckDB renders them."""
    events = load_table(spark, sf_dir, "events")
    payload = F.to_json(
        F.struct(
            F.col("event_type"),
            F.col("user_id"),
            F.round("value", 2).alias("value"),
        )
    )
    return (
        events.filter(F.col("value").isNotNull())
        .select("event_id", payload.alias("payload"))
    )


_JSON_ENCODE_SQL = """
SELECT event_id,
  to_json({'event_type': event_type, 'user_id': user_id,
           'value': ROUND(value, 2)}) AS payload
FROM events WHERE value IS NOT NULL ORDER BY event_id
"""


def func_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array predicates and nested-array ops per document:
    forall (every token non-empty), exists (contains 'spark'),
    flatten+slice (first-2 + last-2 edge gram), and regexp_extract_all
    match counting. All row-local — scan-speed at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "text", F.split("text", " ").alias("toks"))
    return d.select(
        "doc_id",
        F.forall("toks", lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.exists("toks", lambda t: t == "spark").alias("has_spark"),
        # last-2 via a clamped positive start: slice(toks, -2, 2) returns
        # [] for a 1-element array where DuckDB's toks[-2:] clamps and
        # keeps the element — greatest(1, n-1) gives both engines the
        # same "last min(2, n) tokens" semantics for every n
        F.concat_ws(
            " ",
            F.flatten(
                F.array(
                    F.slice("toks", 1, 2),
                    F.slice(
                        F.col("toks"),
                        F.greatest(F.lit(1), F.size("toks") - 1),
                        2,
                    ),
                )
            ),
        ).alias("edge_gram"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]*a[a-z]*"), 0)).alias(
            "n_a_words"
        ),
    )


# edge_gram COALESCEs to '' for NULL text: Spark's concat_ws never
# returns NULL (it skips NULL inputs), DuckDB's array_to_string does.
_ARRAY_PRED_SQL = """
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
  len(list_filter(toks, t -> len(t) = 0)) = 0 AS all_nonempty,
  list_contains(toks, 'spark') AS has_spark,
  COALESCE(array_to_string(flatten([toks[1:2], toks[-2:]]), ' '), '') AS edge_gram,
  CAST(len(regexp_extract_all(text, '[a-z]*a[a-z]*')) AS INT) AS n_a_words
FROM d ORDER BY doc_id
"""


def agg_bitwise_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/bit_or/bit_xor over nation keys) plus
    deterministic string aggregation (sorted distinct nation-key list)
    per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.bit_and("c_nationkey").alias("nk_and"),
            F.bit_or("c_nationkey").alias("nk_or"),
            F.bit_xor("c_nationkey").alias("nk_xor"),
            F.concat_ws(",", F.array_sort(F.collect_set("c_nationkey"))).alias(
                "nations_csv"
            ),
        )
        .orderBy("c_mktsegment")
    )


_BITWISE_SQL = """
SELECT c_mktsegment,
  bit_and(c_nationkey) AS nk_and,
  bit_or(c_nationkey) AS nk_or,
  bit_xor(c_nationkey) AS nk_xor,
  array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations_csv
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def func_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic: try_divide returns NULL on zero
    denominators instead of failing/Inf — per-line discount-unit price
    with an engineered zero for every 7th row.

    Rounded at 9 decimals, not 4: price(2dp)/quantity quotients can sit
    exactly on a 4dp half-boundary, where Spark (BigDecimal of the
    shortest decimal repr, HALF_UP) and DuckDB (binary-value rounding)
    legitimately disagree by 1ulp; no quotient of this domain terminates
    exactly on a 9dp half-boundary, so both engines agree there."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    denom = F.when(F.col("l_linenumber") % 7 == 0, F.lit(0.0)).otherwise(
        F.col("l_quantity")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), denom), 9
        ).alias("unit_price"),
    )


_TRY_ARITH_SQL = """
SELECT l_orderkey, l_linenumber,
  ROUND(l_extendedprice::DOUBLE / NULLIF(
    CASE WHEN l_linenumber % 7 = 0 THEN 0.0 ELSE l_quantity::DOUBLE END, 0.0), 9)
    AS unit_price
FROM lineitem WHERE l_orderkey <= 1000
ORDER BY l_orderkey, l_linenumber
"""


_PROFILE_COLS = [
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_returnflag",
    "l_shipdate",
]


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile of `lineitem`: per-column null and
    exact distinct counts — the validation pass a pipeline runs before
    trusting a new drop of data.

    Scale notes: ONE scan computes every column's aggregates (Catalyst
    plans multi-distinct via expand — each distinct column adds one
    expand branch, still a single partial+final aggregation tree); the
    wide-to-long pivot of the 1-row result is a `stack` over a handful
    of scalars, driver-trivial. No per-column rescans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack})"
            " as (column, n_nulls, n_distinct)"
        )
    ).orderBy("column")


_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", COUNT(*) - COUNT({c}) AS n_nulls,
  COUNT(DISTINCT {c}) AS n_distinct FROM lineitem"""
    for c in _PROFILE_COLS
) + '\nORDER BY "column"'


QUERIES = {
    "window_cume_dist": window_cume_dist,
    "func_json_encode": func_json_encode,
    "func_array_predicates": func_array_predicates,
    "agg_bitwise_stringagg": agg_bitwise_stringagg,
    "func_try_arithmetic": func_try_arithmetic,
    "profile_columns": profile_columns,
}

ORACLE = {
    "window_cume_dist": _CUME_SQL,
    "func_json_encode": _JSON_ENCODE_SQL,
    "func_array_predicates": _ARRAY_PRED_SQL,
    "agg_bitwise_stringagg": _BITWISE_SQL,
    "func_try_arithmetic": _TRY_ARITH_SQL,
    "profile_columns": _PROFILE_SQL,
}
