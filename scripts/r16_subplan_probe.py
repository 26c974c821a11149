#!/usr/bin/env python3
"""Round-16 sub-plan profiler for the three structural targets
(simjoin_prefix_jaccard, agg_spearman_corr, text_langid_hashed_ngram):
time each stage of the pipeline in isolation with the noop sink so the
optimization attacks the measured cost, not the guessed one (guide §1).

Usage: python scripts/r16_subplan_probe.py [simjoin|spearman|langid] ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_gcp_function_tmabrasil_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(spark, label, df, n=4, action="noop"):
    samples = []
    for i in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
            extra = ""
        else:
            extra = f" count={df.count()}"
        dt = time.perf_counter() - t0
        if i:
            samples.append(dt)
    samples.sort()
    print(f"{label}: min={samples[0]:.3f} med={samples[len(samples)//2]:.3f}{extra}",
          flush=True)


def simjoin(spark):
    from etl_gcp_function_tmabrasil_spark.queries import dedup_approx as da
    from etl_gcp_function_tmabrasil_spark.queries._util import (
        load_table,
        managed_persist,
    )

    W, TAU = da.SSJOIN_W, da.SSJOIN_TAU
    docs = load_table(spark, SF, "documents", rebalance="compute")
    toks = (
        docs.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= F.lit(W))
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, size(ws) - {W - 1}),"
                    f" i -> concat_ws(' ', slice(ws, i, {W})))"
                )
            ).alias("toks"),
        )
    )
    t(spark, "1.toks(shingling, no persist)", toks)
    sh = toks.select("doc_id", F.size("toks").alias("sz"), F.explode("toks").alias("sh"))
    t(spark, "2.sh(explode)", sh)
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    t(spark, "3.freq(agg)", freq)
    with_df = sh.join(freq, "sh")
    t(spark, "4.with_df(join back)", with_df)
    prefix = (
        with_df.groupBy("doc_id")
        .agg(F.first("sz").alias("sz"),
             F.array_sort(F.collect_list(F.struct("df", "sh"))).alias("fs"))
        .select("doc_id", "sz",
                F.posexplode(F.expr(
                    f"slice(fs, 1, cast(sz - ceil({TAU} * sz) + 1 as int))"
                )).alias("pos", "e"))
        .select("doc_id", F.col("e.sh").alias("sh"), "sz",
                (F.col("pos") + 1).alias("rk"))
    )
    t(spark, "5.prefix(fold)", prefix)
    pp = managed_persist(prefix, "probe.prefix")
    a, b = pp.alias("a"), pp.alias("b")
    alpha = F.ceil(F.lit(TAU / (1.0 + TAU)) * (F.col("a.sz") + F.col("b.sz")))
    cand = (
        a.join(b,
               (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               & (F.lit(TAU) * F.greatest(F.col("a.sz"), F.col("b.sz"))
                  <= F.least(F.col("a.sz"), F.col("b.sz")))
               & (F.least(F.col("a.sz") - F.col("a.rk"),
                          F.col("b.sz") - F.col("b.rk")) + 1 >= alpha))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.lit(1).alias("_one")).drop("_one")
    )
    t(spark, "6.cand(self-join+distinct, over persisted prefix)", cand)
    print("candidate pairs:", cand.count(), flush=True)
    t(spark, "7.full query", da.simjoin_prefix_jaccard(spark, SF))


def spearman(spark):
    from etl_gcp_function_tmabrasil_spark.queries import aggregates as ag
    from etl_gcp_function_tmabrasil_spark.queries._util import load_table

    li = load_table(spark, SF, "lineitem", rebalance="compute").select(
        "l_returnflag", F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"))
    li_raw = load_table(spark, SF, "lineitem").select(
        "l_returnflag", F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"))
    t(spark, "1.li scan+spread only", li)
    t(spark, "1b.li raw scan only", li_raw)
    vc = li.select("l_returnflag", F.col("x").alias("v"),
                   F.floor(F.col("x") / 8.0).cast("long").alias("band")
                   ).groupBy("l_returnflag", "band", "v").agg(F.count(F.lit(1)).alias("c"))
    t(spark, "2.x value-count (spread)", vc)
    vc_raw = li_raw.select("l_returnflag", F.col("x").alias("v"),
                           F.floor(F.col("x") / 8.0).cast("long").alias("band")
                           ).groupBy("l_returnflag", "band", "v").agg(F.count(F.lit(1)).alias("c"))
    t(spark, "2b.x value-count (raw)", vc_raw)
    bc_y = li.select("l_returnflag", F.floor(F.col("y") / 1000.0).cast("long").alias("band")
                     ).groupBy("l_returnflag", "band").agg(F.count(F.lit(1)).alias("n_band"))
    t(spark, "3.y band-count (spread)", bc_y)
    bc_y_raw = li_raw.select("l_returnflag", F.floor(F.col("y") / 1000.0).cast("long").alias("band")
                             ).groupBy("l_returnflag", "band").agg(F.count(F.lit(1)).alias("n_band"))
    t(spark, "3b.y band-count (raw)", bc_y_raw)
    t(spark, "4.full query", ag.agg_spearman_corr(spark, SF))


def langid(spark):
    from etl_gcp_function_tmabrasil_spark.queries import text_analysis as ta
    from etl_gcp_function_tmabrasil_spark.queries._util import (
        SPARK_HASH60,
        load_table,
    )

    B, G = ta.LANGID_B, ta.LANGID_GRAM
    docs = load_table(spark, SF, "documents", rebalance="compute")
    norm = F.lower(F.regexp_replace(F.trim("text"), ta.WS_CLASS, " "))
    grams = docs.select("doc_id", "lang", norm.alias("t")).select(
        "doc_id", "lang",
        F.explode(F.expr(
            f"CASE WHEN length(t) >= {G} THEN "
            f"transform(sequence(1, length(t) - {G - 1}), i -> substring(t, i, {G})) "
            "ELSE array() END")).alias("g"))
    t(spark, "1.grams explode only", grams)
    bucketed = grams.select("doc_id", "lang", F.expr(
        f"pmod({SPARK_HASH60.format(expr='g')}, {B})").alias("b"))
    t(spark, "2.+md5 bucket per occurrence", bucketed)
    dcount = bucketed.groupBy("doc_id", "lang", "b").agg(F.count(F.lit(1)).alias("n"))
    t(spark, "3.+agg (doc,lang,b) count  [current shape]", dcount)
    # variant: count per (doc,lang,gram) FIRST (partial agg collapses
    # repeats map-side), md5 once per distinct (doc,gram)
    gcount = grams.groupBy("doc_id", "lang", "g").agg(F.count(F.lit(1)).alias("n"))
    t(spark, "4.gram-count variant: (doc,lang,g) agg", gcount)
    dcount2 = gcount.select(
        "doc_id", "lang",
        F.expr(f"pmod({SPARK_HASH60.format(expr='g')}, {B})").alias("b"), "n"
    ).groupBy("doc_id", "lang", "b").agg(F.sum("n").alias("n"))
    t(spark, "5.gram-count variant: +md5-per-distinct +re-agg", dcount2)
    t(spark, "6.full query", ta.text_langid_hashed_ngram(spark, SF))
    print("gram occurrences vs distinct (doc,gram):",
          grams.count(), gcount.count(), flush=True)


def main() -> int:
    spark = get_spark(app_name="r16_subplan_probe")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite").save()
    for name in sys.argv[1:] or ["simjoin", "spearman", "langid"]:
        print(f"=== {name} ===", flush=True)
        globals()[name](spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
