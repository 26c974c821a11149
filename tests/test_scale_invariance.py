"""Scale-invariance gate: oracle parity at sf0.1 for the queries whose
machinery has scale-dependent internals.

The driver's correctness gate runs at sf0.01 and the default local
suite at sf0.001 — but several operators have logic whose failure
modes only appear with more data: band-boundary arithmetic (banded
quantiles, ghost-bucket RANGE frames, ntile/cume_dist rank banding),
bucket prefix sums (shard packing), LSH banding fan-out, hash-split
proportions, and calendar-spine joins. A range-frame second-truncation
bug once passed sf0.001 parity and failed at driver scale; this module
makes the 100x-larger check part of CI.

ann_lsh_cosine is exercised at sf0.01 by the main parity suite but
excluded here: its DuckDB oracle computes every bucket cosine and takes
~35 s at sf0.1 — the bucketing logic it shares with dedup_minhash_lsh
is covered by that entry.
"""

from __future__ import annotations

import pytest

from etl_gcp_function_tmabrasil_spark.queries import all_oracle_sql, all_queries
from tests.oracle_check import compare, duckdb_connection

SF01_DIR = "/root/testdata/sf0.1"

SCALE_SENSITIVE = [
    "window_range_frame",      # ghost-bucket frame rewrite: bucket boundaries
    "window_ntile",            # two-pass distributed rank banding
    "window_cume_dist",        # banded rank arithmetic per group
    "agg_percentiles",         # banded exact quantiles: band offsets/interp
    "agg_robust_outliers",     # two chained banded-quantile passes
    "pack_token_budget",       # two-pass bucket prefix sum
    "dedup_minhash_lsh",       # LSH band fan-out and candidate dedup
    "split_train_val_test",    # hash-unit split proportions
    "resample_daily_locf",     # per-key calendar spine + LOCF window
    # round-6 registrations with scale-dependent internals
    "window_global_rownum_scalable",  # range-partition boundaries move
    #   with data size; numbering must be invariant to where they land
    "split_group_integrity",   # user-keyed hash-unit proportions
    "sample_weighted_per_source",  # per-group E-S key ranking fan-out
    "bigram_lm_interpolated",  # bigram/unigram count joins at volume
]

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.fixture(scope="module")
def duck01():
    con = duckdb_connection(SF01_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_sf01_parity(name, spark, duck01):
    df = QUERIES[name](spark, SF01_DIR)
    oracle_df = duck01.execute(ORACLE[name]).fetchdf()
    problems = compare(df, oracle_df, name)
    assert not problems, "\n".join(problems)
