"""Scale probes for the r7 operator wave (SCALE.md §r7 wave).

One experiment per invocation (own process, untimed warm-up pass, same
knobs as the other probes: local[32], shuffle 64, AQE + skew on).

Usage: python tools/bench_r7_wave.py EXPERIMENT [SRC]
    co_occurrence   — lineitem baskets at SRC (default /tmp/scale100)
    vocab_coverage  — documents at SRC (default /tmp/scale100)
    fuzzy_match     — customer self-linkage at SRC (default /tmp/scale100)
    hard_negatives  — embeddings at SRC (default /tmp/scale10)
    containment     — documents at SRC (default /tmp/scale10), max_df=100
"""

from __future__ import annotations

import json
import sys
import time

import os as _os

# __file__ is only guaranteed absolute on Python 3.11+; abspath
# keeps `python tools/<script>.py` working everywhere
ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.bench_salting import get_session  # noqa: E402


def run(experiment, src):
    from pyspark.sql import functions as F

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    if experiment == "co_occurrence":
        from dataproc_spark.extensions.analytics import co_occurrence

        src = src or "/tmp/scale100"
        li = spark.read.parquet(f"{src}/lineitem.parquet")

        def job():
            return co_occurrence(
                li, "l_orderkey", "l_partkey", min_support=3, top_n=50
            ).count()

    elif experiment == "vocab_coverage":
        from dataproc_spark.extensions.textstats import vocab_coverage

        src = src or "/tmp/scale100"
        docs = spark.read.parquet(f"{src}/documents.parquet")

        def job():
            out = vocab_coverage(docs, vocab_size=500)
            row = out.agg(F.count(F.lit(1)).alias("n"),
                          F.sum(F.hash("source", "oov_m")).alias("chk")).first()
            return row["n"]

    elif experiment in ("fuzzy_match", "fuzzy_match_raw"):
        from dataproc_spark.extensions.linkage import fuzzy_join_blocked

        src = src or "/tmp/scale100"
        c = spark.read.parquet(f"{src}/customer.parquet")
        if experiment == "fuzzy_match":
            # exact-first: the probe replicas duplicate every NAME 100x
            # (only keys shift), so raw blocked fuzzy is quadratic in the
            # duplication factor — dist-0 duplicates must collapse to one
            # representative per key string BEFORE the fuzzy pass, the
            # same exact-dedup-precedes-near-dup rule as MinHash
            c = c.groupBy("c_name").agg(F.min("c_custkey").alias("c_custkey"))

        def job():
            return fuzzy_join_blocked(
                c, c, key_col="c_name",
                block=F.expr("substring(c_name, 1, 16)"),
                max_dist=1, id_col="c_custkey",
            ).count()

    elif experiment == "hard_negatives":
        from dataproc_spark.extensions.simsearch import hard_negatives

        src = src or "/tmp/scale10"
        emb = spark.read.parquet(f"{src}/embeddings.parquet")

        def job():
            return hard_negatives(
                emb, emb.where(F.col("vec_id") % 100 == 0)
            ).count()

    elif experiment == "containment":
        from dataproc_spark.extensions.dedup import ngram_containment_pairs

        src = src or "/tmp/scale10"
        docs = spark.read.parquet(f"{src}/documents.parquet")

        def job():
            return ngram_containment_pairs(
                docs, n=3, min_shared=2, containment_threshold_m=500,
                max_df=100,
            ).count()

    else:
        raise SystemExit(f"unknown experiment {experiment!r}")

    job()
    t0 = time.time()
    n = job()
    dt = time.time() - t0
    print(json.dumps({
        "experiment": experiment, "src": src, "rows": n,
        "sec": round(dt, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
