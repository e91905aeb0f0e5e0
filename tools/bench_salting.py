"""Skew-salting and max_df A/B probe harness (r7, SCALE.md §salting A/B).

Each invocation runs ONE experiment variant in its own process and
prints one JSON line — sequential in-session A/B is poisoned by order
effects (page cache, codegen warmup), so the driver shell runs each
variant separately and every process does an untimed warm-up pass of
the SAME shape first. Results are consumed with a value-dependent
aggregate, never a prunable bare count of a map-only plan.

Usage:
    python tools/bench_salting.py EXPERIMENT VARIANT [SRC]

Experiments (VARIANT is `plain` or `salted` / `maxdf`):
    minhash_mild  — LSH candidate generation over a near-dup corpus
                    (each replica's text gets a distinct prefix token):
                    the mild-skew case AQE already handles.
    minhash_hot   — same, plus ONE document duplicated 1000x: the
                    pathological identical-signature bucket.
    ann           — bucketed_topk k=5 over embeddings (label cells),
                    plain single window vs two-phase salted top-k.
    ngram_maxdf   — ngram_jaccard_pairs over documents with a shared
                    boilerplate sentence appended to every 50th doc,
                    max_df=None vs max_df=100.

SRC defaults: /tmp/scale10 (minhash/ngram), /tmp/scale100 (ann) —
regenerate with `SCALE_R=N python tools/gen_scale_probe.py`.
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


def get_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("bench_salting")
        .getOrCreate()
    )


def neardup_docs(spark, src):
    """scale-probe documents with a per-replica prefix token, so the
    replicas of one original are genuine ~0.9-Jaccard near-dups (the r6
    'salted control' corpus shape)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src}/documents.parquet")
    orig_max = 5_000  # sf0.1 original doc count; replicas shift by it
    return docs.withColumn(
        "text",
        F.concat(
            F.lit("r"), (F.col("doc_id") / orig_max).cast("long").cast("string"),
            F.lit(" "), F.col("text"),
        ),
    )


def run(experiment, variant, src):
    from pyspark.sql import functions as F

    from dataproc_spark.extensions import dedup, simsearch

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    if experiment in ("minhash_mild", "minhash_hot"):
        docs = neardup_docs(spark, src or "/tmp/scale10")
        if experiment == "minhash_hot":
            # ONE pathological identical group: 1000 byte-identical
            # copies of one document under fresh ids
            hot_doc = docs.where(F.col("doc_id") == 7).select("text")
            base = docs.agg(F.max("doc_id")).first()[0] + 1
            clones = (
                spark.range(1000)
                .withColumn("doc_id", F.col("id") + base)
                .crossJoin(F.broadcast(hot_doc))
                .select("doc_id", "text")
            )
            docs = docs.select("doc_id", "text").unionByName(clones)
        salt = 8 if variant == "salted" else None

        def job():
            sigs = dedup.minhash_frame(
                docs, "text", "doc_id", num_hashes=32, shingle_size=3
            ).persist()
            n = dedup.lsh_candidates(
                sigs, bands=8, num_hashes=32, salt=salt
            ).count()
            sigs.unpersist()
            return n

    elif experiment in ("ann", "ann_few"):
        emb = spark.read.parquet(f"{src or '/tmp/scale100'}/embeddings.parquet")
        # ann: 2000 query partitions — parallelism comes free from the
        # qid count. ann_few: 4 queries — the true skewed-top-k shape,
        # where the single per-qid window serializes onto 4 tasks.
        modulus = 50_000 if experiment == "ann_few" else 100
        queries = emb.where(F.col("vec_id") % modulus == 0)
        salt = 8 if variant == "salted" else None

        def job():
            out = simsearch.bucketed_topk(emb, queries, k=5, salt=salt)
            # value-dependent aggregate: the ranking (and hence the dot
            # products) cannot be pruned away
            row = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash("qid", "vec_id", "rnk")).alias("chk"),
            ).first()
            return row["n"]

    elif experiment == "ngram_maxdf":
        docs = spark.read.parquet(
            f"{src or '/tmp/scale10'}/documents.parquet"
        ).select("doc_id", "text")
        boiler = (
            "this document is provided as is without warranty of any kind"
        )
        docs = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 50 == 0,
                F.concat(F.col("text"), F.lit(" " + boiler)),
            ).otherwise(F.col("text")),
        )
        max_df = 100 if variant == "maxdf" else None

        def job():
            return dedup.ngram_jaccard_pairs(
                docs, n=3, min_shared=2, jaccard_threshold_m=100,
                max_df=max_df,
            ).count()

    else:
        raise SystemExit(f"unknown experiment {experiment!r}")

    job()  # untimed warm-up of the identical shape
    t0 = time.time()
    n = job()
    dt = time.time() - t0
    print(json.dumps({
        "experiment": experiment, "variant": variant,
        "src": src, "rows": n, "sec": round(dt, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    run(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else None,
    )
