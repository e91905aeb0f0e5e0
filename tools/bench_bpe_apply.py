"""Expr-vs-Arrow crossover probe for the BPE apply pass (SCALE.md §r8).

``bpe_apply`` is a chained-replace expression plan whose DEPTH is the
number of merge rules; ``bpe_apply_arrow`` is a constant-plan-depth
mapInPandas kernel that pays one Arrow round-trip instead. The
``BPE_EXPR_MAX_MERGES`` guard (512) was set from codegen folklore, not
measurement — this probe measures both paths across rule counts so the
constant (and the docstring's advice) rests on data.

Merge table: the corpus' top-N within-word character bigrams, ranked by
frequency (ONE aggregation job, reused across sizes). That is not a
valid BPE derivation (real rule k is learned on the corpus AFTER rules
<k applied), but apply-cost does not care where rules came from — each
rule is one full-string replace on either path, and top bigrams match
often, so the workload is realistic for the cost axis being measured:
rules × corpus size.

One (path, n_rules) experiment per invocation — own process, untimed
warm-up, same session knobs as the other probes, consuming checksum
forcing (sum over the counts), never count().

Usage: python tools/bench_bpe_apply.py {expr|arrow} N_RULES [SRC]
"""

from __future__ import annotations

import json
import sys
import time

import os as _os

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.bench_salting import get_session  # noqa: E402


def top_bigram_merges(spark, src: str, n_rules: int):
    """Top within-word character bigrams as a rank-ordered merge table."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src}/documents.parquet")
    words = docs.select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda w: w != "")
        ).alias("w")
    )
    chars = words.select(
        F.filter(F.split("w", ""), lambda ch: ch != "").alias("cs")
    )
    pairs = chars.select(
        F.explode(
            F.zip_with(
                F.slice("cs", 1, F.size("cs") - 1),
                F.slice("cs", 2, F.size("cs") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    )
    top = (
        pairs.groupBy("p")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("p.a"), F.col("p.b"))
        .limit(n_rules)
        .collect()
    )
    rules = [
        (i, r["p"]["a"], r["p"]["b"], int(r["freq"]))
        for i, r in enumerate(top)
    ]
    # the synthetic corpus yields only ~82 distinct bigrams; pad the rule
    # axis with private-use-area sentinel rules that can never match.
    # A no-match rule still costs a full-string scan per row on BOTH
    # paths (JVM StringReplace and Python str.replace each scan before
    # returning the input unchanged), so padded rules measure exactly
    # the axis under test: plan/loop depth x corpus size.
    while len(rules) < n_rules:
        i = len(rules)
        rules.append((i, chr(0xE000 + i % 256), chr(0xE100 + i // 256), 0))
    return rules


def run(path: str, n_rules: int, src: str | None) -> None:
    from pyspark.sql import functions as F

    from dataproc_spark.extensions import textstats

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    src = src or "/root/testdata/sf0.1"
    merges = top_bigram_merges(spark, src, n_rules)
    docs = spark.read.parquet(f"{src}/documents.parquet").select(
        "doc_id", "text"
    )

    if path == "expr":
        # lift the guard for the probe: measuring PAST the documented
        # cutoff is the point
        saved = textstats.BPE_EXPR_MAX_MERGES
        textstats.BPE_EXPR_MAX_MERGES = max(saved, n_rules)
        apply_fn = textstats.bpe_apply
    elif path == "arrow":
        saved = None
        apply_fn = textstats.bpe_apply_arrow
    else:
        raise SystemExit(f"unknown path {path!r}")

    def job():
        out = apply_fn(docs, merges)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bpe_tokens").alias("chk"),
        ).first()
        return row["n"], row["chk"]

    # restore the module-global guard even when job() raises: a failed
    # probe must not leave the lifted guard in place for the rest of the
    # process (r8 ADVICE)
    try:
        job()  # warm-up
        t0 = time.time()
        n, chk = job()
        dt = time.time() - t0
    finally:
        if saved is not None:
            textstats.BPE_EXPR_MAX_MERGES = saved
    print(json.dumps({
        "path": path, "n_rules": len(merges), "src": src,
        "rows": n, "token_sum": int(chk), "sec": round(dt, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1], int(sys.argv[2]),
        sys.argv[3] if len(sys.argv) > 3 else None)
