"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() (no driver materialization of
results). Timings include Spark planning + execution but not session
startup.

MEASUREMENT CONTRACT: count() lets Catalyst prune projections and
aggregate expressions the count does not need, so for aggregate-shaped
queries the timing under-measures the full expression work (e.g.
text_stats collapses to a lang-only aggregate). This forcing is KEPT
deliberately: every BENCH_r*.json since round 1 — including the
driver-relative baseline the perf gate compares against — was recorded
with the identical forcing, so the headline total stays comparable
across rounds; switching to a consuming aggregate would inflate every
number against the gate's own baseline. Treat per-query values as a
consistent round-over-round signal, not absolute query cost; use the
SCALE.md probe harnesses (which force with consuming aggregates) for
absolute measurements.

WARMUP CHANGE (r15): the warmup now also spawns the Python worker pool
(one trivial 64-partition Arrow stage) before timing, exactly as it has
always pre-loaded JVM/codegen/parquet classes — profiling showed the
first Arrow-path query per child session (resolve_buckets) absorbing
~2-3 s of one-time worker spawn + pandas import unrelated to its plan.
Old-protocol comparability: OPTIMIZATION_r15.md records the round's
headline under BOTH warmups; every other query's number is unaffected.

REPEAT PROTOCOL (r8): machine-load variance made single-run totals
uninterpretable (r7 was +19% on r6 with the drift uniform across
untouched queries). The harness now runs the WHOLE suite
$SPARK_GRAFT_BENCH_RUNS times (default 3) as separate subprocesses —
each child is bit-identical to the r1–r7 single-run protocol (fresh
session, same warmup, same count() forcing), so per-run totals remain
comparable with every prior BENCH_r*.json — and reports the MEDIAN
per-run total as "value" plus the raw totals under "runs" and
per-query medians under "queries". In-session repeats were rejected:
the selective family's session-scoped shard-results cache (and warm
codegen generally) makes second in-session runs structurally faster,
which would silently lower the headline against the baseline.
Set SPARK_GRAFT_BENCH_RUNS=1 for the old single-run behavior.

DRIFT PROTOCOL (r13, from the r12 embed_lsh/revisit adjudication):
when a SINGLE-query extended median moves >50% round-over-round on
UNTOUCHED code, re-time the prior round's commit (git worktree at that
commit, same command, same day) before treating it as a regression —
in r12 both apparent regressions reproduced on the unchanged r11
checkout, i.e. they were machine-state drift. The headline
median-of-3 absorbs this; single-query medians don't.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataproc_spark.core import get_spark
from dataproc_spark import queries as registry

#: extended set: one representative per r5/r6 operator family, timed and
#: reported under "extended" — kept OUT of the headline total so
#: "value" stays comparable across rounds.
EXTENDED_QUERIES = [
    "dedup_spans",
    "select_token_budget",
    "funnel_steps",
    "retention_cohorts",
    "scd2_intervals",
    "user_event_sequences",
    "doc_novelty",
    "ann_recall",
    "events_pivot",
    "incremental_dedup",
    # r6 families: temperature resampling, per-domain calibration, the
    # real image decode, and the widest SQL-surface join shapes
    "temperature_mixture",
    "quality_percentile",
    "multimodal_decode",
    "tpch_q10",
    "tpch_q18",
    # r7/r8 families: blocked fuzzy linkage, URL curation, the BPE
    # apply pass, LM quality scoring, span-level decontamination.
    # Extended entries are OUT of the headline total, so adding
    # representatives keeps new families perf-visible round-over-round
    # without touching cross-round comparability.
    "fuzzy_match",
    "url_dedup",
    "bpe_apply",
    "lm_surprisal",
    "decontaminate_spans",
    # late-r8 families: bucket-free embedding LSH, real audio decode,
    # Unicode canonicalization
    "embed_lsh_near_dup",
    "audio_decode",
    "unicode_normalize",
    # r9 families: PSL eTLD+1 rollup, real JPEG decode, block-level
    # boilerplate removal, persisted-IVF probe
    "registered_domain_psl",
    "multimodal_jpeg",
    "html_boilerplate",
    "ann_ivf_index_roundtrip",
    "warc_roundtrip",
    # r10 family: HTTP-envelope split on WARC ingestion (the other r10
    # additions — lang_script_predict, cross_doc_spans — are probed in
    # SCALE.md instead; their gate fixtures are deliberately heavy)
    "warc_http_split",
    # r11 families: charset-aware body→text decode, WARC revisit
    # resolution (recrawl dedup), HTML entity unescape
    "charset_body_text",
    "warc_revisit_dedup",
    "html_unescape",
    "robots_filter",
    "wet_roundtrip",
    # r12 families: CDX capture index (SURT keys), cross-document
    # line dedup, MIME sniffing
    "cdx_index",
    "line_dedup",
    "mime_sniff",
    "sitemap_parse",
    "link_extract",
    # r13 families: redirect-chain resolution, CDX closest-capture
    # lookup, PDF text extraction (pure-core tier), the WAT metadata
    # sidecar, host link-graph rollup, politeness scheduling, page
    # metadata extraction
    "redirect_resolve",
    "cdx_lookup",
    "pdf_text",
    "wat_roundtrip",
    "host_graph",
    "frontier_schedule",
    "page_meta",
    # (jpeg_scrub is probed in SCALE.md instead — its gate fixture
    # pure-Python-ENCODES a JPEG per row, deliberately heavy; the
    # lang_script_predict/cross_doc_spans precedent)
    # r14 families: inbound anchor-text rollup, image–text pairing,
    # hashed-ngram linear scoring, recrawl-interval estimation
    # (warc_pair is probed in SCALE.md instead — its fixture writes a
    # two-record-type archive per run, the warc-roundtrip-shaped cost)
    "anchor_rollup",
    "image_pairs",
    "doc_score",
    "revisit_schedule",
    "image_dedup",
    "recrawl_due",
    "multimodal_pipeline",
    "audio_dedup",
    "warc_offsets",
    # r15 families: the NB train→score loop, SemDeDup semantic dedup,
    # the 256-bit multi-scale image fingerprint, sink-side revisit
    # dedup (cdx_lookup above now also carries the ZipNum-pruned
    # on-disk chain)
    "nb_train_score",
    "semantic_dedup",
    "image_dedup_256",
    "warc_revisit_write",
    # late-r15 families: PQ compressed-domain ANN, the persisted
    # minhash index probe, token-distribution drift, IVFPQ residual
    # search + the PQ recall honesty metric
    "ann_pq",
    "incremental_near_dup",
    "corpus_drift",
    "ann_ivfpq",
    "pq_recall",
    "bm25_topk",
]

#: benchmark set: the flagship selective-search pipeline + one
#: representative per operator family.
BENCH_QUERIES = [
    "select_top_t",
    "select_with_decay",
    "evaluate_sweep",
    "trec_export",
    "resolve_buckets",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "top_customers",
    "events_hourly",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash",
    "text_stats",
    "token_topk",
    "embed_near_dup",
    "ann_bucketed",
]


def _median(values: list[float]) -> float:
    """Median without importing statistics (keeps the harness stdlib-light);
    even counts average the two middle values."""
    s = sorted(values)
    n = len(s)
    mid = n // 2
    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def run_repeats(n_runs: int) -> None:
    """Parent mode of the repeat protocol: run the single-run harness
    ``n_runs`` times as SUBPROCESSES (each a fresh JVM + session — the
    exact r1–r7 measurement), then print ONE merged JSON line whose
    "value" is the median per-run total, with the raw totals under
    "runs" and per-query medians under "queries"/"extended"."""
    import subprocess

    child_env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD="1")
    results = []
    failures: dict[str, str] = {}
    for i in range(n_runs):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=child_env,
            capture_output=True,
            text=True,
        )
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().rsplit("\n", 1)[-1] if proc.stdout.strip() else ""
        try:
            data = json.loads(line)
        except (ValueError, json.JSONDecodeError):
            failures[f"run{i}"] = (
                f"rc={proc.returncode}, unparseable stdout: {line[:200]}"
            )
            continue
        if proc.returncode != 0 or data.get("errors"):
            failures[f"run{i}"] = json.dumps(data.get("errors", {}))[:300]
        results.append(data)
        print(f"# run {i}: total={data.get('value')}", file=sys.stderr)

    clean = [r for r in results if r.get("value") is not None]
    # the headline must not look FASTER because some runs failed: any
    # failed run nulls the median, same contract as per-query errors
    totals = [r["value"] for r in clean]
    value = round(_median(totals), 3) if clean and not failures else None

    def per_query_median(key: str) -> dict[str, float]:
        names: dict[str, list[float]] = {}
        for r in clean:
            for q, t in (r.get(key) or {}).items():
                names.setdefault(q, []).append(t)
        return {q: round(_median(ts), 3) for q, ts in names.items()}

    summary = {
        "metric": "bench_total_runtime",
        "value": value,
        "unit": "sec",
        "queries": per_query_median("queries"),
        "extended": per_query_median("extended"),
        "sf": clean[0]["sf"] if clean else None,
        "runs": totals,
        "protocol": f"median_of_{n_runs}_subprocess_runs",
    }
    if failures:
        summary["errors"] = failures
    print(json.dumps(summary))
    if failures:
        sys.exit(1)


def main() -> None:
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if n_runs > 1 and not os.environ.get("SPARK_GRAFT_BENCH_CHILD"):
        run_repeats(n_runs)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("dataproc_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths and the Hadoop FS/parquet reader classes
    # with trivial jobs so the first measured query doesn't absorb session
    # startup cost (region is 5 rows). The broadcast-join and window
    # shapes load their exec/codegen classes here too — profiling showed
    # the first selective query otherwise pays ~3 s of one-time class
    # loading that has nothing to do with the measured plan.
    from pyspark.sql import functions as _F

    try:
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        warm = spark.range(1000).withColumnRenamed("id", "k")
        warm.join(_F.broadcast(spark.range(10).withColumnRenamed("id", "k")), "k").count()
        warm.selectExpr(
            "k", "row_number() over (partition by k % 7 order by k) as rn"
        ).where("rn <= 2").count()
        # r15: warm the PYTHON WORKER POOL the same way the lines above
        # warm JVM classes — one trivial 64-partition Arrow stage spawns
        # every worker and imports pandas/pyarrow in them ONCE, so the
        # first measured Arrow/pandas query (resolve_buckets in the
        # headline) doesn't absorb ~2-3 s of per-session worker spawn
        # that has nothing to do with its plan. Methodology change is
        # recorded in OPTIMIZATION_r15.md with A/B totals under both
        # protocols; it shifts one-time session cost out of exactly one
        # query's number, same rationale as the existing JVM warmup.
        import pandas as _pd  # noqa: F401 — driver-side import parity

        spark.range(0, 64, 1, 64).mapInPandas(
            lambda it: it, "id long"
        ).count()
    except Exception as exc:  # noqa: BLE001 — a failed warmup must not
        # abort the harness before any query runs (the same isolation
        # contract as the per-query loops); queries just run cold
        print(f"# warmup failed, continuing cold: {exc}", file=sys.stderr)

    qs = registry.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # per-query isolation: one broken query must report itself, not abort
    # the harness and destroy every other timing (rounds 3/4 had rc=1 and
    # zero performance data because events_hourly threw here)
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# {name}: {timings[name]}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)

    extended: dict[str, float] = {}
    for name in EXTENDED_QUERIES:
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).count()
            extended[name] = round(time.perf_counter() - t0, 3)
            print(f"# ext {name}: {extended[name]}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# ext {name}: ERROR {errors[name]}", file=sys.stderr)

    # a round with errors must not report a SMALLER (faster-looking)
    # headline from the surviving queries — null the total so consumers
    # reading only "value" cannot mistake a failure for a speedup
    total = round(sum(timings.values()), 3) if not errors else None
    summary = {
        "metric": "bench_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extended": extended,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        summary["errors"] = errors
    print(json.dumps(summary))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
