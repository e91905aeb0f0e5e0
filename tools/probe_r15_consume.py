"""Consuming-aggregate probes for the r15 gates — count() legally
prunes map projections, so each probe forces the computed columns
through sums (the r7 lesson; same shape as probe_r11..14_consume).

Two gates are re-parameterized for corpus-realistic scaling (the r14
image_near_dup lesson — fixture constants are gate-scale choices, not
plan properties):

* image_near_dup_256 keeps duplicate-group size ~17 as the corpus
  grows (real corpora have bounded duplicate clusters; the gate's
  fixed 29 groups would grow quadratic within-group pair counts) and
  runs at the DEFAULT bands=16 / max_hamming=15 — the whole point of
  the 256-bit fingerprint is that the defaults stay in the flat-probe
  regime (16-bit bands) at any corpus size, unlike the 64-bit hash's
  bands=8 saturation (SCALE.md r14).
* semantic_dedup scales k so cells hold ~500 vectors (the SemDeDup
  paper scales cluster count with corpus size for exactly this
  reason: the within-cell self-join is quadratic in CELL size, and k
  is the knob that bounds it — 11k clusters for 600M in the paper).

Usage: python tools/probe_r15_consume.py DIR [DIR ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataproc_spark import get_spark
from dataproc_spark.queries import REGISTRY
from pyspark.sql import functions as F

spark = get_spark("probe_r15", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")

for d in sys.argv[1:]:
    for name, agg in (
        # trains on the full corpus (ONE label×bucket agg, model
        # bounded at labels×512), scores every doc — linear or bust
        ("nb_train_score",
         lambda df: df.agg(F.sum("score"), F.sum("n_feats"),
                           F.count("pred_label"), F.count("*"))),
        # same training plan + the write→read→score-through-meta hop;
        # the delta vs nb_train_score prices the model IO at scale
        ("nb_model_roundtrip",
         lambda df: df.agg(F.sum("score"), F.sum("n_feats"),
                           F.count("*"))),
        # sink-side digest dedup: ONE digest agg + ONE digest join,
        # archive written per-partition; bodies move exactly once
        ("warc_revisit_write",
         lambda df: df.agg(F.sum("n_body_bytes"),
                           F.sum(F.col("is_revisit").cast("int")),
                           F.count("source_record_id"), F.count("*"))),
        # late-r15 wave: the persisted-index near-dup probe (ONE banded
        # join + 2 id joins) and token drift (2 aggs + ONE full-outer
        # join + partial top-k). ann_pq is probed separately below with
        # a FIXED query batch — the gate's vec_id % 100 query set grows
        # with the corpus, which makes the ADC term O(n·nq) quadratic
        # BY FIXTURE, not by plan (the module contract is queries ≪
        # corpus; a 2000-query batch at 100× is not a scan, it's 100
        # scans)
        ("incremental_near_dup",
         lambda df: df.agg(F.sum("est_jaccard_m"), F.sum("new_id"),
                           F.count("*"))),
        ("corpus_drift",
         lambda df: df.agg(F.sum("contrib_q"), F.sum("a_cnt"),
                           F.sum("b_cnt"), F.count("*"))),
        # BM25's query battery is FIXED (3 term-set queries), so the
        # gate probes as-is: ONE tokenize -> tf agg, df from tf,
        # broadcast terms, partial top-k
        ("bm25_topk",
         lambda df: df.agg(F.sum("score_q"), F.sum("rank"),
                           F.count("*"))),
    ):
        t0 = time.time()
        row = agg(REGISTRY[name][0](spark, d)).collect()[0]
        print(json.dumps({"dir": d, "name": name,
                          "sec": round(time.time() - t0, 1),
                          "agg": [None if v is None else int(v) for v in row]}),
              flush=True)

# --- corpus-realistic re-parameterized probes -------------------------
from dataproc_spark.extensions import imagehash, simsearch  # noqa: E402
from dataproc_spark.queries._tables import _t  # noqa: E402

for d in sys.argv[1:]:
    # PQ end-to-end with a fixed 20-query batch (see the note above):
    # train + encode scale with the corpus, ADC with corpus × batch
    emb = _t(spark, d, "embeddings")
    t0 = time.time()
    cb = simsearch.pq_train(emb, m=8, codes=16, iters=2)
    codes = simsearch.pq_encode(emb, cb)
    queries = emb.orderBy(F.col("vec_id").asc()).limit(20)
    row = simsearch.pq_adc_topk(queries, codes, cb, k=5).agg(
        F.sum("d_adc"), F.sum("rank"), F.count("*")).collect()[0]
    print(json.dumps({"dir": d, "name": "ann_pq_fixed_batch",
                      "sec": round(time.time() - t0, 1),
                      "agg": [None if v is None else int(v) for v in row]}),
          flush=True)

    # IVFPQ with the same fixed batch and corpus-scaled CELL count
    # (the semantic_dedup rule: probed-cell candidate sets must stay
    # bounded, and cell count is the knob — FAISS sizes nlist ~ √n to
    # n/1k; ~2048 vectors/cell here)
    cells = max(8, ne // 2048)
    t0 = time.time()
    row = simsearch.ivfpq_topk(
        emb, queries, k=5, cells=cells, cell_iters=2, n_probe=2,
        m=8, codes=16, pq_iters=2,
    ).agg(F.sum("d_adc"), F.sum("rank"), F.count("*")).collect()[0]
    print(json.dumps({"dir": d, "name": "ann_ivfpq_fixed_batch",
                      "cells": cells,
                      "sec": round(time.time() - t0, 1),
                      "agg": [None if v is None else int(v) for v in row]}),
          flush=True)

for d in sys.argv[1:]:
    # 256-bit multi-scale dHash at DEFAULT parameters (bands=16,
    # max_hamming=15) — the r14 verdict item: the defaults must stay
    # near-linear at 100x, with no bands=4 escape hatch needed
    n = _t(spark, d, "documents").count()
    groups = max(29, n // 17)
    t0 = time.time()
    media = imagehash.synthesize_scale_ppms(
        _t(spark, d, "documents").select("doc_id"), groups=groups)
    row = imagehash.image_near_dup_256(media).agg(
        F.sum("hamming"), F.count("*")).collect()[0]
    print(json.dumps({"dir": d, "name": "image_near_dup_256",
                      "groups": groups, "bands": 16,
                      "sec": round(time.time() - t0, 1),
                      "agg": [None if v is None else int(v) for v in row]}),
          flush=True)

    # SemDeDup with paper-faithful cell sizing (~500 vectors/cell):
    # assignment is map-only vs literal centroids; the quadratic term
    # is bounded per cell, so wall should track n, not n^2
    ne = _t(spark, d, "embeddings").count()
    k = max(8, ne // 500)
    t0 = time.time()
    kept = simsearch.semantic_dedup(
        _t(spark, d, "embeddings"), threshold_dot_q=300_000,
        k=k, iters=2, with_cluster=True)
    row = kept.agg(F.sum("vec_id"), F.sum("cluster"),
                   F.count("*")).collect()[0]
    print(json.dumps({"dir": d, "name": "semantic_dedup", "k": k,
                      "sec": round(time.time() - t0, 1),
                      "agg": [None if v is None else int(v) for v in row]}),
          flush=True)
