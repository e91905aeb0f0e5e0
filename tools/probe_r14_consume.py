"""Consuming-aggregate probes for the r14 gates — count() legally
prunes map projections, so each probe forces the computed columns
through sums (the r7 lesson; same shape as probe_r11/12/13_consume).
Also RE-probes link_extract (it gained the anchor-text walk this
round) and host_graph (its extract_links call now opts OUT of the
walk — the cost must not regress).

Usage: python tools/probe_r14_consume.py DIR [DIR ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataproc_spark import get_spark
from dataproc_spark.queries import REGISTRY
from pyspark.sql import functions as F

spark = get_spark("probe_r14", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
for d in sys.argv[1:]:
    for name, agg in (
        ("link_extract",
         lambda df: df.agg(F.sum(F.length("link_url")),
                           F.sum(F.length("anchor_text")),
                           F.count("rel"), F.count("*"))),
        ("anchor_rollup",
         lambda df: df.agg(F.sum("n_links"), F.sum("n_anchored"),
                           F.sum("n"), F.count("*"))),
        ("image_pairs",
         lambda df: df.agg(F.sum(F.length("img_url")),
                           F.sum(F.length("caption")),
                           F.sum("payload_len"), F.count("*"))),
        ("doc_score",
         lambda df: df.agg(F.sum("score"), F.sum("n_feats"),
                           F.count("*"))),
        ("revisit_schedule",
         lambda df: df.agg(F.sum("revisit_s"), F.sum("n_changes"),
                           F.sum("span_s"), F.count("*"))),
        ("warc_pair",
         lambda df: df.agg(F.sum("body_len"), F.count("req_method"),
                           F.count("*"))),
        ("host_graph",
         lambda df: df.agg(F.sum("n_links"), F.sum("n_followed"),
                           F.count("*"))),
        ("wat_enriched",
         lambda df: df.agg(F.sum(F.length("anchors_joined")),
                           F.sum(F.length("captions_joined")),
                           F.count("*"))),
        ("recrawl_due",
         lambda df: df.agg(F.sum("due_permille"), F.sum("age_s"),
                           F.sum(F.col("due").cast("int")),
                           F.count("*"))),
        ("multimodal_pipeline",
         lambda df: df.agg(F.sum("n_copies"),
                           F.sum(F.length("caption")),
                           F.count("*"))),
    ):
        t0 = time.time()
        row = agg(REGISTRY[name][0](spark, d)).collect()[0]
        print(json.dumps({"dir": d, "name": name,
                          "sec": round(time.time() - t0, 1),
                          "agg": [None if v is None else int(v) for v in row]}),
              flush=True)

# image_dedup probes with CORPUS-REALISTIC duplication: group size stays
# ~17 images as the corpus scales (the gate's fixed 29 groups would grow
# quadratic within-group pair counts — a fixture artifact, not a plan
# property; real corpora have bounded duplicate clusters)
from dataproc_spark.extensions import imagehash  # noqa: E402
from dataproc_spark.queries._tables import _t  # noqa: E402

for d in sys.argv[1:]:
    n = _t(spark, d, "documents").count()
    groups = max(29, n // 17)
    t0 = time.time()
    media = imagehash.synthesize_cell_ppms(
        _t(spark, d, "documents").select("doc_id"), groups=groups)
    # the documented parameter law (SCALE.md r14): 8-bit bands
    # saturate around 1e5 images — switch to 16-bit bands past that
    bands, mh = (8, 7) if n < 100_000 else (4, 3)
    row = imagehash.image_near_dup(media, bands=bands,
                                   max_hamming=mh).agg(
        F.sum("hamming"), F.count("*")).collect()[0]
    print(json.dumps({"dir": d, "name": "image_near_dup",
                      "groups": groups, "bands": bands,
                      "sec": round(time.time() - t0, 1),
                      "agg": [None if v is None else int(v) for v in row]}),
          flush=True)
