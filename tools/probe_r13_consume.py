"""Consuming-aggregate probes for the r13 gates — count() legally
prunes map projections, so each probe forces the full computed columns
through a sum (the r7 lesson, same shape as probe_r11/r12_consume).
Also RE-probes link_extract and robots_filter: their extraction
machinery changed this round (tag-walk rel/base capture; distinct-text
parse + politeness columns).

Usage: python tools/probe_r13_consume.py DIR [DIR ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataproc_spark import get_spark
from dataproc_spark.queries import REGISTRY
from pyspark.sql import functions as F

spark = get_spark("probe_r13", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
for d in sys.argv[1:]:
    for name, agg in (
        ("redirect_resolve",
         lambda df: df.agg(F.sum(F.length("final_url")),
                           F.sum("n_hops"),
                           F.count("*"))),
        ("cdx_lookup",
         lambda df: df.agg(F.sum(F.length("cdx_ts")),
                           F.sum("length"), F.count("*"))),
        ("pdf_text",
         lambda df: df.agg(F.sum(F.length("pdf_text")),
                           F.count("pdf_error"), F.count("*"))),
        ("link_extract",
         lambda df: df.agg(F.sum(F.length("link_url")),
                           F.count("rel"), F.count("*"))),
        ("robots_filter",
         lambda df: df.agg(F.sum(F.col("allowed").cast("int")),
                           F.sum("crawl_delay"), F.count("*"))),
        ("host_graph",
         lambda df: df.agg(F.sum("n_links"), F.sum("n_followed"),
                           F.count("*"))),
        ("frontier_schedule",
         lambda df: df.agg(F.sum("fetch_offset_ms"), F.sum("delay_ms"),
                           F.count("*"))),
        ("page_meta",
         lambda df: df.agg(F.sum(F.length("title")),
                           F.sum(F.length("robots_csv")), F.count("*"))),
        ("wat_roundtrip",
         lambda df: df.agg(F.sum(F.length("links_joined")),
                           F.sum("wat_n_links"), F.count("*"))),
        ("jpeg_scrub",
         lambda df: df.agg(F.sum("meta_bytes_removed"),
                           F.sum(F.col("len_consistent").cast("int")),
                           F.count("*"))),
        ("sitemap_tree",
         lambda df: df.agg(F.sum(F.length("loc")), F.sum("depth"),
                           F.count("*"))),
    ):
        t0 = time.time()
        row = agg(REGISTRY[name][0](spark, d)).collect()[0]
        print(json.dumps({"dir": d, "name": name,
                          "sec": round(time.time() - t0, 1),
                          "agg": [None if v is None else int(v) for v in row]}),
              flush=True)
