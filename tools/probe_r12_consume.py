"""Consuming-aggregate probes for the r12 gates — count() legally
prunes map projections, so each probe forces the full computed columns
through a sum (the r7 lesson, same shape as probe_r11_consume).

Usage: python tools/probe_r12_consume.py DIR [DIR ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataproc_spark import get_spark
from dataproc_spark.queries import REGISTRY
from pyspark.sql import functions as F

spark = get_spark("probe_r12", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
for d in sys.argv[1:]:
    for name, agg in (
        ("line_dedup",
         lambda df: df.agg(F.sum(F.length("text_clean")),
                           F.sum("n_lines_dropped"))),
        ("mime_sniff",
         lambda df: df.agg(F.sum(F.length("mime")), F.count("*"))),
        ("cdx_index",
         lambda df: df.agg(F.sum(F.length("urlkey")),
                           F.sum("length"))),
        ("sitemap_parse",
         lambda df: df.agg(F.sum(F.length("loc")),
                           F.sum("priority"), F.count("*"))),
        ("link_extract",
         lambda df: df.agg(F.sum(F.length("link_url")), F.count("*"))),
    ):
        t0 = time.time()
        row = agg(REGISTRY[name][0](spark, d)).collect()[0]
        print(json.dumps({"dir": d, "name": name,
                          "sec": round(time.time() - t0, 1),
                          "agg": [None if v is None else int(v) for v in row]}),
              flush=True)
