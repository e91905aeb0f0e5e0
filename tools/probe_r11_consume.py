"""Consuming-aggregate probes for the r11 map-shaped gates — count()
legally prunes their Arrow decode projections (the r7 lesson), so the
honest timing forces sum(length(body_text)).

Usage: python tools/probe_r11_consume.py DIR [DIR ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataproc_spark import get_spark
from dataproc_spark.queries import REGISTRY
from pyspark.sql import functions as F

spark = get_spark("probe_r11", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
for d in sys.argv[1:]:
    for name, agg in (
        ("charset_body_text",
         lambda df: df.agg(F.sum(F.length("body_text")),
                           F.sum("n_chars_text"))),
        ("warc_revisit_dedup",
         lambda df: df.agg(F.sum(F.length("body_text")),
                           F.sum(F.col("is_revisit").cast("long")))),
        ("html_unescape",
         lambda df: df.agg(F.sum(F.length("text_clean")),
                           F.sum("n_chars_clean"))),
        ("robots_filter",
         lambda df: df.agg(F.sum(F.col("allowed").cast("long")),
                           F.count("*"))),
    ):
        t0 = time.time()
        row = agg(REGISTRY[name][0](spark, d)).collect()[0]
        print(json.dumps({"dir": d, "name": name,
                          "sec": round(time.time() - t0, 1),
                          "agg": [None if v is None else int(v) for v in row]}),
              flush=True)
