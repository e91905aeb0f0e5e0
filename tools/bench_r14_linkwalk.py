"""A/B the anchor-aware link walk (r13 advice item 4): can a FUSED
single-pattern pass beat the current shape (one whole-tag
regexp_extract_all for attrs + one aligned split for text + per-tag
small extracts)?

The structural blocker: regexp_extract_all returns ONE capture group
per call, so a fused pattern capturing (open-tag body, inner text)
needs TWO full-document extract_all passes with the same combined
pattern — plus the per-tag attr parse either way. Variant C measures
that anyway so the conclusion is a number, not an argument.

Variants over the same synthetic corpus (rendered once, persisted):
  A  r13 shape: attrs walk only (with_anchor_text=False)
  B  r14 shape: attrs walk + aligned split text (with_anchor_text=True)
  C  fused combined pattern, two extract_all passes (group 1 = body,
     group 2 = text-until-</a>), zip by index
  D  r12-style href-only single regexp_extract_all (the cost floor)

Usage: python tools/bench_r14_linkwalk.py [n_docs] [reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from dataproc_spark import get_spark
from pyspark.sql import functions as F

from dataproc_spark.extensions import web

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark("linkwalk_ab", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")

did = F.col("id").cast("string")
page = F.concat(
    F.lit('<html><body><p>filler text before</p><a href="https://a'), did,
    F.lit('.com/x" rel="nofollow">anchor <b>one</b></a><div>'),
    F.lit('mid content '), F.repeat(F.lit("lorem ipsum dolor "), 30),
    F.lit('</div><a href=/rel/'), did,
    F.lit('>second anchor text</a><a href="#frag">skip</a>'),
    F.lit('<a href="?q='), did, F.lit('"><img src=i.jpg></a></body></html>'),
)
docs = spark.range(N).select(
    F.col("id"),
    F.concat(F.lit("https://h"), did, F.lit(".com/p.html")).alias("url"),
    page.alias("html"),
).persist()
docs.count()

BODY = r"(?:\"[^\"]*\"|'[^']*'|[^>\"'])*"
FUSED = rf"(?is)<a\s({BODY})>?((?:[^<]|<(?:[^/a<]|/[^a<]|a[^\s>]))*)"


def variant_a(d):
    return web.extract_links(d, with_anchor_text=False)


def variant_b(d):
    return web.extract_links(d)


def variant_c(d):
    html = F.coalesce(F.col("html"), F.lit(""))
    bodies = F.regexp_extract_all(html, F.lit(FUSED), F.lit(1))
    texts = F.regexp_extract_all(html, F.lit(FUSED), F.lit(2))
    from dataproc_spark.extensions.web import _tag_attr
    links = F.filter(
        F.zip_with(bodies, texts, lambda t, txt: F.struct(
            _tag_attr(t, "href").alias("href"),
            F.when(F.lower(t).contains("rel"), _tag_attr(t, "rel"))
            .otherwise(F.lit("")).alias("rel"),
            F.regexp_extract(txt, r"(?is)^(.*?)</a\s*>", 1).alias("t"),
        )),
        lambda s: (~s["href"].startswith("#")) & (s["href"] != ""),
    )
    return d.select("id", F.posexplode(links).alias("p", "l")).select(
        "id", "p", F.col("l.href").alias("href"),
        F.col("l.rel").alias("rel"), F.col("l.t").alias("anchor_text"))


def variant_b2(d):
    # WALK ONLY (no resolve, no clean): attrs extract_all + aligned
    # split, raw inner up to </a> — the r14 shape minus shared work
    html = F.coalesce(F.col("html"), F.lit(""))
    from dataproc_spark.extensions.web import (
        _ANCHOR_OPEN_SPLIT_RE, _tag_attr)
    tags = F.regexp_extract_all(
        html, F.lit(r"(?is)<a\s((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"),
        F.lit(1))
    chunks = F.split(html, _ANCHOR_OPEN_SPLIT_RE)
    texts = F.transform(
        F.slice(chunks, 2, F.greatest(F.size(chunks) - 1, F.lit(0))),
        lambda c: F.regexp_extract(c, r"(?is)^(.*?)</a\s*>", 1))
    links = F.filter(
        F.zip_with(tags, texts, lambda t, txt: F.struct(
            _tag_attr(t, "href").alias("href"), txt.alias("t"))),
        lambda s: (~s["href"].startswith("#")) & (s["href"] != ""))
    return d.select("id", F.posexplode(links).alias("p", "l")).select(
        "id", "p", F.col("l.href").alias("href"),
        F.col("l.t").alias("anchor_text"))


def variant_c2(d):
    # WALK ONLY fused: two extract_all passes of the combined pattern
    html = F.coalesce(F.col("html"), F.lit(""))
    from dataproc_spark.extensions.web import _tag_attr
    bodies = F.regexp_extract_all(html, F.lit(FUSED), F.lit(1))
    texts = F.regexp_extract_all(html, F.lit(FUSED), F.lit(2))
    links = F.filter(
        F.zip_with(bodies, texts, lambda t, txt: F.struct(
            _tag_attr(t, "href").alias("href"), txt.alias("t"))),
        lambda s: (~s["href"].startswith("#")) & (s["href"] != ""))
    return d.select("id", F.posexplode(links).alias("p", "l")).select(
        "id", "p", F.col("l.href").alias("href"),
        F.col("l.t").alias("anchor_text"))


def variant_d(d):
    hrefs = F.regexp_extract_all(
        F.coalesce(F.col("html"), F.lit("")),
        F.lit(r'(?is)<a\s[^>]*href\s*=\s*("[^"]*"|\'[^\']*\'|[^"\'\s>]+)'),
        F.lit(1))
    return d.select("id", F.posexplode(hrefs).alias("p", "href"))


for name, fn, agg in (
    ("A attrs-only", variant_a,
     lambda o: o.agg(F.sum(F.length("href")), F.count("rel"))),
    ("B attrs+text", variant_b,
     lambda o: o.agg(F.sum(F.length("href")),
                     F.sum(F.length("anchor_text")))),
    ("C fused-2pass", variant_c,
     lambda o: o.agg(F.sum(F.length("href")),
                     F.sum(F.length("anchor_text")))),
    ("B2 walk-only-split", variant_b2,
     lambda o: o.agg(F.sum(F.length("href")),
                     F.sum(F.length("anchor_text")))),
    ("C2 walk-only-fused", variant_c2,
     lambda o: o.agg(F.sum(F.length("href")),
                     F.sum(F.length("anchor_text")))),
    ("D href-only", variant_d,
     lambda o: o.agg(F.sum(F.length("href")))),
):
    best = None
    for _ in range(REPS):
        t0 = time.time()
        row = agg(fn(docs)).collect()[0]
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"AB {name}: best {best:.2f}s over {REPS}  agg={list(row)}",
          flush=True)
