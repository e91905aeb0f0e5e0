"""CDX capture-index generation with SURT keys — the lookup sidecar a
web archive ships next to its WARC shards (Common Crawl's ``cc-index``,
the Internet Archive's CDX servers). A CDX row answers "which capture
holds URL X?" without touching the archive bytes: the canonical
sort-friendly key, the capture timestamp, and enough response metadata
(mime/status/digest/length/filename) to pick a capture before any
shard is opened.

Reference parity: the reference engine (a ~250-line pandas selective-
search library, ``/root/reference/dataproc/selectivesearch.py``) has no
web-archive surface at all — this module is part of the extension
brief's crawl-pipeline realism ring, built from public formats only:
SURT (the Internet Archive's Sort-friendly URI Reordering Transform,
as documented for the ``surt`` library and the CDX file format spec)
and the CDX(J) field list.

Scale design: both operators are MAP-ONLY column expressions over the
:func:`~dataproc_spark.extensions.warc.read_warc` frame — no shuffle,
no UDF, whole-stage codegen end to end. The index of a 100 TB archive
is a projection of the archive scan; sorting it by key (the "sorted
CDX" deliverable, which makes range-scans work) is ONE global sort of
the tiny index rows — never of the archive — and is left to the
caller's writer (``.sortWithinPartitions``/``repartitionByRange`` on
``urlkey``) so the operator itself stays shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["surt_key", "cdx_index"]


def surt_key(url_col: str | Column = "url") -> Column:
    """The SURT (Sort-friendly URI Reordering Transform) key of a URL:
    ``https://www.Example.co.uk/A/b?b=2&a=1#frag`` →
    ``uk,co,example)/a/b?a=1&b=2``.

    The deterministic canonicalization core, matching the published
    SURT/CDX conventions: the WHOLE url is lowercased (archive
    canonicalizers fold case everywhere, trading path case-sensitivity
    for dedup power — documented CDX behavior); the scheme is dropped;
    one leading ``www.`` label is dropped; host labels are reversed and
    comma-joined so co-domain captures sort adjacently; ``)`` separates
    host from path; an empty path becomes ``/``; query parameters are
    ``&``-split and SORTED (param order never changes page identity in
    the CDX model); the fragment is dropped; an empty query drops its
    ``?``. Port, userinfo, and per-site param-stripping rules are
    deliberately out of scope (they are deployment config, same plan
    shape — see ``web.canonical_url`` for the tracking-param family).

    Pure built-in Column expression — map-only, codegen-friendly, and
    engine-portable (the DuckDB oracle replays it with
    ``string_split``/``list_reverse``/``list_sort``).
    """
    u = F.lower(F.col(url_col) if isinstance(url_col, str) else url_col)
    # fragment FIRST: a '?' that only appears inside the fragment
    # ('/x#sec?b=1') must not leak a phantom query into the key — the
    # unanchored query extract read it (r12 review finding, reproduced)
    u = F.regexp_replace(u, "#.*$", "")
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    # absolute-form FQDN: strip ONE trailing root dot before reversal,
    # else 'example.com.' reverses to a leading-comma key that sorts
    # away from 'example.com' captures (r12 review finding; published
    # SURT canonicalization strips it too)
    host = F.regexp_replace(host, r"\.$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    revhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        revhost,
        F.lit(")"),
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)
        ),
    )


def cdx_index(
    records: DataFrame,
    url_col: str = "target_uri",
) -> DataFrame:
    """Build the CDX capture index of a :func:`...warc.read_warc`
    frame: one row per capture with the canonical CDX(J) field set —

    - ``urlkey`` — :func:`surt_key` of the capture URL;
    - ``ts`` — the 14-digit ``yyyymmddhhmmss`` timestamp (digits of
      ``warc_date``, which ISO 28500 fixes as UTC ``...T..Z``);
    - ``url`` — the original (un-canonicalized) capture URL;
    - ``mime`` — the HTTP ``Content-Type``'s media type (parameters
      stripped, lowercased); NULL when the record carried no envelope
      OR an empty/parameter-only Content-Type value (never ``''``);
    - ``status`` — the HTTP status;
    - ``digest`` — lowercase hex SHA-256 of the response BODY (the
      content-addressed identity ``resolve_revisits`` joins on; the
      classic CDX sha1-base32 is a format detail, not a semantic one,
      and sha256 is the stronger content address — documented
      divergence);
    - ``length`` — the body's octet length;
    - ``filename`` — the shard file holding the capture (basename of
      the ``shard`` column).

    In-shard byte offsets are deliberately NOT emitted: record-per-gzip-
    member shards are seekable only by member boundary, and the
    ``binaryFile``-sourced reader does not track compressed offsets —
    a consumer needing byte-range access re-derives offsets at sink
    time where they are known. Everything here is a map-only
    projection of the reader frame; see the module docstring for the
    sorted-CDX write path.
    """
    mime = F.lower(
        F.trim(F.regexp_extract(F.col("http_content_type"), r"^([^;]*)", 1))
    )
    # '' → NULL: an empty or parameter-only Content-Type value must
    # honor the documented "NULL when untyped" contract, not mint a
    # phantom '' mime class (r12 review finding — the earlier
    # isNull-wrapper was dead code: NULL already propagates through
    # the string functions)
    mime = F.when(mime == "", F.lit(None)).otherwise(mime)
    return records.select(
        surt_key(url_col).alias("urlkey"),
        # first 14 digits ONLY: a WARC 1.1 date may carry fractional
        # seconds ('…00.123Z'), and bare digit-stripping produced a
        # 17-digit ts that breaks fixed-width CDX consumers and range
        # scans (r12 review finding)
        F.substring(
            F.regexp_replace(F.col("warc_date"), r"[^0-9]", ""), 1, 14
        ).alias("ts"),
        F.col(url_col).alias("url"),
        mime.alias("mime"),
        F.col("http_status").alias("status"),
        F.lower(F.sha2(F.col("body"), 256)).alias("digest"),
        F.octet_length(F.col("body")).cast("long").alias("length"),
        F.regexp_extract(F.col("shard"), r"([^/]+)$", 1).alias("filename"),
    )
