"""URL / domain-curation gates (``extensions.web``): host parsing,
registered-domain rollup, per-domain document caps, domain mixture.

The testdata has no URL column, so each gate first *synthesizes* a
deterministic URL per document from ``doc_id`` — the same expression in
Spark and in the DuckDB oracle — then exercises the real operator on
the synthesized column. The synthesis covers the parsing surface: bare
hosts, ``www.`` and multi-label subdomains, two-level public suffixes
(``.co.uk``), query strings.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataproc_spark.extensions import web
from dataproc_spark.queries._tables import _t, sql_lit

#: deterministic URL from doc_id — dialect-portable except the cast
#: keyword, spliced per engine ({S} = STRING | VARCHAR)
_URL_EXPR = (
    "'https://' || "
    "CASE WHEN doc_id % 3 = 0 THEN 'www.' "
    "     WHEN doc_id % 7 = 0 THEN 'cdn.assets.' ELSE '' END || "
    "'site' || CAST(doc_id % 37 AS {S}) || "
    "CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' "
    "     WHEN 2 THEN '.org' ELSE '.io' END || "
    "'/p/' || CAST(doc_id AS {S}) || "
    "CASE WHEN doc_id % 5 = 0 THEN '?ref=mix' ELSE '' END"
)
_URL_SPARK = _URL_EXPR.format(S="STRING")
_URL_DUCK = _URL_EXPR.format(S="VARCHAR")

#: DuckDB-side host + registered-domain derivation (the oracle re-derives
#: what ``web.host_of`` / ``web.registered_domain`` compute JVM-side; the
#: regex constants are THE shared rule — imported, not copied)
_DUCK_HOST = "regexp_extract(lower(url), '^[a-z]+://([^/?#]+)', 1)"


def _duck_domain(host: str) -> str:
    return (
        f"CASE WHEN regexp_extract({host}, '{web._REGDOM_PATTERN}', 1) <> '' "
        f"     THEN regexp_extract({host}, '{web._REGDOM_PATTERN}', 1) "
        f"WHEN regexp_extract({host}, '{web._LAST_TWO_PATTERN}', 1) <> '' "
        f"     THEN regexp_extract({host}, '{web._LAST_TWO_PATTERN}', 1) "
        f"ELSE {host} END"
    )


def _docs_with_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .withColumn("url", F.expr(_URL_SPARK))
    )


def q_url_host_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host extraction + registered-domain rollup (``web.with_domain``):
    map-only JVM ``parse_url`` + the two-level-suffix eTLD+1 heuristic.
    Returns (doc_id, host, domain) for every document — the full parsing
    surface, no aggregation, so any disagreement pinpoints a doc_id."""
    return web.with_domain(_docs_with_url(spark, sf_dir)).select(
        "doc_id", "host", "domain"
    )


SQL_URL_HOST_PARSE = f"""
WITH u AS (SELECT doc_id, {_URL_DUCK} AS url FROM documents),
h AS (SELECT doc_id, {_DUCK_HOST} AS host FROM u)
SELECT doc_id, host, {_duck_domain('host')} AS domain FROM h
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (``web.cap_per_domain``): keep at most 3
    docs per registered domain, preferring shortest ``n_chars`` with
    ``doc_id`` as the deterministic tie-break — the crawl-curation "no
    domain may dominate the corpus" pass. One window shuffle on domain;
    the salted two-phase variant is plan-equivalence-tested in the unit
    suite (same result, bounded partitions under skew)."""
    docs = web.with_domain(_docs_with_url(spark, sf_dir))
    return web.cap_per_domain(
        docs, cap=3, order_by=["n_chars", "doc_id"]
    ).select("doc_id", "domain", "n_chars")


SQL_DOMAIN_CAP = f"""
WITH u AS (SELECT doc_id, n_chars, {_URL_DUCK} AS url FROM documents),
h AS (SELECT doc_id, n_chars, {_DUCK_HOST} AS host FROM u),
d AS (SELECT doc_id, n_chars, {_duck_domain('host')} AS domain FROM h),
r AS (SELECT doc_id, domain, n_chars,
             row_number() OVER (PARTITION BY domain
                                ORDER BY n_chars, doc_id) AS rn
      FROM d)
SELECT doc_id, domain, n_chars FROM r WHERE rn <= 3
"""


def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture report (``web.domain_mixture``): per registered
    domain, document count, total chars, and corpus share in integer
    basis points (integer DIV — bit-stable across engines). The
    denominator is a broadcast 1-row aggregate, not a global window."""
    docs = web.with_domain(_docs_with_url(spark, sf_dir))
    return web.domain_mixture(docs, weight_col="n_chars").select(
        "domain", "n_docs", "weight", "share_bps"
    )


SQL_DOMAIN_MIXTURE = f"""
WITH u AS (SELECT doc_id, n_chars, {_URL_DUCK} AS url FROM documents),
h AS (SELECT doc_id, n_chars, {_DUCK_HOST} AS host FROM u),
d AS (SELECT doc_id, n_chars, {_duck_domain('host')} AS domain FROM h),
per AS (SELECT domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS weight
        FROM d GROUP BY domain)
SELECT domain, n_docs, weight,
       CAST(CASE WHEN (SELECT sum(weight) FROM per) > 0
                 THEN (weight * 10000) // (SELECT sum(weight) FROM per)
                 ELSE 0 END AS BIGINT) AS share_bps
FROM per
"""


#: gate-specific URL synthesis for canonicalization: forces CANONICAL
#: COLLISIONS (~140 classes over 500+ docs) and covers the full rewrite
#: surface — scheme/host case, tracking params at head/mid positions,
#: fragments, trailing slashes
_URL_CANON_EXPR = (
    "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://Site' ELSE 'https://site' END || "
    "CAST(doc_id % 7 AS {S}) || '.com/Page/' || CAST(doc_id % 10 AS {S}) || "
    "CASE doc_id % 8 WHEN 0 THEN '?utm_source=x&id=5' "
    "     WHEN 1 THEN '?id=5' "
    "     WHEN 2 THEN '?id=5&fbclid=abc#frag' "
    # '&ref=' in a PATH segment (legal sub-delim) must survive, and a
    # '?' inside a query VALUE is data — the r8 review found the
    # unanchored normalization corrupted both; these arms pin the fix
    "     WHEN 3 THEN '/dl&ref=home?id=5' "
    "     WHEN 4 THEN '?next=x?y&gclid=g' "
    # trailing slash comes off the PATH, never a query value: arm 5 must
    # merge with arm 1's class, arm 6's '/home/' value must survive —
    # the r8 follow-up review found the final-string strip broke both
    "     WHEN 5 THEN '/?id=5' "
    "     WHEN 6 THEN '?next=/home/' "
    "     ELSE '/' END"
)


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (``web.canonical_url`` + ``web.dedup_by_url``):
    canonicalize (lower scheme/host, drop fragment, strip tracking
    params, trim empty query / trailing slash) and keep the lowest
    ``doc_id`` per canonical URL — the recrawl-collapse pass that runs
    before any text fingerprinting. The synthesized URLs decorate ~140
    canonical classes with case/tracking/fragment variants, so the gate
    exercises every rewrite rule AND real dedup fan-in."""
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("url", F.expr(_URL_CANON_EXPR.format(S="STRING")))
    )
    return web.dedup_by_url(docs).select("doc_id", "canonical_url")


SQL_URL_DEDUP = f"""
WITH u AS (
    SELECT doc_id, {_URL_CANON_EXPR.format(S="VARCHAR")} AS url
    FROM documents
),
c1 AS (
    SELECT doc_id,
           lower(regexp_extract(url, '^([^/?#]*//)', 1)) ||
           regexp_extract(regexp_extract(url, '^[^/?#]*//([^/?#]*)', 1),
                          '^(.*@)', 1) ||
           lower(regexp_replace(
               regexp_extract(url, '^[^/?#]*//([^/?#]*)', 1), '^.*@', '')) ||
           regexp_replace(url, '^[^/?#]*//[^/?#]*', '') AS c
    FROM u
),
c2 AS (SELECT doc_id, regexp_replace(c, '#.*$', '') AS c FROM c1),
c3 AS (SELECT doc_id,
              regexp_extract(c, '^([^?]*)', 1) AS base,
              regexp_replace(regexp_replace(c, '^[^?]*', ''),
                             '^\\?', '?&') AS q
       FROM c2),
c4 AS (SELECT doc_id, base,
              regexp_replace(q, '&{web._TRACKING_RE}', '', 'g') AS q
       FROM c3),
canon AS (SELECT doc_id,
              regexp_replace(base, '/$', '') ||
              regexp_replace(regexp_replace(q, '^\\?&', '?'),
                             '^\\?$', '') AS canonical_url
       FROM c4),
r AS (SELECT doc_id, canonical_url,
             row_number() OVER (PARTITION BY canonical_url
                                ORDER BY doc_id) AS rn
      FROM canon)
SELECT doc_id, canonical_url FROM r WHERE rn = 1
"""


def _extract_fixture_html():
    """The html_extract/wet_roundtrip shared fixture template — one
    definition so the two gates (and the oracle CTE chain both splice)
    can never drift."""
    return F.concat(
        F.lit("<html><!-- crawl "),
        F.col("doc_id").cast("string"),
        F.lit(
            ' --><head><style type="text/css">p { color: red; }</style>'
            '<script>if (a < b && c > 1) { x = "&amp;"; }</script></head>'
            "<body><h1>Doc &amp; title</h1>\n<p>"
        ),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p>\n</body></html>"),
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-style text extraction (``web.extract_text``): each document is
    wrapped in a deterministic HTML template — comment, style block,
    script block (with ``<``/``&&``/quotes inside), entity-bearing
    heading — and the extractor must recover exactly the heading plus
    the whitespace-collapsed body text. Map-only regexp chain, zero
    shuffles; the template is the oracle-able stand-in for real crawl
    HTML already sitting in a ``binary``/``string`` column."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    html = _extract_fixture_html()
    out = docs.withColumn("plain", web.extract_text(html))
    return out.select(
        "doc_id",
        "plain",
        F.length("plain").cast("long").alias("n_chars_plain"),
    )


SQL_HTML_EXTRACT = r"""
WITH h AS (
    SELECT doc_id,
           '<html><!-- crawl ' || CAST(doc_id AS VARCHAR)
           || ' --><head><style type="text/css">p { color: red; }</style>'
           || '<script>if (a < b && c > 1) { x = "&amp;"; }</script></head>'
           || '<body><h1>Doc &amp; title</h1>' || chr(10) || '<p>'
           || coalesce(text, '') || '</p>' || chr(10) || '</body></html>'
           AS html
    FROM documents
),
s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<!--.*?-->', ' ', 'g') AS t FROM h),
s2 AS (SELECT doc_id, regexp_replace(t, '(?is)<script(?:\s[^>]*)?>.*?</script\s*>', ' ', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, regexp_replace(t, '(?is)<style(?:\s[^>]*)?>.*?</style\s*>', ' ', 'g') AS t FROM s2),
s4 AS (SELECT doc_id, regexp_replace(t, '(?is)<[^>]+>', ' ', 'g') AS t FROM s3),
s5 AS (SELECT doc_id,
              replace(replace(replace(replace(replace(replace(t,
                  '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                  '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t
       FROM s4),
s6 AS (SELECT doc_id,
              trim(regexp_replace(t, '[ ' || chr(9) || chr(13) || chr(10) || ']+', ' ', 'g')) AS plain
       FROM s5)
SELECT doc_id, plain, CAST(length(plain) AS BIGINT) AS n_chars_plain FROM s6
"""


#: host synthesis for the PSL gate — covers every rule family in the
#: pinned snapshot: exact ccTLD second-levels, the wildcard and
#: exception geo families, pure-wildcard TLDs (incl. host==public-suffix
#: closure rows), private-section rules, a 4-label wildcard, mixed case,
#: bare single labels, default-rule hosts, and (r10, full-list rebase)
#: an IDN registry rule, a 3-label US locality rule, a private-section
#: rule the old ~100-rule subset lacked, and a depth-5 exact rule
_HOST_PSL_EXPR = (
    "CASE doc_id % 16 "
    "WHEN 0 THEN 'www.site' || CAST(doc_id % 40 AS {S}) || '.co.uk' "
    "WHEN 1 THEN 'a.b.site' || CAST(doc_id % 40 AS {S}) || '.com' "
    "WHEN 2 THEN 'x' || CAST(doc_id % 3 AS {S}) || '.city.kawasaki.jp' "
    "WHEN 3 THEN 'shop.site' || CAST(doc_id % 40 AS {S}) || '.kawasaki.jp' "
    "WHEN 4 THEN 'www.ck' "
    "WHEN 5 THEN CASE WHEN doc_id % 32 = 5 THEN 'bar' || "
    "CAST(doc_id % 40 AS {S}) || '.ck' ELSE 'sub' || "
    "CAST(doc_id % 7 AS {S}) || '.site' || CAST(doc_id % 40 AS {S}) || "
    "'.ck' END "
    "WHEN 6 THEN 'app' || CAST(doc_id % 40 AS {S}) || '.github.io' "
    "WHEN 7 THEN 'n' || CAST(doc_id % 5 AS {S}) || '.h' || "
    "CAST(doc_id % 9 AS {S}) || '.compute.amazonaws.com' "
    "WHEN 8 THEN 'WWW.Site' || CAST(doc_id % 40 AS {S}) || '.COM' "
    "WHEN 9 THEN 'localhost' "
    "WHEN 10 THEN 'docs.site' || CAST(doc_id % 40 AS {S}) || '.gov.uk' "
    "WHEN 11 THEN 'school' || CAST(doc_id % 9 AS {S}) || '.k12.ca.us' "
    "WHEN 12 THEN 'x' || CAST(doc_id % 3 AS {S}) || '.shop' || "
    "CAST(doc_id % 40 AS {S}) || '.公司.cn' "
    "WHEN 13 THEN 'docs.proj' || CAST(doc_id % 40 AS {S}) || '.pages.dev' "
    "WHEN 14 THEN 'b' || CAST(doc_id % 4 AS {S}) || "
    "'.s3.dualstack.us-east-1.amazonaws.com' "
    "ELSE 'cdn.site' || CAST(doc_id % 40 AS {S}) || '.io' END"
)


def q_registered_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-suffix-list eTLD+1 rollup (``psl.registered_domain_psl``):
    the pinned snapshot's full algorithm — longest-match, wildcard
    (``*.kawasaki.jp``, ``*.ck``), exception (``!city.kawasaki.jp``,
    ``!www.ck``), private-section and 4-label-wildcard rules, default
    rule for unmatched hosts. Plan: per-depth broadcast joins of the
    rule table, map-side only, zero shuffles (the 100 TB posture every
    domain cap/mixture inherits). The oracle replays the identical
    algorithm in DuckDB over the SAME rule rows (``psl.parse_rules`` —
    shared, not copied)."""
    from dataproc_spark.extensions.psl import registered_domain_psl

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("host", F.expr(_HOST_PSL_EXPR.format(S="STRING")))
    )
    return registered_domain_psl(docs).select(
        "doc_id", F.lower("host").alias("host"), "domain"
    )


def _make_sql_registered_domain_psl() -> str:
    from dataproc_spark.extensions.psl import parse_rules

    parsed = parse_rules()
    k_max = max(n for _, n, _, _ in parsed)
    values = ", ".join(
        f"('{t}', {n}, {str(w).upper()}, {str(e).upper()})"
        for t, n, w, e in parsed
    )
    return f"""
WITH hosts AS (
    SELECT doc_id, {_HOST_PSL_EXPR.format(S="VARCHAR")} AS host
    FROM documents
),
rules(rule, k, is_wild, is_exc) AS (VALUES {values}),
h AS (
    SELECT doc_id, lower(host) AS host,
           string_split(lower(host), '.') AS labs,
           len(string_split(lower(host), '.')) AS n
    FROM hosts
),
cand AS (
    SELECT h.doc_id, gs.k AS k,
           array_to_string(h.labs[h.n - gs.k + 1:], '.') AS sk,
           '*.' || array_to_string(h.labs[h.n - gs.k + 2:], '.') AS wk
    FROM h, generate_series(2, {k_max}) gs(k)
    WHERE gs.k <= h.n
),
m AS (
    SELECT c.doc_id, c.k,
           bool_or(r.is_exc) AS any_exc,
           bool_or(NOT r.is_exc) AS any_std
    FROM cand c JOIN rules r
      ON (NOT r.is_wild AND r.rule = c.sk)
      OR (r.is_wild AND r.rule = c.wk)
    WHERE r.k = c.k
    GROUP BY c.doc_id, c.k
),
best AS (
    SELECT doc_id,
           max(CASE WHEN any_exc THEN k END) AS exc_k,
           max(CASE WHEN any_std THEN k END) AS std_k
    FROM m GROUP BY doc_id
),
ps AS (
    SELECT h.doc_id, h.host, h.labs, h.n,
           CASE WHEN b.exc_k IS NOT NULL THEN b.exc_k - 1
                WHEN b.std_k IS NOT NULL THEN b.std_k
                ELSE 1 END AS ps_len
    FROM h LEFT JOIN best b USING (doc_id)
)
SELECT doc_id, host,
       array_to_string(labs[n - least(n, ps_len + 1) + 1:], '.') AS domain
FROM ps
"""


SQL_REGISTERED_DOMAIN_PSL = _make_sql_registered_domain_psl()


#: boilerplate-gate page template: nav + sidebar + related-links (long
#: but link-dense) + footer wrapped around the document's text — the
#: arms a tag-strip extractor keeps and a density filter must drop
_BOILER_PREFIX = (
    '<html><head><title>T</title><style>p { color: red; }</style></head>'
    '<body><nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></nav>'
    '<div class="sidebar"><ul><li><a href="/1">Link one</a></li>'
    '<li><a href="/2">Link two</a></li></ul></div>'
    '<div class="content"><h1>Collection item &amp; principal heading</h1><p>'
)
_BOILER_SUFFIX = (
    '</p></div><div class="related"><ul>'
    '<li><a href="/r1">A very long related article title number one</a></li>'
    '<li><a href="/r2">Another long related article title number two</a></li>'
    '</ul></div>'
    '<footer>Copyright 2026 <a href="/tos">Terms</a> '
    '<a href="/privacy">Privacy</a></footer></body></html>'
)


def q_html_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level boilerplate removal (``web.extract_main_text``): each
    document is wrapped in a full page template — nav bar, link-list
    sidebar, LONG link-dense related-articles block, footer — and the
    extractor must keep exactly the heading + body paragraph (the
    blocks with enough text and low link density) while dropping every
    boilerplate arm that plain tag-strip (``html_extract``) keeps. One
    projection: split on block tags, higher-order transform/filter with
    the integer link-density rule, array_join — map-only, zero
    shuffles; the oracle replays the identical list pipeline in DuckDB
    from the same shared regex/entity constants."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit(_BOILER_PREFIX),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(_BOILER_SUFFIX),
    )
    out = docs.withColumn("main", web.extract_main_text(html))
    return out.select(
        "doc_id",
        "main",
        F.length("main").cast("long").alias("n_chars_main"),
    )


def _make_sql_html_boilerplate() -> str:
    # nested replace() chain, innermost-first, mirroring HTML_ENTITIES
    expr = "regexp_replace({x}, '(?is)<[^>]+>', ' ', 'g')"
    for ent, repl in web.HTML_ENTITIES:
        r = "chr(39)" if repl == "'" else "'" + repl.replace("'", "''") + "'"
        expr = f"replace({expr}, '{ent}', {r})"
    clean = (
        "trim(regexp_replace(" + expr +
        ", '[ ' || chr(9) || chr(13) || chr(10) || ']+', ' ', 'g'))"
    )
    clean_t = clean.format(x="b")
    clean_nl = clean.format(
        x=f"regexp_replace(b, '{web.ANCHOR_SPAN_RE}', ' ', 'g')"
    )
    prefix = _BOILER_PREFIX.replace("'", "''")
    suffix = _BOILER_SUFFIX.replace("'", "''")
    return f"""
WITH h AS (
    SELECT doc_id,
           '{prefix}' || coalesce(text, '') || '{suffix}' AS html
    FROM documents
),
pre AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(html,
               '(?is)<!--.*?-->', ' ', 'g'),
               '(?is)<script(?:\\s[^>]*)?>.*?</script\\s*>', ' ', 'g'),
               '(?is)<style(?:\\s[^>]*)?>.*?</style\\s*>', ' ', 'g') AS t
    FROM h
),
blk AS (
    SELECT doc_id,
           list_transform(
               regexp_split_to_array(t, '{web.BLOCK_SPLIT_RE}'),
               b -> {{'t': {clean_t}, 'nl': {clean_nl}}}
           ) AS s
    FROM pre
),
kept AS (
    SELECT doc_id,
           array_to_string(
               list_transform(
                   list_filter(s, x -> len(x.t) >= 30
                       AND (len(x.t) - len(x.nl)) * 100 <= 33 * len(x.t)),
                   x -> x.t),
               ' ') AS main
    FROM blk
)
SELECT doc_id, main, CAST(length(main) AS BIGINT) AS n_chars_main FROM kept
"""


SQL_HTML_BOILERPLATE = _make_sql_html_boilerplate()


def _warc_doc_uri(id_col=None):
    """The WARC gates' shared deterministic URI per document —
    ``https://site{id%37}.com/doc/{id}`` (37 hosts give the recrawl-ish
    fan-in the URL-family gates also use). ``id_col`` defaults to
    ``doc_id``; the revisit gate passes the content-class column to
    derive the ORIGINAL capture's URI."""
    idc = F.col("doc_id") if id_col is None else id_col
    return F.concat(
        F.lit("https://site"),
        (idc % 37).cast("string"),
        F.lit(".com/doc/"),
        idc.cast("string"),
    )


def _warc_doc_id():
    """Inverse of :func:`_warc_doc_uri`: recover ``doc_id`` from a
    re-ingested record's ``target_uri`` (shared by every WARC gate that
    round-trips documents through an archive)."""
    return (
        F.regexp_extract("target_uri", r"/doc/([0-9]+)$", 1)
        .cast("long")
        .alias("doc_id")
    )


def _sql_lit(s: str) -> str:
    """Back-compat alias of :func:`dataproc_spark.queries._tables.sql_lit`."""
    return sql_lit(s)


def _write_warc_scratch(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    wrap: tuple[str, str],
    http_envelope: bool = False,
    gzip_every: int | None = None,
    utf16_every: int | None = None,
) -> str:
    """Shared WARC-gate synthesis (r9 review: the URI/payload select was
    copy-pasted between the two gates): wrap each document's text in
    ``wrap`` and sink the corpus as WARC shards under a fresh scratch
    dir, which is REMOVED on a failed write (the eager
    ``foreachPartition`` action runs here, before any
    ``_materialize_and_clean`` could guard it — same leak class the r7
    review fixed for the format-roundtrip gates).

    ``http_envelope=True`` prefixes each payload with a real
    ``HTTP/1.1 200 OK`` status line + headers + blank line — the shape
    an actual Common Crawl *response* record has — so gates reading
    ``body`` exercise the envelope split, not a bare-HTML shortcut
    (r9 verdict's top gap). The sink declares ``application/http`` only
    in that arm; bare payloads are stamped honestly as ``text/html``.
    ``gzip_every=N`` additionally gzip-codes every Nth document's body
    on the wire (deterministic mtime-0 gzip, ``Content-Encoding: gzip``
    header) — downstream results must be INVARIANT to the wire
    representation once routed through ``decoded_body``.
    ``utf16_every=N`` (r11) encodes every Nth document's page as
    UTF-16-with-BOM while the envelope still (wrongly, as real servers
    do) claims ``charset=utf-8`` — the BOM is more authoritative than
    the header (WHATWG sniff order), so results must ALSO be invariant
    to the page encoding once routed through ``body_text``; a
    hard-coded UTF-8 decode turns these pages into NUL-ridden mojibake.
    The two arms intersect (gzip'd UTF-16 pages) when both are set."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import warc as warcx

    doc_text = F.concat(
        F.lit(wrap[0]), F.coalesce(F.col("text"), F.lit("")),
        F.lit(wrap[1]),
    )
    doc_bytes = F.encode(doc_text, "UTF-8")
    if utf16_every:
        # Java's UTF-16 charset emits a big-endian BOM — exactly the
        # byte shape decode_body_text's sniff step keys on
        doc_bytes = F.when(
            F.col("doc_id") % int(utf16_every) == 1,
            F.encode(doc_text, "UTF-16"),
        ).otherwise(doc_bytes)
    if http_envelope:
        if gzip_every:
            import pandas as pd
            from pyspark.sql.functions import pandas_udf
            from pyspark.sql.types import BinaryType

            def _gz_env(doc: "pd.Series") -> "pd.Series":
                import gzip as _gzip

                out = []
                for d in doc:
                    gz = _gzip.compress(bytes(d), mtime=0)
                    head = (
                        "HTTP/1.1 200 OK\r\n"
                        "Content-Type: text/html; charset=utf-8\r\n"
                        "Content-Encoding: gzip\r\n"
                        f"Content-Length: {len(gz)}\r\n\r\n"
                    ).encode("ascii")
                    out.append(head + gz)
                return pd.Series(out, dtype=object)

            _gz_env.__annotations__ = {"doc": pd.Series, "return": pd.Series}
            gz_env = pandas_udf(_gz_env, BinaryType())
        plain = F.concat(
            F.encode(
                F.concat(
                    F.lit(
                        "HTTP/1.1 200 OK\r\n"
                        "Content-Type: text/html; charset=utf-8\r\n"
                        "Content-Length: "
                    ),
                    F.octet_length(doc_bytes).cast("string"),
                    F.lit("\r\n\r\n"),
                ),
                "UTF-8",
            ),
            doc_bytes,
        )
        if gzip_every:
            payload = F.when(
                F.col("doc_id") % int(gzip_every) == 0, gz_env(doc_bytes)
            ).otherwise(plain)
        else:
            payload = plain
        content_type = "application/http; msgtype=response"
    else:
        payload = doc_bytes
        content_type = "text/html"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        _warc_doc_uri().alias("target_uri"),
        payload.alias("payload"),
    )
    out = tempfile.mkdtemp(prefix=prefix)
    try:
        warcx.write_warc_shards(docs, out, content_type=content_type)
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    return out


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl-archive roundtrip (``extensions.warc``): wrap each
    document as an HTTP-response payload, sink one ``.warc.gz`` per
    partition (record-per-gzip-member, the Common Crawl layout), then
    re-ingest with ``read_warc`` (binaryFile scan → Arrow record
    splitter, no shuffle) and recover (doc_id, content_length,
    payload length) per record. The oracle computes the same numbers
    straight from ``documents`` — the roundtrip must be the identity,
    so any envelope bug (Content-Length arithmetic, CRLF framing, gzip
    member boundaries, header parse) hash-fails. Scratch shards are
    deleted before returning (`_materialize_and_clean`)."""
    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    out = _write_warc_scratch(
        spark, sf_dir, prefix="warcrt_",
        wrap=("<html>", "</html>"),
    )
    back = warcx.read_warc(spark, out)
    res = back.select(
        _warc_doc_id(),
        "target_uri",
        "content_length",
        F.octet_length("payload").cast("long").alias("n_payload_bytes"),
    )
    return _materialize_and_clean(res, out)


SQL_WARC_ROUNDTRIP = """
SELECT doc_id,
       'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com/doc/'
           || CAST(doc_id AS VARCHAR) AS target_uri,
       CAST(strlen('<html>' || coalesce(text, '') || '</html>') AS BIGINT)
           AS content_length,
       CAST(strlen('<html>' || coalesce(text, '') || '</html>') AS BIGINT)
           AS n_payload_bytes
FROM documents
"""


def q_warc_http_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP-envelope split on WARC ingestion (``warc.read_warc`` +
    ``split_http_envelope`` + ``decoded_body``): real Common Crawl
    *response* records carry ``application/http`` payloads — status
    line, headers, blank line, THEN the document, possibly gzip'd or
    chunk-framed — so reading ``payload`` as text ingests header noise
    and compressed bytes. Six arms per document: (0) full 200 envelope
    with charset'd Content-Type, a custom ``X-Crawl`` header, and a
    computed ``Content-Length``; (1) a 404 ``text/plain`` envelope;
    (2) NO envelope at all (bare HTML stamped ``application/http`` —
    the claimed-but-absent case); (3) a malformed envelope
    (``HTTP/1.1 OK`` — status not an integer); (4, r10b) a
    ``Content-Encoding: gzip`` body (synthesized with deterministic
    mtime-0 gzip in an Arrow kernel); (5, r10b) a ``Transfer-Encoding:
    chunked`` body (two framing fields, hex sizes). Arms 2/3 must fall
    back to ``body = payload`` with NULL status/headers, never lose
    bytes, and never fail the shard (quarantine is for WARC framing);
    arms 4/5 must decode through ``decoded_body`` to the exact original
    text — a gunzip/dechunk bug shifts both the text and its byte
    count. The oracle rebuilds every arm's expected decode
    arithmetically from ``documents``. Scratch shards are removed
    before returning."""
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    txt = F.coalesce(F.col("text"), F.lit(""))
    did = F.col("doc_id").cast("string")
    body0 = F.concat(F.lit("<html>"), txt, F.lit("</html>"))
    env0 = F.concat(
        F.lit(
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            "X-Crawl: site"
        ),
        (F.col("doc_id") % 37).cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(F.encode(body0, "UTF-8")).cast("string"),
        F.lit("\r\n\r\n"),
        body0,
    )
    env1 = F.concat(
        F.lit(
            "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n"
            "not found "
        ),
        did,
    )
    bare = F.concat(F.lit("<html>bare "), txt, F.lit("</html>"))
    malformed = F.concat(F.lit("HTTP/1.1 OK\r\n\r\ntail "), did)

    def _gz(text):
        import gzip as _gzip

        out = []
        for t in text:
            doc = ("<gz>" + (t or "") + "</gz>").encode("utf-8")
            gz = _gzip.compress(doc, mtime=0)
            head = (
                "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                "Content-Encoding: gzip\r\nContent-Length: "
                f"{len(gz)}\r\n\r\n"
            ).encode("ascii")
            out.append(head + gz)
        return pd.Series(out, dtype=object)

    _gz.__annotations__ = {"text": pd.Series, "return": pd.Series}
    gz_payload = pandas_udf(_gz, BinaryType())

    ch_body = F.encode(F.concat(F.lit("<ch>"), txt, F.lit("</ch>")), "UTF-8")
    env5 = F.concat(
        F.encode(
            F.concat(
                F.lit(
                    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    "Transfer-Encoding: chunked\r\n\r\n"
                ),
                F.hex(F.octet_length(ch_body)),
                F.lit("\r\n"),
            ),
            "UTF-8",
        ),
        ch_body,
        F.encode(F.lit("\r\n0\r\n\r\n"), "UTF-8"),
    )
    arm = F.col("doc_id") % 6
    src = docs.select(
        _warc_doc_uri().alias("target_uri"),
        F.when(arm == 4, gz_payload(F.col("text")))
        .when(arm == 5, env5)
        .otherwise(
            F.encode(
                F.when(arm == 0, env0)
                .when(arm == 1, env1)
                .when(arm == 2, bare)
                .otherwise(malformed),
                "UTF-8",
            )
        )
        .alias("payload"),
    )
    out = tempfile.mkdtemp(prefix="warchttp_")
    try:
        warcx.write_warc_shards(src, out)
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    decoded = warcx.decoded_body("body", "http_headers")
    res = warcx.read_warc(spark, out).select(
        _warc_doc_id(),
        F.col("http_status").cast("int").alias("http_status"),
        "http_content_type",
        F.element_at("http_headers", "x-crawl").alias("x_crawl"),
        F.element_at("http_headers", "content-encoding").alias("c_enc"),
        F.decode(decoded, "UTF-8").alias("body_text"),
        F.octet_length(decoded).cast("long").alias("n_body_bytes"),
    )
    return _materialize_and_clean(res, out)


SQL_WARC_HTTP_SPLIT = """
WITH b AS (
    SELECT doc_id,
           CASE doc_id % 6
               WHEN 0 THEN '<html>' || coalesce(text, '') || '</html>'
               WHEN 1 THEN 'not found ' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '<html>bare ' || coalesce(text, '')
                           || '</html>'
               WHEN 3 THEN 'HTTP/1.1 OK' || chr(13) || chr(10) || chr(13)
                    || chr(10) || 'tail ' || CAST(doc_id AS VARCHAR)
               WHEN 4 THEN '<gz>' || coalesce(text, '') || '</gz>'
               ELSE '<ch>' || coalesce(text, '') || '</ch>'
           END AS body_text
    FROM documents
)
SELECT doc_id,
       CAST(CASE doc_id % 6 WHEN 0 THEN 200 WHEN 1 THEN 404
                            WHEN 4 THEN 200 WHEN 5 THEN 200 END
            AS INTEGER) AS http_status,
       CASE doc_id % 6
           WHEN 0 THEN 'text/html; charset=utf-8'
           WHEN 1 THEN 'text/plain'
           WHEN 4 THEN 'text/html'
           WHEN 5 THEN 'text/html'
       END AS http_content_type,
       CASE doc_id % 6
           WHEN 0 THEN 'site' || CAST(doc_id % 37 AS VARCHAR)
       END AS x_crawl,
       CASE doc_id % 6 WHEN 4 THEN 'gzip' END AS c_enc,
       body_text,
       CAST(strlen(body_text) AS BIGINT) AS n_body_bytes
FROM b
"""


def q_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END crawl-to-corpus pipeline — the production shape every
    r9 piece exists for, chained as one lazy plan: documents wrapped as
    full HTML pages inside a REAL ``HTTP/1.1 200 OK`` envelope (the
    bytes an actual Common Crawl response record carries; every 3rd
    body gzip-coded on the wire, r10b; every 5th page UTF-16-with-BOM
    under a header that wrongly claims utf-8, r11 — some pages are
    BOTH) → sunk as ``.warc.gz`` shards (``write_warc_shards``) →
    re-ingested (``read_warc``, binaryFile + Arrow record splitter,
    which splits the HTTP envelope) → charset-aware text decode
    (``body_text`` — BOM > header > meta sniff; a hard-coded UTF-8
    decode would mojibake the UTF-16 pages into NUL soup and skew the
    mixture) → boilerplate removal (``extract_main_text`` — fed
    headers, it would score them as text; the r10 envelope split is
    what makes this correct on real archives) → trigram language-ID
    (``predicted_lang``) → language mixture in integer basis points
    (``domain_mixture`` machinery). The oracle replays the whole chain
    relationally in DuckDB from the same shared template/regex/profile
    constants — WARC + envelope split + wire codings + page encodings
    are exercised as a true identity layer inside a longer pipeline."""
    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.extensions.textstats import predicted_lang
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    out = _write_warc_scratch(
        spark, sf_dir, prefix="crawlpipe_",
        wrap=(_BOILER_PREFIX, _BOILER_SUFFIX),
        http_envelope=True,
        gzip_every=3,  # a third of the corpus arrives gzip-coded: the
        # mixture must be INVARIANT to the wire representation
        utf16_every=5,  # …and a fifth of the PAGES are UTF-16-with-BOM
        # under a lying charset=utf-8 header: invariant to page encoding
    )
    # production shape: always decode transfer/content codings, then
    # resolve the page charset, before text extraction — a third of
    # these bodies are gzip-coded ON THE WIRE (gzip_every=3 above) and
    # a fifth are UTF-16 pages (utf16_every=5), so BOTH stages are
    # load-bearing: the mixture is only invariant because they run
    main = web.extract_main_text(
        warcx.body_text(
            warcx.decoded_body("body", "http_headers"),
            F.col("http_content_type"),
        )
    )
    scored = warcx.read_warc(spark, out).select(
        main.alias("main")
    ).select(
        predicted_lang("main").alias("pred_lang"),
        F.length("main").cast("long").alias("w"),
    )
    mix = web.domain_mixture(scored, domain_col="pred_lang", weight_col="w")
    return _materialize_and_clean(
        mix.select("pred_lang", "n_docs", "weight", "share_bps"), out
    )


def _make_sql_crawl_pipeline() -> str:
    from dataproc_spark.queries.documents import (
        _LANG_ARGMAX_SQL,
        _LANG_NORM_SQL,
        _LANG_SCORES_SQL,
    )

    boiler = _make_sql_html_boilerplate()
    norm = _LANG_NORM_SQL  # references a column literally named `text`
    return f"""
WITH base AS (
    SELECT main AS text FROM ( {boiler} ) b
),
n AS (SELECT {norm} AS s, CAST(length(text) AS BIGINT) AS w FROM base),
scored AS (
    SELECT w,
           {_LANG_SCORES_SQL}
    FROM n
),
pred AS (SELECT {_LANG_ARGMAX_SQL} AS pred_lang, w FROM scored),
per AS (
    SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS weight
    FROM pred GROUP BY pred_lang
)
SELECT pred_lang, n_docs, weight,
       CAST(CASE WHEN (SELECT sum(weight) FROM per) > 0
                 THEN (weight * 10000) // (SELECT sum(weight) FROM per)
                 ELSE 0 END AS BIGINT) AS share_bps
FROM per
"""


SQL_CRAWL_PIPELINE = _make_sql_crawl_pipeline()


# --------------------------------------------------------------------------
# r11: charset-aware body -> text
# --------------------------------------------------------------------------

#: per-arm non-ASCII suffixes — the ONE set of constants both the Spark
#: fixture kernel and the DuckDB oracle derive from, so the two sides
#: cannot drift. The documents text is pure ASCII; these suffixes are
#: what make each charset arm load-bearing (an ASCII body encodes
#: identically in every legacy charset).
_CS_SUF_1251 = " — тест кодировки"      # cp1251: Cyrillic + em-dash
_CS_SUF_SJIS = " 日本語テスト"            # shift_jis
_CS_SUF_1252 = " café €1"                # € exists in cp1252, NOT latin-1
_CS_SUF_KOI8 = " проверка"               # koi8-r, declared only in <meta>
_CS_META_PREFIX = '<meta charset="koi8-r">'
_CS_SUF_TRAP = " ловушка"                # cp1251 bytes under a utf-8 label
_CS_SUF_FALLBACK = " привет"             # cp1251 bytes, nothing declared
_CS_SUF_UTF32 = " страница-32"           # UTF-32LE page, BOM-declared only
#: r12: quoted-'>' prescan trap + the legacy START-form content value
#: ("charset=..." with no media type) in one tag — both r11 advice
#: findings; the data-x value's '>' must not truncate the tag scan
_CS_META_PREFIX_LEGACY = (
    '<meta data-x="a > b" http-equiv=content-type '
    'content="charset=koi8-r">'
)
#: what UTF-8-with-replacement makes of the undeclared cp1251 bytes —
#: computed ONCE here and spliced into both sides' expectations
_CS_FALLBACK_REPLACED = _CS_SUF_FALLBACK.encode("cp1251").decode(
    "utf-8", "replace"
)


def q_charset_body_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset-aware body→text decode (``warc.body_text`` /
    ``decode_body_text``): a real crawl is full of windows-1251 /
    shift_jis / gbk / latin-1 pages, and the r10 pipeline hard-coded
    ``F.decode(..., 'UTF-8')`` — mojibake or NULL on every one of them.
    Eight arms per document (fixture bytes synthesized in an Arrow
    kernel from the shared suffix constants):

    0. ``charset=windows-1251`` header, cp1251 bytes → exact text;
    1. ``charset=Shift_JIS`` header (case/underscore label) → exact;
    2. ``charset=iso-8859-1`` header but bytes containing ``€`` (0x80)
       — the WHATWG latin-1→windows-1252 override is load-bearing: a
       literal latin-1 decode yields U+0080, not ``€``;
    3. NO header charset; ``<meta charset="koi8-r">`` prescan decides;
    4. the mojibake TRAP: cp1251 bytes under ``charset=utf-8`` — the
       declared-strict decode must fail and quarantine to NULL, never
       ship mojibake;
    5. nothing declared anywhere: UTF-8 with U+FFFD replacement — the
       expected string (ASCII text + the replaced suffix constant) is
       computed once and shared with the oracle;
    6. (r12) a UTF-32LE page declared only by its BOM — the
       ``\\xff\\xfe\\x00\\x00`` mark prefix-matches the UTF-16LE BOM,
       so an implementation that checks UTF-16 first "succeeds" with
       NUL-interleaved text and hash-fails (r11 advice finding);
    7. (r12) the legacy-meta double trap: a quoted attribute value
       containing ``>`` BEFORE the declaration (the prescan must skip
       it, not truncate the tag) and the START-form ``content=
       "charset=koi8-r"`` with no media type (the ``;``-required
       charset regex missed it) — both r11 advice findings in one tag.

    The oracle rebuilds every arm's expected TEXT from ``documents``
    and the same constants — pure identity for arms 0–3 and 6–7, NULL
    for 4, the precomputed replacement string for 5."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from dataproc_spark.extensions import warc as warcx

    def _payload(doc_id: "pd.Series", text: "pd.Series") -> "pd.Series":
        out = []
        for i, t in zip(doc_id, text):
            t = t or ""
            arm = int(i) % 8
            if arm == 0:
                out.append((t + _CS_SUF_1251).encode("cp1251"))
            elif arm == 1:
                out.append((t + _CS_SUF_SJIS).encode("shift_jis"))
            elif arm == 2:
                out.append((t + _CS_SUF_1252).encode("cp1252"))
            elif arm == 3:
                out.append(
                    (_CS_META_PREFIX + t + _CS_SUF_KOI8).encode("koi8-r")
                )
            elif arm == 4:
                out.append((t + _CS_SUF_TRAP).encode("cp1251"))
            elif arm == 6:
                out.append(
                    b"\xff\xfe\x00\x00"
                    + (t + _CS_SUF_UTF32).encode("utf-32-le")
                )
            elif arm == 7:
                out.append(
                    (_CS_META_PREFIX_LEGACY + t + _CS_SUF_KOI8)
                    .encode("koi8-r")
                )
            else:
                out.append((t + _CS_SUF_FALLBACK).encode("cp1251"))
        return pd.Series(out, dtype=object)

    _payload.__annotations__ = {
        "doc_id": pd.Series, "text": pd.Series, "return": pd.Series,
    }
    payload_udf = pandas_udf(_payload, BinaryType())

    arm = F.col("doc_id") % 8
    ct = (
        F.when(arm == 0, F.lit("text/html; charset=windows-1251"))
        .when(arm == 1, F.lit("text/html; charset=Shift_JIS"))
        .when(arm == 2, F.lit("text/html; charset=iso-8859-1"))
        .when(arm == 4, F.lit("text/html; charset=utf-8"))
        .otherwise(F.lit("text/html"))
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        payload_udf(F.col("doc_id"), F.col("text")).alias("payload"),
        ct.alias("http_content_type"),
    )
    bt = warcx.body_text("payload", "http_content_type", on_error="null")
    return docs.select(
        "doc_id",
        bt.alias("body_text"),
        F.length(bt).cast("long").alias("n_chars_text"),
    )


def _make_sql_charset_body_text() -> str:
    lit = _sql_lit

    return f"""
WITH b AS (
    SELECT doc_id,
           CASE doc_id % 8
               WHEN 0 THEN coalesce(text, '') || {lit(_CS_SUF_1251)}
               WHEN 1 THEN coalesce(text, '') || {lit(_CS_SUF_SJIS)}
               WHEN 2 THEN coalesce(text, '') || {lit(_CS_SUF_1252)}
               WHEN 3 THEN {lit(_CS_META_PREFIX)} || coalesce(text, '')
                           || {lit(_CS_SUF_KOI8)}
               WHEN 4 THEN NULL
               WHEN 6 THEN coalesce(text, '') || {lit(_CS_SUF_UTF32)}
               WHEN 7 THEN {lit(_CS_META_PREFIX_LEGACY)}
                           || coalesce(text, '') || {lit(_CS_SUF_KOI8)}
               ELSE coalesce(text, '') || {lit(_CS_FALLBACK_REPLACED)}
           END AS body_text
    FROM documents
)
SELECT doc_id, body_text,
       CAST(length(body_text) AS BIGINT) AS n_chars_text
FROM b
"""


SQL_CHARSET_BODY_TEXT = _make_sql_charset_body_text()


# --------------------------------------------------------------------------
# r11: WARC revisit records — digest-based recrawl dedup
# --------------------------------------------------------------------------

def q_warc_revisit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC *revisit* ingestion + recrawl dedup
    (``warc.resolve_revisits``): Common Crawl stores a recrawl whose
    content hash matches an earlier capture as a tiny ``revisit``
    record — digest + refers-to pointers, NO payload — so a revisit-
    blind reader silently drops every unchanged page from the corpus
    view. Fixture (revisit-HEAVY, ~92% revisits at 500 docs): content
    classes ``cls = doc_id % 40``; docs ``< 40`` are the original
    ``response`` captures (real HTML payload + ``WARC-Payload-Digest``),
    docs ``>= 40`` are revisits of class ``cls`` — digest of the
    original's payload, ``WARC-Refers-To`` = the original's record id,
    empty payload — EXCEPT ``cls == 39`` revisits, which carry an
    orphan digest matching no response (the referenced capture lives in
    an un-read shard) and must resolve to NULL body with NULL source
    (the quarantine arm). The chain: one mixed frame →
    ``write_warc_shards`` (``extra_headers`` emits the revisit headers
    only where non-NULL) → ``read_warc(warc_types=('response',
    'revisit'))`` → ``resolve_revisits`` (digest equi-join against
    min-record-id donors). The oracle rebuilds every output column
    arithmetically — DuckDB's ``md5`` reproduces the sink's
    deterministic record ids, so even the donor pointer is value-
    checked."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    cls = did % 40
    body_str = F.concat(
        F.lit("<html>revisit page "),
        cls.cast("string"),
        F.lit(" "),
        F.repeat(F.lit("pad "), (cls % 5).cast("int")),
        F.lit("</html>"),
    )
    is_resp = did < 40
    orphan = (~is_resp) & (cls == 39)
    digest = F.concat(
        F.lit("sha1:"),
        F.sha1(
            F.when(
                orphan,
                F.encode(
                    F.concat(F.lit("orphan-"), did.cast("string")), "UTF-8"
                ),
            ).otherwise(F.encode(body_str, "UTF-8"))
        ),
    )
    orig_uri = _warc_doc_uri(cls)
    src = docs.select(
        _warc_doc_uri().alias("target_uri"),
        F.when(is_resp, F.encode(body_str, "UTF-8"))
        .otherwise(F.lit(b""))
        .alias("payload"),
        F.when(is_resp, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("wtype"),
        digest.alias("digest"),
        F.when(
            ~is_resp,
            F.concat(
                F.lit("<urn:uuid:"),
                F.md5(F.encode(F.concat(F.lit("response:"), orig_uri),
                               "UTF-8")),
                F.lit(">"),
            ),
        ).alias("refers_to"),
        F.when(~is_resp, orig_uri).alias("refers_to_uri"),
        F.when(
            ~is_resp,
            F.lit(
                "http://netpreserve.org/warc/1.0/revisit/"
                "identical-payload-digest"
            ),
        ).alias("profile"),
    )
    out = tempfile.mkdtemp(prefix="warcrev_")
    try:
        warcx.write_warc_shards(
            src, out,
            type_col="wtype",
            content_type="text/html",
            extra_headers={
                "WARC-Payload-Digest": "digest",
                "WARC-Refers-To": "refers_to",
                "WARC-Refers-To-Target-URI": "refers_to_uri",
                "WARC-Profile": "profile",
            },
        )
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    recs = warcx.read_warc(spark, out, warc_types=("response", "revisit"))
    resolved = warcx.resolve_revisits(recs)
    res = resolved.select(
        _warc_doc_id(),
        "is_revisit",
        "source_record_id",
        F.decode(F.col("body"), "UTF-8").alias("body_text"),
        F.octet_length("body").cast("long").alias("n_body_bytes"),
    )
    return _materialize_and_clean(res, out)


SQL_WARC_REVISIT_DEDUP = """
WITH b AS (
    SELECT doc_id,
           doc_id % 40 AS cls,
           doc_id >= 40 AS is_rev,
           doc_id >= 40 AND doc_id % 40 = 39 AS orphan,
           '<html>revisit page ' || CAST(doc_id % 40 AS VARCHAR) || ' '
               || repeat('pad ', CAST(doc_id % 40 AS INTEGER) % 5)
               || '</html>' AS body
    FROM documents
)
SELECT doc_id,
       is_rev AS is_revisit,
       CASE WHEN is_rev AND NOT orphan THEN
            '<urn:uuid:' || md5('response:https://site'
                || CAST(cls % 37 AS VARCHAR) || '.com/doc/'
                || CAST(cls AS VARCHAR)) || '>'
       END AS source_record_id,
       CASE WHEN NOT orphan THEN body END AS body_text,
       CASE WHEN NOT orphan
            THEN CAST(strlen(body) AS BIGINT) END AS n_body_bytes
FROM b
"""


# --------------------------------------------------------------------------
# r11: HTML entity unescape
# --------------------------------------------------------------------------

#: per-arm entity decorations — RAW forms appended to the document text
#: on the Spark side; the CLEAN twins (what a correct unescape yields)
#: are computed ONCE here via the stdlib html.unescape and spliced into
#: the oracle, so the expectation cannot drift from the HTML5 table.
_ENT_RAW = (
    " Tom &amp; Jerry &lt;tag&gt;",          # the big-four named refs
    " caf&eacute; &#1087;&#1088;&#1080;",    # named + DECIMAL numeric
    " &#x43F;&#x440; &quot;q&quot; &#X42F;", # HEX numeric, both X cases
    " double &amp;lt; stays",                # double-escape semantics
    " &unknown; &nbsp;end",                  # unknown ref preserved; NBSP
)
_ENT_CLEAN = tuple(_html.unescape(r) for r in _ENT_RAW)


def q_html_unescape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML character-reference decode (``web.unescape_html``,
    ``mode='full'`` — the complete HTML5 table via an Arrow kernel):
    text coming out of boilerplate removal is full of ``&amp;`` /
    ``&#39;`` / ``&nbsp;``, and a tokenizer or language-ID profile fed
    raw entities scores garbage. Five arms per document: the dominant
    named refs, named+decimal-numeric, hex-numeric (both ``&#x``/
    ``&#X`` spellings), the double-escape trap (``&amp;lt;`` must yield
    the literal ``&lt;``, never ``<``), and an unknown reference that
    must pass through untouched next to an ``&nbsp;`` that must become
    U+00A0. The oracle appends the PRE-COMPUTED clean twin of each
    arm's decoration (module constants run through ``html.unescape``
    once), so Spark's distributed decode is value-checked against the
    stdlib's reference implementation. The fast JVM mode is
    equality-tested against the full mode on this subset in the unit
    suite."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    arm = F.col("doc_id") % 5
    # the oracle appends CLEAN twins to the raw base text, which is
    # only equivalent when the base text itself contains no character
    # references — guarantee it on BOTH sides by stripping '&' (the
    # current testdata is '&'-free, but a future fixture with a stray
    # '&copy' in prose would otherwise hash-fail confusingly; r11
    # second-review finding)
    base = F.replace(
        F.coalesce(F.col("text"), F.lit("")), F.lit("&"), F.lit("")
    )
    raw = F.concat(
        base,
        F.when(arm == 0, F.lit(_ENT_RAW[0]))
        .when(arm == 1, F.lit(_ENT_RAW[1]))
        .when(arm == 2, F.lit(_ENT_RAW[2]))
        .when(arm == 3, F.lit(_ENT_RAW[3]))
        .otherwise(F.lit(_ENT_RAW[4])),
    )
    clean = web.unescape_html(raw, mode="full")
    return docs.select(
        "doc_id",
        clean.alias("text_clean"),
        F.length(clean).cast("long").alias("n_chars_clean"),
    )


def _make_sql_html_unescape() -> str:
    lit = _sql_lit

    cases = "\n".join(
        f"               WHEN {i} THEN {lit(c)}"
        for i, c in enumerate(_ENT_CLEAN[:4])
    )
    return f"""
WITH b AS (
    SELECT doc_id,
           replace(coalesce(text, ''), '&', '') ||
           CASE doc_id % 5
{cases}
               ELSE {lit(_ENT_CLEAN[4])}
           END AS text_clean
    FROM documents
)
SELECT doc_id, text_clean,
       CAST(length(text_clean) AS BIGINT) AS n_chars_clean
FROM b
"""


SQL_HTML_UNESCAPE = _make_sql_html_unescape()


# --------------------------------------------------------------------------
# r11: robots.txt crawl filtering
# --------------------------------------------------------------------------

def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl-politeness filter (``web.parse_robots`` +
    ``robots_rules_frame`` + ``robots_allowed``): a crawl pipeline must
    honor per-host robots rules before anything else touches the URL
    frontier. Hosts are classed by site number (``site{N}`` % 3), each
    class carrying a robots.txt that exercises a distinct RFC 9309
    behavior under the FULL-octet-length specificity measure (r12: the
    rule's whole length, wildcards and ``$`` included — Google-parser
    parity; the r11 draft stripped them, see ``robots_like_pattern``):
    (0) prefix Disallow overridden by a longer Allow;
    (1) a ``goodbot``-specific block-all group that must NOT
    apply to ``*``, plus a wildcard+anchored ``Disallow: /p/*5$`` (spec
    6) outranked by the longer ``Allow: /p/*15$`` (spec 7); (2) the
    advice finding's exact shape — ``Allow: /p*`` vs ``Disallow: /p/``
    tie at 3 octets ONLY when wildcards count (the stripped measure
    scored 2 < 3 and blocked everything), resolved toward Allow, with
    an anchored ``Disallow: /p/9*$`` (spec 6) carving out /p/9-prefixed
    paths. Matching runs over the PATH only (query excluded). r13 adds
    the politeness surface: class 0 declares ``Crawl-delay: 1.5`` in
    the ``*`` group, class 1 declares it ONLY in the goodbot group (so
    the ``*`` crawl must see NULL — group selection on the hash), and
    class 2 declares an integer delay; ``crawl_delay`` rides the
    output. The oracle recomputes every decision independently from
    the class spec with SQL ``LIKE`` — a wrong group pick, wildcard
    translation, priority sort, specificity measure, tie-break, or
    delay-group leak flips values and hash-fails. Plan: rule parse on
    the distinct-TEXT side (r13 dedup — parse work bounded by distinct
    files), ONE broadcast join + higher-order array walk on the URL
    side — zero URL-side shuffles (audited)."""
    urls = (
        _docs_with_url(spark, sf_dir)
        .select("doc_id", "url")
        .withColumn("host", web.host_of("url"))
    )
    cls = F.regexp_extract(F.col("host"), r"site([0-9]+)", 1).cast("int") % 3
    txt = (
        F.when(cls == 0, F.lit(
            "User-agent: *\nCrawl-delay: 1.5\n"
            "Disallow: /p/\nAllow: /p/2\n"))
        .when(cls == 1, F.lit(
            "User-agent: goodbot\nDisallow: /\nCrawl-delay: 10\n\n"
            "User-agent: *\nDisallow: /p/*5$\nAllow: /p/*15$\n"))
        .otherwise(F.lit(
            "User-agent: *\nDisallow: /p/\nAllow: /p*\n"
            "Disallow: /p/9*$\nCrawl-delay: 3\n"))
    )
    robots = urls.select("host").distinct().select(
        "host", txt.alias("robots_txt")
    )
    rules = web.robots_rules_frame(robots, with_politeness=True)
    return web.robots_allowed(
        urls, rules.select("host", "rules", "crawl_delay")
    ).select("doc_id", "host", "allowed", "crawl_delay")


SQL_ROBOTS_FILTER = f"""
WITH u AS (SELECT doc_id, {_URL_DUCK} AS url FROM documents),
h AS (
    SELECT doc_id, {_DUCK_HOST} AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path
    FROM u
),
c AS (
    SELECT doc_id, host, path,
           CAST(regexp_extract(host, 'site([0-9]+)', 1) AS INTEGER) % 3
               AS cls
    FROM h
)
SELECT doc_id, host,
       CASE cls
           WHEN 0 THEN path LIKE '/p/2%'
           WHEN 1 THEN CASE WHEN path LIKE '/p/%15' THEN TRUE
                            WHEN path LIKE '/p/%5' THEN FALSE
                            ELSE TRUE END
           ELSE NOT (path LIKE '/p/9%')
       END AS allowed,
       CASE cls
           WHEN 0 THEN 1.5
           WHEN 1 THEN CAST(NULL AS DOUBLE)
           ELSE 3.0
       END AS crawl_delay
FROM c
"""


# --------------------------------------------------------------------------
# r11: WET conversion-record sink/source roundtrip
# --------------------------------------------------------------------------

def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET sidecar production shape (``warc.write_wet_shards`` /
    ``read_wet``): real crawl stacks ship extracted plain text as WARC
    *conversion* records next to the raw archive (Common Crawl's .wet
    files) — one ``text/plain`` UTF-8 record per page, ``WARC-Refers-
    To`` pointing at the source response. The gate runs the whole
    production chain: the ``html_extract`` fixture template →
    ``extract_text`` (comments/script/style/tags stripped, entities
    decoded, whitespace collapsed) → WET sink (one gzip member per
    record) → re-ingest → recover (doc_id, text, byte count, source
    pointer). The oracle replays the extraction relationally (the
    html_extract CTE chain) and rebuilds the refers-to pointer with
    DuckDB ``md5`` — the roundtrip must be the identity, so any
    conversion-record framing, UTF-8 payload, or refers-to linkage bug
    hash-fails. Scratch shards are removed before returning."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    html = _extract_fixture_html()
    uri = _warc_doc_uri()
    src = docs.select(
        uri.alias("target_uri"),
        web.extract_text(html).alias("wet_text"),
        F.concat(
            F.lit("<urn:uuid:"),
            F.md5(F.encode(uri, "UTF-8")),
            F.lit(">"),
        ).alias("source_id"),
    )
    out = tempfile.mkdtemp(prefix="wetrt_")
    try:
        warcx.write_wet_shards(
            src, out, text_col="wet_text", refers_to_col="source_id"
        )
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    back = warcx.read_wet(spark, out)
    res = back.select(
        _warc_doc_id(),
        "wet_text",
        F.octet_length("body").cast("long").alias("n_wet_bytes"),
        "refers_to",
    )
    return _materialize_and_clean(res, out)


def _make_sql_wet_roundtrip() -> str:
    return f"""
WITH plainq AS ( {SQL_HTML_EXTRACT} )
SELECT doc_id,
       plain AS wet_text,
       CAST(octet_length(encode(plain)) AS BIGINT) AS n_wet_bytes,
       '<urn:uuid:' || md5('https://site' || CAST(doc_id % 37 AS VARCHAR)
           || '.com/doc/' || CAST(doc_id AS VARCHAR)) || '>' AS refers_to
FROM plainq
"""


SQL_WET_ROUNDTRIP = _make_sql_wet_roundtrip()


# --------------------------------------------------------------------------
# r12: CDX capture index + SURT canonical keys
# --------------------------------------------------------------------------

#: the CDX gate's URL classes, engine-portable ({S} = STRING | VARCHAR):
#: (0) leading www. + multi-label public suffix; (1) MIXED case +
#: unsorted query params; (2) a NON-leading www label that must
#: survive; (3) plain host on a bare (no-envelope) record
_CDX_URL_EXPR = (
    "CASE doc_id % 4 "
    "WHEN 0 THEN 'https://www.site' || CAST(doc_id % 37 AS {S}) "
    "            || '.co.uk/doc/' || CAST(doc_id AS {S}) "
    "WHEN 1 THEN 'HTTPS://Site' || CAST(doc_id % 37 AS {S}) "
    "            || '.ORG/Doc/' || CAST(doc_id AS {S}) || '?b=2&a=1' "
    "WHEN 2 THEN 'https://cdn.www.site' || CAST(doc_id % 37 AS {S}) "
    "            || '.com/doc/' || CAST(doc_id AS {S}) "
    "ELSE 'https://site' || CAST(doc_id % 37 AS {S}) "
    "     || '.io/doc/' || CAST(doc_id AS {S}) END"
)


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture-index generation (``cdx.surt_key`` + ``cdx_index``):
    the lookup sidecar every web archive ships next to its WARC shards
    — SURT key, timestamp, and response metadata per capture, so "which
    capture holds URL X?" never opens a shard. Four URL classes per
    document (:data:`_CDX_URL_EXPR`): leading-``www.`` stripping under
    a multi-label suffix, case folding + query-param SORTING, a
    non-leading ``www`` label that must survive reversal, and a bare
    (envelope-less) record whose mime/status must be NULL while its
    digest/length still index the raw bytes. The pipeline is the real
    one: synthesize HTTP envelopes → WARC sink → re-ingest
    (``read_warc``) → ``cdx_index``. The oracle replays the SURT
    canonicalization generically (``string_split``/``list_reverse``/
    ``list_sort``) and the digest arithmetic (``sha256`` of the exact
    body construction) from ``documents`` — a wrong host reversal,
    www-strip, query sort, envelope split, or digest input hash-fails.
    ``filename`` is projected out here (shard names depend on the
    session's partition count, not on the data); the unit suite covers
    it. Scratch shards are removed before returning."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import cdx as cdxx
    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    txt = F.coalesce(F.col("text"), F.lit(""))
    html = F.concat(F.lit("<html>"), txt, F.lit("</html>"))
    env = F.concat(
        F.lit(
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n\r\n"
        ),
        html,
    )
    bare = F.concat(F.lit("<bare>"), txt, F.lit("</bare>"))
    arm = F.col("doc_id") % 4
    src = docs.select(
        F.expr(_CDX_URL_EXPR.format(S="STRING")).alias("target_uri"),
        F.encode(F.when(arm == 3, bare).otherwise(env), "UTF-8")
        .alias("payload"),
    )
    out = tempfile.mkdtemp(prefix="cdxidx_")
    try:
        warcx.write_warc_shards(src, out)
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    res = cdxx.cdx_index(warcx.read_warc(spark, out)).select(
        "urlkey", "ts", "url", "mime",
        F.col("status").cast("int").alias("status"),
        "digest", "length",
    )
    return _materialize_and_clean(res, out)


SQL_CDX_INDEX = f"""
WITH u AS (
    SELECT doc_id,
           coalesce(text, '') AS t,
           {_CDX_URL_EXPR.format(S="VARCHAR")} AS url
    FROM documents
),
parts AS (
    SELECT doc_id, t, url,
           regexp_replace(lower(url), '#.*$', '') AS lu,
           regexp_replace(
               regexp_replace(
                   regexp_extract(regexp_replace(lower(url), '#.*$', ''),
                                  '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
                   '\\.$', ''),
               '^www\\.', '') AS host
    FROM u
),
keys AS (
    SELECT doc_id, t, url,
           array_to_string(list_reverse(string_split(host, '.')), ',')
               || ')'
               || CASE WHEN regexp_extract(lu,
                      '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) = ''
                      THEN '/'
                      ELSE regexp_extract(lu,
                      '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) END
               || CASE WHEN regexp_extract(lu, '\\?(.*)$', 1) = ''
                      THEN ''
                      ELSE '?' || array_to_string(list_sort(
                          string_split(
                              regexp_extract(lu, '\\?(.*)$', 1), '&')),
                          '&') END
               AS urlkey,
           CASE WHEN doc_id % 4 = 3
                THEN '<bare>' || t || '</bare>'
                ELSE '<html>' || t || '</html>' END AS body
    FROM parts
)
SELECT urlkey,
       '20260101000000' AS ts,
       url,
       CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 'text/html' END AS mime,
       CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 200 END AS status,
       sha256(body) AS digest,
       CAST(octet_length(encode(body)) AS BIGINT) AS length
FROM keys
"""


# --------------------------------------------------------------------------
# r13: sitemap-tree materialization — the frontier recursion
# --------------------------------------------------------------------------

def q_sitemap_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-tree materialization (``web.expand_sitemaps``): the
    bounded recursion over fetched sitemap bodies that turns the
    robots-discovered seeds into the page frontier. Each document owns
    a seed ``<sitemapindex>`` listing a fetched child (two page
    entries) and a NEVER-fetched child (→ ``missing`` — the fetch
    list); on ids ≡ 0 (mod 3) the child points back at its own SEED —
    a cycle the visited array must cut silently; on ids ≡ 1 (mod 4) a
    grandchild urlset adds a depth-2 page; on ids ≡ 2 (mod 4) the
    grandchild instead points PAST ``max_depth`` → ``truncated``. The
    oracle restates the whole walk arithmetically per arm. Plan: the
    redirect-walk shape — ``max_depth`` equi-joins of the shrinking
    pointer frontier + the map-only sitemap parse per round."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    base = F.concat(F.lit("https://site"), n, F.lit(".com/sm/"), did)

    def u(name):
        return F.concat(base, F.lit(f"/{name}.xml"))

    def ptr(loc):
        return F.concat(F.lit("<sitemap><loc>"), loc,
                        F.lit("</loc></sitemap>"))

    def page(k):
        return F.concat(F.lit("<url><loc>https://site"), n,
                        F.lit(".com/pg/"), did, F.lit(f"/{k}"),
                        F.lit("</loc></url>"))

    seed_xml = F.concat(F.lit("<sitemapindex>"), ptr(u("c1")),
                        ptr(u("c2")), F.lit("</sitemapindex>"))
    c1_xml = F.concat(
        F.lit("<urlset>"), page(1), page(2),
        F.when(F.col("doc_id") % 3 == 0, ptr(u("seed")))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 1, ptr(u("c3")))
        .when(F.col("doc_id") % 4 == 2, ptr(u("c3")))
        .otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    c3_xml = (
        F.when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit("<urlset>"), page("deep"),
                        F.lit("</urlset>")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("<urlset>"), ptr(u("c4")),
                       F.lit("</urlset>")))
    )
    entries = F.array(
        F.struct(u("seed").alias("u"), seed_xml.alias("x")),
        F.struct(u("c1").alias("u"), c1_xml.alias("x")),
        F.struct(u("c3").alias("u"), c3_xml.alias("x")),
    )
    fetched = (
        docs.select(F.explode(entries).alias("e"))
        .where(F.col("e.x").isNotNull())
        .select(F.col("e.u").alias("url"), F.col("e.x").alias("sitemap_xml"))
    )
    roots = docs.select(u("seed").alias("url"))
    out = web.expand_sitemaps(fetched, max_depth=2, roots=roots)
    return out.select(
        F.regexp_extract(F.col("root_url"), r"/sm/([0-9]+)/", 1)
        .cast("long").alias("doc_id"),
        "depth", "status", "loc", "source_url",
    )


SQL_SITEMAP_TREE = """
WITH b AS (
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) AS did,
           CAST(doc_id % 37 AS VARCHAR) AS n,
           'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com'
               AS h
    FROM documents
),
e AS (
    SELECT doc_id, did, h,
           h || '/sm/' || did AS smb,
           h || '/pg/' || did AS pgb
    FROM b
)
SELECT doc_id, 1 AS depth, 'ok' AS status,
       pgb || '/1' AS loc, smb || '/c1.xml' AS source_url
FROM e
UNION ALL
SELECT doc_id, 1, 'ok', pgb || '/2', smb || '/c1.xml' FROM e
UNION ALL
SELECT doc_id, 1, 'missing', smb || '/c2.xml', NULL FROM e
UNION ALL
SELECT doc_id, 2, 'ok', pgb || '/deep', smb || '/c3.xml'
FROM e WHERE doc_id % 4 = 1
UNION ALL
SELECT doc_id, 3, 'truncated', smb || '/c4.xml', smb || '/c3.xml'
FROM e WHERE doc_id % 4 = 2
"""


# --------------------------------------------------------------------------
# r13: page metadata (title + meta robots) and the WAT sidecar
# --------------------------------------------------------------------------

def q_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page metadata extraction (``web.page_title`` +
    ``web.meta_robots``): every page's own text rides into the
    ``<title>`` with a literal ``&amp;`` that must decode and
    whitespace that must collapse; the robots meta exercises three
    arms — (0) quoted two-directive list with stray spaces and a
    trailing comma; (1) ``content`` BEFORE ``name`` with a
    case-variant ``ROBOTS`` (attribute order and case must not
    matter); (2) no meta at all → NULL. The oracle restates the
    decode/collapse/tokenize arithmetic. Plan: map-only projections,
    zero shuffles, zero Python (plan-audited in the unit suite)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    arm = F.col("doc_id") % 3
    meta = (
        F.when(arm == 0, F.lit(
            '<meta name="robots" content=" NOINDEX, nofollow ,">'))
        .when(arm == 1, F.concat(
            F.lit('<meta content=" all " name=ROBOTS>')))
        .otherwise(F.lit("<meta name=viewport content=x>"))
    )
    html = F.concat(
        F.lit("<html><head><title>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" &amp; D"), did,
        F.lit("</title>"), meta,
        F.lit("</head><body><p>body</p></body></html>"),
    )
    src = docs.select("doc_id", html.alias("html"))
    return src.select(
        "doc_id",
        web.page_title("html").alias("title"),
        F.array_join(web.meta_robots("html"), ",").alias("robots_csv"),
    )


SQL_PAGE_META = """
SELECT doc_id,
       trim(regexp_replace(coalesce(text, '') || ' & D'
                           || CAST(doc_id AS VARCHAR),
                           '[ \t\r\n]+', ' ', 'g')) AS title,
       CASE doc_id % 3
           WHEN 0 THEN 'noindex,nofollow'
           WHEN 1 THEN 'all'
       END AS robots_csv
FROM documents
"""


def q_wat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT sidecar production shape (``warc.write_wat_shards`` /
    ``read_wat``): the third Common Crawl format — per-capture JSON
    metadata as WARC *metadata* records. The gate runs the whole
    chain: synthesize pages (title, one root-relative + one
    path-relative link, a robots meta on even ids) → WAT sink (JSON
    payload per record, one gzip member each) → re-ingest → typed
    fields back out. Status cycles 200/301/404 and the Content-Type
    arm includes an untyped capture whose ``mime`` must be NULL, not
    ``''``. The oracle rebuilds every field arithmetically — JSON
    framing, to_json NULL omission, link resolution, or from_json
    schema drift all hash-fail. Scratch shards are removed before
    returning."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    url = F.concat(F.lit("https://site"), n, F.lit(".com/d/p"), did,
                   F.lit(".html"))
    meta = F.when(
        F.col("doc_id") % 2 == 0,
        F.lit('<meta name=robots content="noindex">'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>W"), did, F.lit("</title>"), meta,
        F.lit('</head><a href="/l/'), did, F.lit('">a</a>'),
        F.lit('<a href="r'), did, F.lit('.html">b</a></html>'),
    )
    status = (F.col("doc_id") % 3 * 100 + 200).cast("int")
    ctype = F.when(F.col("doc_id") % 4 == 3, F.lit(None)).otherwise(
        F.lit("text/HTML; charset=utf-8"))
    src = docs.select(
        url.alias("target_uri"),
        status.alias("http_status"),
        ctype.alias("http_content_type"),
        html.alias("html"),
    )
    out = tempfile.mkdtemp(prefix="watrt_")
    try:
        warcx.write_wat_shards(src, out, html_col="html")
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    back = warcx.read_wat(spark, out)
    res = back.select(
        F.regexp_extract(F.col("wat_url"), r"/p([0-9]+)\.html$", 1)
        .cast("long").alias("doc_id"),
        "wat_status", "wat_mime", "wat_title", "wat_n_links",
        F.array_join(F.col("wat_links"), " ").alias("links_joined"),
        F.array_join(F.col("wat_meta_robots"), ",").alias("robots_csv"),
    )
    return _materialize_and_clean(res, out)


SQL_WAT_ROUNDTRIP = """
SELECT doc_id,
       CAST(doc_id % 3 * 100 + 200 AS INTEGER) AS wat_status,
       CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 'text/html' END
           AS wat_mime,
       'W' || CAST(doc_id AS VARCHAR) AS wat_title,
       2 AS wat_n_links,
       'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com/l/'
           || CAST(doc_id AS VARCHAR) || ' '
           || 'https://site' || CAST(doc_id % 37 AS VARCHAR)
           || '.com/d/r' || CAST(doc_id AS VARCHAR) || '.html'
           AS links_joined,
       CASE WHEN doc_id % 2 = 0 THEN 'noindex' END AS robots_csv
FROM documents
"""


# --------------------------------------------------------------------------
# r13: politeness-aware frontier scheduling
# --------------------------------------------------------------------------

def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier scheduling (``web.frontier_schedule``): the step
    between robots filtering and fetching — same-host requests spaced
    by the host's ``Crawl-delay``. Hosts reuse the robots_filter
    classes (delay 1.5 s / undeclared → 1.0 s default / 3 s), URLs
    rank per host by ``doc_id``, and the integer-millisecond offsets
    (``fetch_seq × delay_ms``) are on the hash — a wrong group pick,
    default application, rounding, or window order flips values. The
    oracle replays the window arithmetic with ``row_number()``. Plan:
    ONE broadcast rules join + ONE host-keyed window shuffle (the
    operator's only exchange; mega-host skew is pre-capped by
    ``cap_per_domain``, see the operator docstring)."""
    urls = (
        _docs_with_url(spark, sf_dir)
        .select("doc_id", "url")
        .withColumn("host", web.host_of("url"))
    )
    cls = F.regexp_extract(F.col("host"), r"site([0-9]+)", 1).cast("int") % 3
    txt = (
        F.when(cls == 0, F.lit(
            "User-agent: *\nCrawl-delay: 1.5\nDisallow: /p/\n"))
        .when(cls == 1, F.lit(
            "User-agent: *\nDisallow: /p/5\n"))  # no delay → default
        .otherwise(F.lit(
            "User-agent: *\nDisallow: /p/\nCrawl-delay: 3\n"))
    )
    robots = urls.select("host").distinct().select(
        "host", txt.alias("robots_txt")
    )
    rules = web.robots_rules_frame(robots, with_politeness=True)
    return web.frontier_schedule(
        urls, rules, order_by=["doc_id"]
    ).select("doc_id", "host", "fetch_seq", "delay_ms", "fetch_offset_ms")


SQL_FRONTIER_SCHEDULE = f"""
WITH u AS (SELECT doc_id, {_URL_DUCK} AS url FROM documents),
h AS (SELECT doc_id, {_DUCK_HOST} AS host FROM u),
c AS (
    SELECT doc_id, host,
           CAST(regexp_extract(host, 'site([0-9]+)', 1) AS INTEGER) % 3
               AS cls,
           CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id)
                - 1 AS BIGINT) AS fetch_seq
    FROM h
)
SELECT doc_id, host, fetch_seq,
       CAST(CASE cls WHEN 0 THEN 1500 WHEN 1 THEN 1000 ELSE 3000 END
            AS BIGINT) AS delay_ms,
       CAST(fetch_seq * CASE cls WHEN 0 THEN 1500 WHEN 1 THEN 1000
                        ELSE 3000 END AS BIGINT) AS fetch_offset_ms
FROM c
"""


# --------------------------------------------------------------------------
# r13: host link-graph rollup — the web-graph consumer
# --------------------------------------------------------------------------

def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host link-graph rollup (``web.host_link_graph`` over
    ``extract_links``): the aggregation crawl rankings consume — one
    row per (src_host, dst_host) with total and FOLLOWED edge counts.
    Each document's page links to (a) a clean cross-host target, (b) a
    ``rel=nofollow`` target that must count in ``n_links`` but NOT in
    ``n_followed`` (the spam-edge filter — token-exact: a
    ``rel=nofollowme`` decoy on arm-even docs must still follow), and
    (c) itself (dropped — self edges carry no ranking signal). The
    oracle rebuilds the per-host-pair arithmetic from the doc_id → host
    mapping. Plan: map-only extraction + ONE map-side-combined shuffle
    carrying host pairs (the operator's only exchange)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    decoy = F.when(
        F.col("doc_id") % 2 == 0, F.lit(' rel="nofollowme"')
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<a href="https://other'), n, F.lit('.org/x')
        , F.lit('"'), decoy, F.lit(">a</a>"),
        F.lit('<a href="https://cdn'), n,
        F.lit('.net/y" rel="ugc nofollow">b</a>'),
        F.lit('<a href="https://www.site'), n, F.lit('.com/self/'),
        did, F.lit('">c</a><p>'),
        F.coalesce(F.col("text"), F.lit("")), F.lit("</p>"),
    )
    src = docs.select(
        "doc_id",
        F.concat(F.lit("https://www.site"), n, F.lit(".com/p"), did,
                 F.lit(".html")).alias("url"),
        html.alias("html"),
    )
    links = web.extract_links(src, with_anchor_text=False)
    return web.host_link_graph(links).select(
        "src_host", "dst_host", "n_links", "n_followed"
    )


SQL_HOST_GRAPH = """
WITH b AS (
    SELECT CAST(doc_id % 37 AS VARCHAR) AS n,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1
)
SELECT 'www.site' || n || '.com' AS src_host,
       'other' || n || '.org' AS dst_host,
       c AS n_links, c AS n_followed
FROM b
UNION ALL
SELECT 'www.site' || n || '.com', 'cdn' || n || '.net', c,
       CAST(0 AS BIGINT)
FROM b
"""


# --------------------------------------------------------------------------
# r13: CDX lookup — closest capture at/before a timestamp
# --------------------------------------------------------------------------

def q_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX lookup (``cdx.cdx_closest``): the consumer the capture index
    exists for — "which capture of URL X is nearest time T?". Each
    document contributes THREE captures of one URL (ts varying by a
    per-doc seconds offset so the arithmetic is on real variable
    digits) and ONE probe whose arm exercises a distinct lookup case:
    (0) exact-timestamp hit; (1) a probe EXACTLY equidistant between
    two captures — the tie must break to the EARLIER one; (2) before
    every capture (closest → first; before-mode → NULL); (3) after
    every capture; (4) a URL never captured → NULL capture columns.
    Probes differ from the stored URL by case, ``www.``, and query-
    param order — the SURT canonicalization must still match them.
    Both modes run and union (``mode`` column). The oracle restates
    winner arithmetic per arm/mode.

    r15: the gate now runs the full ON-DISK consumer chain the library
    defaults to — ``write_sorted_cdx`` (range-partitioned scratch
    index) → ``write_zipnum_index`` (file-range sidecar) →
    ``load_cdx`` (which routes through ``load_cdx_pruned`` because the
    sidecar exists) → ``cdx_closest`` — so ZipNum pruning sits in the
    oracle-checked path, not only in the unit suite (which separately
    asserts the pruned scan lists fewer files). Plan: the lookup is
    still ONE broadcast-hash join + min_by partial aggregation; the
    pruned reader's file intersection is driver-side over the KB-sized
    sidecar. Scratch is removed before returning."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import cdx as cdxx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    ss = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")
    curl = F.concat(F.lit("https://www.site"), n, F.lit(".com/p/"),
                    did, F.lit("?b=2&a=1"))

    def tsx(pfx: str):
        return F.concat(F.lit(pfx), ss)

    caps = F.array(
        F.struct(tsx("202501010000").alias("t"), F.lit(1).alias("k")),
        F.struct(tsx("202506010000").alias("t"), F.lit(2).alias("k")),
        F.struct(tsx("202601010000").alias("t"), F.lit(3).alias("k")),
    )
    index = docs.select(
        "doc_id", curl.alias("curl"), F.explode(caps).alias("c")
    ).select(
        cdxx.surt_key("curl").alias("urlkey"),
        F.col("c.t").alias("ts"),
        F.col("curl").alias("url"),
        F.concat(F.lit("d"), F.col("c.k").cast("string"), F.lit("-"),
                 F.col("doc_id").cast("string")).alias("digest"),
        (F.col("doc_id") + F.col("c.k")).cast("long").alias("length"),
    )
    arm = F.col("doc_id") % 5
    probe_url = F.when(arm == 4, F.concat(
        F.lit("https://nowhere"), n, F.lit(".example/m/"), did
    )).otherwise(F.concat(
        F.lit("https://SITE"), n, F.lit(".com/p/"), did,
        F.lit("?a=1&b=2")
    ))
    probe_ts = (
        F.when(arm == 0, tsx("202506010000"))
        # exactly (ts1+ts2)/2 in digit space — the tie arm
        .when(arm == 1, tsx("202503510000"))
        .when(arm == 2, F.lit("20240101000000"))
        .when(arm == 3, F.lit("20270101000000"))
        .otherwise(tsx("202501010000"))
    )
    probes = docs.select(
        "doc_id", probe_url.alias("url"), probe_ts.alias("ts")
    )
    scratch = tempfile.mkdtemp(prefix="cdxlk_")
    try:
        cdxx.write_sorted_cdx(index, scratch, n_files=4)
        cdxx.write_zipnum_index(spark, scratch)
    except BaseException:
        shutil.rmtree(scratch, ignore_errors=True)
        raise
    loaded = cdxx.load_cdx(spark, scratch, probes)
    # both modes from ONE join + ONE aggregation (r16 opt — the
    # separate closest/before calls paid the probes×index join, the
    # winner exchange, and the plan analysis twice for the same batch;
    # the union helper is row-for-row the same result)
    res = cdxx._cdx_closest_union_modes(loaded, probes).select(
        "doc_id", "mode", "urlkey", "cdx_ts", "digest", "length"
    )
    return _materialize_and_clean(res, scratch)


SQL_CDX_LOOKUP = """
WITH b AS (
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) AS did,
           CAST(doc_id % 37 AS VARCHAR) AS n,
           doc_id % 5 AS arm,
           lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS ss
    FROM documents
),
e AS (
    SELECT doc_id, did, n, arm, ss,
           'com,site' || n || ')/p/' || did || '?a=1&b=2' AS mkey,
           'example,nowhere' || n || ')/m/' || did AS misskey,
           CASE arm WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 1
                    WHEN 3 THEN 3 ELSE 0 END AS ck,
           CASE arm WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 0
                    WHEN 3 THEN 3 ELSE 0 END AS bk
    FROM b
)
SELECT doc_id, 'closest' AS mode,
       CASE WHEN arm = 4 THEN misskey ELSE mkey END AS urlkey,
       CASE ck WHEN 1 THEN '202501010000' || ss
               WHEN 2 THEN '202506010000' || ss
               WHEN 3 THEN '202601010000' || ss END AS cdx_ts,
       CASE WHEN ck > 0
            THEN 'd' || CAST(ck AS VARCHAR) || '-' || did END AS digest,
       CASE WHEN ck > 0 THEN doc_id + ck END AS length
FROM e
UNION ALL
SELECT doc_id, 'before',
       CASE WHEN arm = 4 THEN misskey ELSE mkey END,
       CASE bk WHEN 1 THEN '202501010000' || ss
               WHEN 2 THEN '202506010000' || ss
               WHEN 3 THEN '202601010000' || ss END,
       CASE WHEN bk > 0
            THEN 'd' || CAST(bk AS VARCHAR) || '-' || did END,
       CASE WHEN bk > 0 THEN doc_id + bk END
FROM e
"""


# --------------------------------------------------------------------------
# r12: MIME sniffing from magic bytes
# --------------------------------------------------------------------------

def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing (``sniff.sniffed_mime``): a crawl cannot
    route on the declared ``Content-Type`` (servers lie), so the
    pipeline's text/image/binary fork keys on WHATWG-style magic-byte
    sniffing. Sixteen payload classes per document (r13: widened from
    8 so every sniff branch is on the oracle hash — r12 verdict
    finding), each wrapping the document's own text so prefix handling
    is tested against real variable bytes: (0) ``<!DOCTYPE html>``;
    (1) leading whitespace + ``<HTML>`` (case + whitespace tolerance);
    (2) PNG signature; (3) JPEG signature; (4) ``%PDF-``; (5) a
    ``RIFF....WAVE`` container (non-contiguous check); (6) plain
    prose → ``text/plain`` (no magic, no binary bytes); (7)
    NUL-prefixed bytes → ``application/octet-stream`` (the binary-
    data-byte scan); (8) gzip ``1F 8B 08``; (9) zip ``PK\\x03\\x04``;
    (10) ``OggS``; (11) ``fLaC``; (12) ``ID3``; (13) EBML →
    ``video/webm``; (14) a minimal 12-byte ``ftyp`` box with major
    brand ``mp42`` (the r13 WHATWG brand check must accept it);
    (15) ``<?xml`` declaration → ``text/xml``. The oracle states each
    class's expected type independently — a wrong signature table
    entry, tag-terminator rule, RIFF box read, ftyp brand/box-size
    rule, or binary-byte class flips rows and hash-fails. Plan: ONE
    map-only projection, no UDF, no shuffle (plan-audited in the unit
    suite)."""
    from dataproc_spark.extensions.sniff import sniffed_mime

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    txt = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    arm = F.col("doc_id") % 16
    payload = (
        F.when(arm == 0, F.concat(
            F.encode(F.lit("<!DOCTYPE html><p>"), "UTF-8"), txt))
        .when(arm == 1, F.concat(
            F.encode(F.lit("  \n<HTML><body>"), "UTF-8"), txt))
        .when(arm == 2, F.concat(F.lit(b"\x89PNG\r\n\x1a\n"), txt))
        .when(arm == 3, F.concat(F.lit(b"\xff\xd8\xff\xe0"), txt))
        .when(arm == 4, F.concat(
            F.encode(F.lit("%PDF-1.4 "), "UTF-8"), txt))
        .when(arm == 5, F.concat(
            F.lit(b"RIFF\x10\x00\x00\x00WAVEfmt "), txt))
        .when(arm == 6, F.concat(
            F.encode(F.lit("note: "), "UTF-8"), txt))
        .when(arm == 7, F.concat(F.lit(b"\x00" * 8), txt))
        .when(arm == 8, F.concat(F.lit(b"\x1f\x8b\x08\x00"), txt))
        .when(arm == 9, F.concat(F.lit(b"PK\x03\x04\x14\x00"), txt))
        .when(arm == 10, F.concat(F.lit(b"OggS\x00\x02"), txt))
        .when(arm == 11, F.concat(F.lit(b"fLaC\x00\x00"), txt))
        .when(arm == 12, F.concat(F.lit(b"ID3\x04\x00"), txt))
        .when(arm == 13, F.concat(F.lit(b"\x1a\x45\xdf\xa3"), txt))
        # box-size 12 = the header itself, so ANY text suffix keeps
        # octet_length >= box-size; major brand 'mp42' starts 'mp4'
        .when(arm == 14, F.concat(
            F.lit(b"\x00\x00\x00\x0cftypmp42"), txt))
        .otherwise(F.concat(
            F.encode(F.lit('<?xml version="1.0"?><r>'), "UTF-8"), txt))
    )
    return docs.select(
        "doc_id",
        sniffed_mime(payload).alias("mime"),
    )


SQL_MIME_SNIFF = """
SELECT doc_id,
       CASE doc_id % 16
           WHEN 0 THEN 'text/html'
           WHEN 1 THEN 'text/html'
           WHEN 2 THEN 'image/png'
           WHEN 3 THEN 'image/jpeg'
           WHEN 4 THEN 'application/pdf'
           WHEN 5 THEN 'audio/wave'
           WHEN 6 THEN 'text/plain'
           WHEN 7 THEN 'application/octet-stream'
           WHEN 8 THEN 'application/gzip'
           WHEN 9 THEN 'application/zip'
           WHEN 10 THEN 'application/ogg'
           WHEN 11 THEN 'audio/flac'
           WHEN 12 THEN 'audio/mpeg'
           WHEN 13 THEN 'video/webm'
           WHEN 14 THEN 'video/mp4'
           ELSE 'text/xml'
       END AS mime
FROM documents
"""


# --------------------------------------------------------------------------
# r13: HTTP redirect-chain resolution — the capture-graph walk
# --------------------------------------------------------------------------

def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (``web.resolve_redirects``): every
    archive consumer wants a capture's FINAL URL, so the operator
    walks 3xx Location chains across the capture set. Six arms per
    document, each synthesizing the capture rows its chain needs:
    (0) a direct 200; (1) a 301 with an ABSOLUTE Location to a
    captured 200; (2) a 302 with a RELATIVE ``../`` Location that
    must RFC 3986-resolve against the capture URL; (3) a 3-edge
    301→307→308 chain run at ``max_hops=2`` — the head truncates at
    the furthest confirmed URL while mid-chain members resolve fully;
    (4) a 2-cycle → ``loop`` with NULL final; (5) a target never
    captured → ``external``. Every capture in every chain is also its
    own source row (hop arithmetic for each suffix is on the hash).
    The oracle restates the full bounded walk arithmetically per
    arm/role. Plan: dedup window + ``max_hops`` equi-joins of the
    shrinking walking set against a 3-column node table — bodies
    never enter; see the operator docstring for the 100 TB posture."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    h = F.concat(F.lit("https://site"), n, F.lit(".com"))
    arm = F.col("doc_id") % 6

    def u(p):
        return F.concat(h, F.lit(p), did)

    def capt(url, st, loc=None):
        return F.struct(
            url.alias("u"),
            F.lit(st).cast("int").alias("s"),
            (loc if loc is not None
             else F.lit(None).cast("string")).alias("l"),
        )

    caps = (
        F.when(arm == 0, F.array(capt(u("/ok/"), 200)))
        .when(arm == 1, F.array(
            capt(u("/a/"), 301, u("/t1/")), capt(u("/t1/"), 200)))
        .when(arm == 2, F.array(
            capt(u("/b/dir/"), 302, F.concat(F.lit("../f2/"), did)),
            capt(u("/b/f2/"), 200)))
        .when(arm == 3, F.array(
            capt(u("/c1/"), 301, u("/c2/")),
            capt(u("/c2/"), 307, u("/c3/")),
            capt(u("/c3/"), 308, u("/c4/")),
            capt(u("/c4/"), 200)))
        .when(arm == 4, F.array(
            capt(u("/l1/"), 301, u("/l2/")),
            capt(u("/l2/"), 302, u("/l1/"))))
        .otherwise(F.array(capt(
            u("/x/"), 301,
            F.concat(F.lit("https://external"), n, F.lit(".example/g"),
                     did))))
    )
    src = docs.select(F.explode(caps).alias("c")).select(
        F.col("c.u").alias("target_uri"),
        F.col("c.s").alias("http_status"),
        F.when(
            F.col("c.l").isNotNull(),
            F.map_from_arrays(F.array(F.lit("location")),
                              F.array(F.col("c.l"))),
        ).alias("http_headers"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
    )
    return web.resolve_redirects(src, max_hops=2).select(
        "source_url", "final_url", "n_hops", "resolution"
    )


SQL_REDIRECT_RESOLVE = """
WITH b AS (
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) AS did,
           CAST(doc_id % 37 AS VARCHAR) AS n,
           doc_id % 6 AS arm,
           'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com' AS h
    FROM documents
)
SELECT h || '/ok/' || did AS source_url,
       h || '/ok/' || did AS final_url,
       0 AS n_hops, 'ok' AS resolution
FROM b WHERE arm = 0
UNION ALL
SELECT h || '/a/' || did, h || '/t1/' || did, 1, 'ok' FROM b WHERE arm = 1
UNION ALL
SELECT h || '/t1/' || did, h || '/t1/' || did, 0, 'ok' FROM b WHERE arm = 1
UNION ALL
SELECT h || '/b/dir/' || did, h || '/b/f2/' || did, 1, 'ok'
FROM b WHERE arm = 2
UNION ALL
SELECT h || '/b/f2/' || did, h || '/b/f2/' || did, 0, 'ok'
FROM b WHERE arm = 2
UNION ALL
SELECT h || '/c1/' || did, h || '/c3/' || did, 2, 'truncated'
FROM b WHERE arm = 3
UNION ALL
SELECT h || '/c2/' || did, h || '/c4/' || did, 2, 'ok' FROM b WHERE arm = 3
UNION ALL
SELECT h || '/c3/' || did, h || '/c4/' || did, 1, 'ok' FROM b WHERE arm = 3
UNION ALL
SELECT h || '/c4/' || did, h || '/c4/' || did, 0, 'ok' FROM b WHERE arm = 3
UNION ALL
SELECT h || '/l1/' || did, NULL, 1, 'loop' FROM b WHERE arm = 4
UNION ALL
SELECT h || '/l2/' || did, NULL, 1, 'loop' FROM b WHERE arm = 4
UNION ALL
SELECT h || '/x/' || did,
       'https://external' || n || '.example/g' || did, 1, 'external'
FROM b WHERE arm = 5
"""


# --------------------------------------------------------------------------
# r12: sitemap parsing — URL-frontier seeding
# --------------------------------------------------------------------------

def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing (``web.sitemap_entries``): a crawl frontier
    seeds from sitemaps.org XML — ``<urlset>`` pages and
    ``<sitemapindex>`` pointers. Each document synthesizes one sitemap
    exercising the protocol surface: a full ``<url>`` entry whose
    ``<loc>`` carries an entity-escaped ``&amp;`` (the protocol
    REQUIRES escaping; the parser must unescape), a ``changefreq``
    present only on even ids, a ``<priority>`` that must cast to
    double, a minimal second entry (every child but ``<loc>`` NULL),
    and on ids ≡ 0 (mod 3) a ``<sitemap>`` index pointer
    (``kind='sitemap'``). The oracle rebuilds every row arithmetically
    (UNION ALL of the three entry shapes) — a wrong block split, child
    extraction, entity unescape, missing-tag NULL, cast, or position
    hash-fails. Plan: map-only projection + posexplode, no shuffle."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n'
              '  <url>\n    <loc>https://site'),
        n, F.lit(".com/doc/"), did, F.lit("?a=1&amp;b=2</loc>\n"),
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("    <changefreq>weekly</changefreq>\n"))
        .otherwise(F.lit("")),
        F.lit("    <lastmod>2026-01-0"),
        ((F.col("doc_id") % 9) + 1).cast("string"),
        F.lit("</lastmod>\n    <priority>0."),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("</priority>\n  </url>\n  <url><loc>https://site"),
        n, F.lit(".com/extra/"), did, F.lit("</loc></url>\n"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("  <sitemap>\n    <loc>https://site"), n,
                     F.lit(".com/sitemap-"), did,
                     F.lit(".xml</loc>\n  </sitemap>\n")),
        ).otherwise(F.lit("")),
        F.lit("</urlset>\n"),
    )
    src = docs.select("doc_id", xml.alias("sitemap_xml"))
    return web.sitemap_entries(src).select(
        "doc_id", "pos", "kind", "loc", "lastmod", "changefreq",
        "priority",
    )


SQL_SITEMAP_PARSE = """
SELECT doc_id, 0 AS pos, 'url' AS kind,
       'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com/doc/'
           || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS loc,
       '2026-01-0' || CAST((doc_id % 9) + 1 AS VARCHAR) AS lastmod,
       CASE WHEN doc_id % 2 = 0 THEN 'weekly' END AS changefreq,
       CAST('0.' || CAST(doc_id % 10 AS VARCHAR) AS DOUBLE) AS priority
FROM documents
UNION ALL
SELECT doc_id, 1 AS pos, 'url' AS kind,
       'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com/extra/'
           || CAST(doc_id AS VARCHAR) AS loc,
       NULL AS lastmod, NULL AS changefreq,
       CAST(NULL AS DOUBLE) AS priority
FROM documents
UNION ALL
SELECT doc_id, 2 AS pos, 'sitemap' AS kind,
       'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com/sitemap-'
           || CAST(doc_id AS VARCHAR) || '.xml' AS loc,
       NULL AS lastmod, NULL AS changefreq,
       CAST(NULL AS DOUBLE) AS priority
FROM documents
WHERE doc_id % 3 = 0
"""


# --------------------------------------------------------------------------
# r12: outlink extraction + RFC 3986 resolution — the web-graph edge list
# --------------------------------------------------------------------------

def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction (``web.extract_links`` / ``resolve_url``):
    the web-graph edge list under every crawl-scale ranking. Each
    document renders an HTML page whose FIRST link exercises one
    RFC 3986 reference form or ``<base href>`` interaction (r13:
    widened from 6 to 9 arms — r12 verdict items 2/4): (0) absolute;
    (1) protocol-relative; (2) root-relative with query+fragment;
    (3) dot-segment relative; (4) query-only, with a multi-token
    ``rel='ugc sponsored'`` BEFORE the href; (5) trailing-slash
    relative; (6) an ABSOLUTE ``<base href>`` that relative links —
    and the second link's root-relative path — must resolve against;
    (7) a RELATIVE ``<base href=/base/>`` that itself resolves
    against the page URL first; (8) a base tag that absolute links
    must IGNORE. The second link is a constant root-relative edge
    carrying ``rel=nofollow`` (the spam-edge filter column link-graph
    pipelines key on). Extraction order, attribute parsing, rel
    capture, fragment dropping, base-tag scoping, and the exact
    ``remove_dot_segments`` fold are all on the hash; the oracle
    rebuilds every resolved URL arithmetically per arm. Plan:
    regexp_extract_all + posexplode + the resolve expression —
    map-only, zero shuffles (plan-audited in the unit suite)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    arm = F.col("doc_id") % 9
    ref = (
        F.when(arm == 0, F.concat(F.lit("https://other"), n, F.lit(".org/x")))
        .when(arm == 1, F.concat(F.lit("//cdn"), n, F.lit(".net/y")))
        .when(arm == 2, F.concat(F.lit("/r/"), did, F.lit("?z=1#f")))
        .when(arm == 3, F.concat(F.lit("../up/./c"), did, F.lit(".html")))
        .when(arm == 4, F.concat(F.lit("?page="), did))
        .when(arm == 5, F.concat(F.lit("sub/"), did, F.lit("/")))
        .when(arm == 6, F.concat(F.lit("f"), did, F.lit(".css")))
        .when(arm == 7, F.concat(F.lit("g"), did, F.lit(".js")))
        .otherwise(F.concat(F.lit("https://keep"), n, F.lit(".org/v"), did))
    )
    base_tag = (
        F.when(arm == 6, F.concat(
            F.lit('<base href="https://assets'), n,
            F.lit('.example/lib/">')))
        .when(arm == 7, F.lit("<base href=/base/>"))
        .when(arm == 8, F.concat(
            F.lit("<base href='https://ignored"), n, F.lit(".example/'>")))
        .otherwise(F.lit(""))
    )
    # anchor-text arms on an INDEPENDENT modulo (r14 — r13 verdict
    # item 1): entity decode, nested inline tags, image-only (NULL),
    # dangling anchor (no </a> before the next anchor opens → NULL)
    tarm = F.col("doc_id") % 4
    inner = (
        F.when(tarm == 0, F.lit("first &amp; best"))
        .when(tarm == 1, F.lit("x<i>em</i>z"))
        .when(tarm == 2, F.lit('<img src="i.jpg">'))
        .otherwise(F.lit("first then"))
    )
    close = F.when(tarm == 3, F.lit("")).otherwise(F.lit("</a>"))
    first = F.concat(
        F.when(arm == 4, F.lit("<a rel='ugc sponsored' href=\""))
        .otherwise(F.lit('<a href="')),
        ref, F.lit('">'), inner, close,
    )
    html = F.concat(
        F.lit("<html><head>"), base_tag, F.lit("</head><body>"),
        first, F.lit("<p>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p><a href=/always/"), did,
        F.lit(" rel=nofollow><b>n</b></a></body></html>"),
    )
    src = docs.select(
        "doc_id",
        F.concat(F.lit("https://www.site"), n, F.lit(".com/a/b/p"),
                 did, F.lit(".html")).alias("url"),
        html.alias("html"),
    )
    return web.extract_links(src).select(
        "doc_id", "link_pos", "href", "rel", "anchor_text", "link_url"
    )


SQL_LINK_EXTRACT = """
WITH b AS (
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) AS did,
           CAST(doc_id % 37 AS VARCHAR) AS n,
           doc_id % 9 AS arm
    FROM documents
)
SELECT doc_id, 0 AS link_pos,
       CASE arm
           WHEN 0 THEN 'https://other' || n || '.org/x'
           WHEN 1 THEN '//cdn' || n || '.net/y'
           WHEN 2 THEN '/r/' || did || '?z=1#f'
           WHEN 3 THEN '../up/./c' || did || '.html'
           WHEN 4 THEN '?page=' || did
           WHEN 5 THEN 'sub/' || did || '/'
           WHEN 6 THEN 'f' || did || '.css'
           WHEN 7 THEN 'g' || did || '.js'
           ELSE 'https://keep' || n || '.org/v' || did
       END AS href,
       CASE arm WHEN 4 THEN 'ugc sponsored' END AS rel,
       CASE doc_id % 4
           WHEN 0 THEN 'first & best'
           WHEN 1 THEN 'x em z'
       END AS anchor_text,
       CASE arm
           WHEN 0 THEN 'https://other' || n || '.org/x'
           WHEN 1 THEN 'https://cdn' || n || '.net/y'
           WHEN 2 THEN 'https://www.site' || n || '.com/r/' || did
                       || '?z=1'
           WHEN 3 THEN 'https://www.site' || n || '.com/a/up/c' || did
                       || '.html'
           WHEN 4 THEN 'https://www.site' || n || '.com/a/b/p' || did
                       || '.html?page=' || did
           WHEN 5 THEN 'https://www.site' || n || '.com/a/b/sub/' || did
                       || '/'
           WHEN 6 THEN 'https://assets' || n || '.example/lib/f' || did
                       || '.css'
           WHEN 7 THEN 'https://www.site' || n || '.com/base/g' || did
                       || '.js'
           ELSE 'https://keep' || n || '.org/v' || did
       END AS link_url
FROM b
UNION ALL
SELECT doc_id, 1 AS link_pos,
       '/always/' || did AS href,
       'nofollow' AS rel,
       'n' AS anchor_text,
       CASE arm
           WHEN 6 THEN 'https://assets' || n || '.example/always/' || did
           WHEN 8 THEN 'https://ignored' || n || '.example/always/' || did
           ELSE 'https://www.site' || n || '.com/always/' || did
       END AS link_url
FROM b
"""


# --------------------------------------------------------------------------
# r14: inbound anchor-text rollup — the per-target corpus/ranking signal
# --------------------------------------------------------------------------

def q_anchor_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound anchor-text aggregation (``web.extract_links`` →
    ``web.anchor_text_rollup``): per link TARGET, total inbound edges,
    edges with visible text, and the top-2 most frequent anchor texts
    — the signal ranking/captioning pipelines read off the link graph.
    End-to-end from rendered HTML: each document links to one of 7
    targets with an anchor whose TEXT arm varies on ``doc_id % 5``
    (arm 0 plain 'alpha' and arm 1 nested '<b>alpha</b>' — which must
    CLEAN to the same 'alpha' and merge into the frequency winner;
    'beta'; a per-doc 'g<b>amma</b> N' long tail whose nested tag
    cleans to spaces, i.e. the engine text is 'g amma N'; an
    image-only NULL anchor) and whose edge is rel-excluded spam on
    ``doc_id % 11 == 0``. On the hash: the rel token filter,
    NULL-text edges counting in ``n_links`` but never ranking into
    the top-k, count-DESC/text-ASC tie-breaks, and the nested-tag
    anchor cleaning — if '<b>alpha</b>' failed to merge with 'alpha'
    the split halves the winner's count and the hash flips. Output
    exploded to one row per
    (target, rank) for the value hash. Plan: map-only extraction, then
    TWO shuffles — the (url, text) count with map-side combine and the
    url-partitioned rank window whose partitioning the final rollup
    reuses (plan-audited in the unit suite)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 7).cast("string")
    tarm = F.col("doc_id") % 5
    inner = (
        F.when(tarm == 0, F.lit("alpha"))
        .when(tarm == 1, F.lit("<b>alpha</b>"))
        .when(tarm == 2, F.lit("beta"))
        .when(tarm == 3, F.concat(F.lit("g<b>amma</b> "), did))
        .otherwise(F.lit('<img src="i.jpg">'))
    )
    rel = F.when(
        F.col("doc_id") % 11 == 0, F.lit(' rel="ugc nofollow"')
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<a href="https://t'), n, F.lit('.com/"'), rel,
        F.lit(">"), inner, F.lit("</a>"),
    )
    src = docs.select(
        "doc_id",
        F.concat(F.lit("https://src.example/p"), did).alias("url"),
        html.alias("html"),
    )
    links = web.extract_links(src)
    roll = web.anchor_text_rollup(links, k=2)
    return roll.select(
        "link_url", "n_links", "n_anchored",
        F.posexplode("top_anchors").alias("pos", "_a"),
    ).select(
        "link_url", "n_links", "n_anchored", "pos",
        F.col("_a.anchor_text").alias("anchor_text"),
        F.col("_a.n").alias("n"),
    )


SQL_ANCHOR_ROLLUP = """
WITH e AS (
    SELECT doc_id % 7 AS tgt,
           CASE WHEN doc_id % 5 IN (0, 1) THEN 'alpha'
                WHEN doc_id % 5 = 2 THEN 'beta'
                WHEN doc_id % 5 = 3
                    THEN 'g amma ' || CAST(doc_id AS VARCHAR)
           END AS t
    FROM documents
    WHERE doc_id % 11 <> 0
),
pair AS (
    SELECT tgt, t, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2
),
ranked AS (
    SELECT tgt, t, n,
           ROW_NUMBER() OVER (
               PARTITION BY tgt ORDER BY (t IS NULL), n DESC, t
           ) AS rk
    FROM pair
),
tot AS (
    SELECT tgt,
           CAST(SUM(n) AS BIGINT) AS n_links,
           CAST(SUM(CASE WHEN t IS NOT NULL THEN n ELSE 0 END) AS BIGINT)
               AS n_anchored
    FROM pair GROUP BY 1
)
SELECT 'https://t' || CAST(tgt AS VARCHAR) || '.com/' AS link_url,
       n_links, n_anchored,
       CAST(rk - 1 AS INTEGER) AS pos, t AS anchor_text, n
FROM ranked JOIN tot USING (tgt)
WHERE rk <= 2 AND t IS NOT NULL
"""


def q_image_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image–text pairing (``web.extract_images`` →
    ``web.image_text_pairs``): the CLIP-style (image_url, caption,
    payload) triples a multimodal corpus trains on. Each document
    renders one page whose ``<img>`` arm varies on ``doc_id % 6``:
    (0) absolute src + plain alt; (1) relative src + entity in alt;
    (2) alt-LESS absolute-path src (caption NULL — pinned by
    ``require_caption=False``); (3) ``<base href>`` the src must
    resolve against; (4) a ``data-src`` decoy the walk must skip
    before the real img; (5) a ``<figure>``/``<figcaption>`` whose
    caption outranks the alt. The media frame carries one row per
    expected URL with an arithmetic payload length; the inner join
    must pair every extracted row. On the hash: attribute-boundary
    decoy rejection, RFC 3986 + base resolution, entity decode, the
    figcaption-over-alt caption rule, and empty-alt-never-captions.
    Plan: map-only extraction; the ONE shuffle is the URL equi-join
    (media broadcast here — the gate's media side is small)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    arm = F.col("doc_id") % 6
    site = F.concat(F.lit("https://www.site"), n, F.lit(".com"))
    img = (
        F.when(arm == 0, F.concat(
            F.lit('<img src="https://cdn'), n, F.lit(".com/i"), did,
            F.lit('.jpg" alt="pic '), did, F.lit('">')))
        .when(arm == 1, F.concat(
            F.lit('<img alt="A&amp;B '), did, F.lit('" src="i'), did,
            F.lit('.jpg">')))
        .when(arm == 2, F.concat(
            F.lit('<img src="/abs/i'), did, F.lit('.jpg">')))
        .when(arm == 3, F.concat(
            F.lit('<img src="i'), did, F.lit('.jpg" alt="based">')))
        .when(arm == 4, F.concat(
            F.lit('<img data-src="no.jpg" alt="decoy"><img src="r'),
            did, F.lit('.png" alt="real">')))
        .otherwise(F.concat(
            F.lit('<figure><img src="f'), did,
            F.lit('.jpg" alt="ignored"><figcaption>Fig &amp; '), did,
            F.lit("</figcaption></figure>")))
    )
    base_tag = F.when(arm == 3, F.concat(
        F.lit('<base href="https://media'), n, F.lit('.example/m/">')
    )).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), base_tag, F.lit("</head><body>"),
        img, F.lit("</body></html>"),
    )
    src = docs.select(
        "doc_id",
        F.concat(site, F.lit("/d/p"), did, F.lit(".html")).alias("url"),
        html.alias("html"),
    )
    expected_url = (
        F.when(arm == 0, F.concat(
            F.lit("https://cdn"), n, F.lit(".com/i"), did, F.lit(".jpg")))
        .when(arm == 1, F.concat(site, F.lit("/d/i"), did, F.lit(".jpg")))
        .when(arm == 2, F.concat(site, F.lit("/abs/i"), did,
                                 F.lit(".jpg")))
        .when(arm == 3, F.concat(F.lit("https://media"), n,
                                 F.lit(".example/m/i"), did,
                                 F.lit(".jpg")))
        .when(arm == 4, F.concat(site, F.lit("/d/r"), did, F.lit(".png")))
        .otherwise(F.concat(site, F.lit("/d/f"), did, F.lit(".jpg")))
    )
    media = docs.select(
        expected_url.alias("url"),
        (F.col("doc_id") % 251).cast("long").alias("payload_len"),
    )
    imgs = web.extract_images(src)
    pairs = web.image_text_pairs(
        imgs, media, require_caption=False, broadcast_media=True
    )
    return pairs.select(
        "doc_id", "img_pos", "img_url", "caption", "payload_len"
    )


SQL_IMAGE_PAIRS = """
WITH b AS (
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) AS did,
           CAST(doc_id % 37 AS VARCHAR) AS n,
           doc_id % 6 AS arm
    FROM documents
)
SELECT doc_id, 0 AS img_pos,
       CASE arm
           WHEN 0 THEN 'https://cdn' || n || '.com/i' || did || '.jpg'
           WHEN 1 THEN 'https://www.site' || n || '.com/d/i' || did
                       || '.jpg'
           WHEN 2 THEN 'https://www.site' || n || '.com/abs/i' || did
                       || '.jpg'
           WHEN 3 THEN 'https://media' || n || '.example/m/i' || did
                       || '.jpg'
           WHEN 4 THEN 'https://www.site' || n || '.com/d/r' || did
                       || '.png'
           ELSE 'https://www.site' || n || '.com/d/f' || did || '.jpg'
       END AS img_url,
       CASE arm
           WHEN 0 THEN 'pic ' || did
           WHEN 1 THEN 'A&B ' || did
           WHEN 3 THEN 'based'
           WHEN 4 THEN 'real'
           WHEN 5 THEN 'Fig & ' || did
       END AS caption,
       CAST(doc_id % 251 AS BIGINT) AS payload_len
FROM b
"""


def q_revisit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl-interval estimation (``cdx.revisit_schedule``): per
    urlkey, digest-change rate over capture history → a power-of-two
    revisit interval — the signal that closes the crawl loop (index →
    change rate → frontier priority). 23 bulk URLs each accumulate a
    capture per document (one per day, hh:mm:ss varying per doc so the
    within-day ORDER is on the hash) in four digest arms by
    ``urlkey % 4``: never-changed, always-changed, day-alternating,
    and a NULL-digest mix (NULL↔NULL is NOT a change, NULL↔value is);
    every 10th document adds a single-capture URL (default interval).
    On the hash: the timezone-free epoch arithmetic (calendar
    date-diff + hhmmss), the Cho-style ``span div changes`` estimator,
    the never-changed 2×span backoff, clamping, and the integer
    ceil-power-of-two bucketing (replayed in DuckDB as
    ``1 << length(bin(x-1))``). Plan: ONE urlkey exchange — lag
    window + a rollup that reuses its partitioning."""
    from dataproc_spark.extensions import cdx as cdxx

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id") % 23
    seq = F.expr("doc_id div 23")
    hh = F.lpad((F.col("doc_id") % 24).cast("string"), 2, "0")
    mi = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")
    ss = F.lpad(((F.col("doc_id") * 7) % 60).cast("string"), 2, "0")
    day = F.date_format(
        F.date_add(F.lit("2024-01-01").cast("date"), seq.cast("int")),
        "yyyyMMdd",
    )
    ts = F.concat(day, hh, mi, ss)
    karm = k % 4
    digest = (
        F.when(karm == 0, F.concat(F.lit("c"), k.cast("string")))
        .when(karm == 1, F.concat(F.lit("u"), F.col("doc_id")
                                  .cast("string")))
        .when(karm == 2, F.concat(F.lit("m"), (seq % 2).cast("string")))
        .otherwise(F.when(
            seq % 3 == 0, F.lit(None).cast("string")
        ).otherwise(F.concat(F.lit("n"), k.cast("string"))))
    )
    bulk = docs.select(
        F.concat(F.lit("k"), k.cast("string")).alias("urlkey"),
        ts.alias("ts"), digest.alias("digest"),
    )
    singles = docs.where(F.col("doc_id") % 10 == 0).select(
        F.concat(F.lit("single"), F.col("doc_id").cast("string"))
        .alias("urlkey"),
        F.lit("20240101000000").alias("ts"),
        F.lit("z").alias("digest"),
    )
    return cdxx.revisit_schedule(bulk.unionAll(singles))


SQL_REVISIT_SCHEDULE = r"""
WITH caps AS (
    SELECT 'k' || CAST(doc_id % 23 AS VARCHAR) AS urlkey,
           strftime(DATE '2024-01-01'
                        + to_days(CAST(doc_id // 23 AS INTEGER)),
                    '%Y%m%d')
               || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
               || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
               || lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')
               AS ts,
           CASE (doc_id % 23) % 4
               WHEN 0 THEN 'c' || CAST(doc_id % 23 AS VARCHAR)
               WHEN 1 THEN 'u' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN 'm' || CAST((doc_id // 23) % 2 AS VARCHAR)
               ELSE CASE WHEN (doc_id // 23) % 3 = 0 THEN NULL
                         ELSE 'n' || CAST(doc_id % 23 AS VARCHAR) END
           END AS digest
    FROM documents
    UNION ALL
    SELECT 'single' || CAST(doc_id AS VARCHAR), '20240101000000', 'z'
    FROM documents WHERE doc_id % 10 = 0
),
flagged AS (
    SELECT urlkey,
           date_diff('day', DATE '1970-01-01',
                     CAST(strptime(substr(ts, 1, 8), '%Y%m%d') AS DATE))
                   * 86400
               + CAST(substr(ts, 9, 2) AS BIGINT) * 3600
               + CAST(substr(ts, 11, 2) AS BIGINT) * 60
               + CAST(substr(ts, 13, 2) AS BIGINT) AS ep,
           CASE WHEN ROW_NUMBER() OVER w > 1
                     AND digest IS DISTINCT FROM LAG(digest) OVER w
                THEN 1 ELSE 0 END AS chg
    FROM caps
    WINDOW w AS (PARTITION BY urlkey
                 ORDER BY ts ASC, digest ASC NULLS FIRST)
),
agg AS (
    SELECT urlkey,
           CAST(COUNT(*) AS BIGINT) AS n_captures,
           CAST(SUM(chg) AS BIGINT) AS n_changes,
           CAST(MAX(ep) - MIN(ep) AS BIGINT) AS span_s
    FROM flagged GROUP BY urlkey
),
est AS (
    SELECT urlkey, n_captures, n_changes, span_s,
           LEAST(GREATEST(
               CASE WHEN n_captures < 2 OR span_s <= 0 THEN 524288
                    WHEN n_changes = 0 THEN 2 * span_s
                    ELSE span_s // n_changes END,
               4096), 16777216) AS clamped
    FROM agg
)
SELECT urlkey, n_captures, n_changes, span_s,
       CAST(CASE WHEN clamped <= 1 THEN 1
                 ELSE CAST(1 AS BIGINT) << length(bin(clamped - 1))
            END AS BIGINT) AS revisit_s
FROM est
"""


def q_warc_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC request/response pairing (``warc.pair_requests``): write an
    archive holding BOTH record types — each document one HTTP response
    plus one GET request linked by ``WARC-Concurrent-To`` (every third
    document's request is MISSING, the responses-only archive reality)
    — re-ingest with ``read_warc(warc_types=None)``, and re-pair. On
    the hash: the Concurrent-To header roundtrip, the request-line
    pseudo-key parse (``:method``/``:path``), the RFC 9110 repeated-
    header join (two ``Accept`` values), pseudo-key filtering out of
    ``req_headers``, and left-join survival of request-less responses.
    Plan: binaryFile scan → Arrow splitter → ONE record-id equi-join.
    Scratch shards are deleted before returning."""
    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean
    import tempfile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    uri = F.concat(F.lit("https://site"), (F.col("doc_id") % 37)
                   .cast("string"), F.lit(".com/doc/"), did)
    body = F.concat(F.lit("<html>"), F.coalesce(F.col("text"), F.lit("")),
                    F.lit("</html>"))
    resp_payload = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), body
    ).cast("binary")
    req_payload = F.concat(
        F.lit("GET /doc/"), did,
        F.lit(" HTTP/1.1\r\nHost: h\r\nAccept: text/html\r\n"
              "Accept: */*\r\nUser-Agent: dp\r\n\r\n"),
    ).cast("binary")
    # the gate OWNS record identity: mint the response id column-side
    # and hand it to the sink via record_id_col, so the request's
    # Concurrent-To link never mirrors sink-internal derivation
    rid = F.concat(F.lit("<urn:uuid:"),
                   F.md5(F.concat(F.lit("gate-pair:"), uri)
                         .cast("binary")),
                   F.lit(">"))
    resp_rows = docs.select(
        uri.alias("target_uri"), resp_payload.alias("payload"),
        F.lit("response").alias("wtype"), rid.alias("rid"),
        F.lit(None).cast("string").alias("cto"),
    )
    req_rows = docs.where(F.col("doc_id") % 3 != 0).select(
        uri.alias("target_uri"), req_payload.alias("payload"),
        F.lit("request").alias("wtype"),
        F.lit(None).cast("string").alias("rid"),
        rid.alias("cto"),
    )
    out_dir = tempfile.mkdtemp(prefix="warcpair_")
    try:
        warcx.write_warc_shards(
            resp_rows.unionAll(req_rows).repartition(4, "target_uri"),
            out_dir,
            type_col="wtype",
            record_id_col="rid",
            extra_headers={"WARC-Concurrent-To": "cto"},
        )
    except BaseException:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        raise
    back = warcx.read_warc(spark, out_dir, warc_types=None)
    paired = warcx.pair_requests(back, keep_unpaired=True)
    res = paired.select(
        _warc_doc_id(),
        "http_status",
        "req_method",
        "req_path",
        F.col("req_headers")["accept"].alias("req_accept"),
        F.col("req_headers")["user-agent"].alias("req_ua"),
        F.octet_length("req_body").cast("long").alias("req_body_len"),
        F.octet_length("body").cast("long").alias("body_len"),
    )
    return _materialize_and_clean(res, out_dir)


SQL_WARC_PAIR = """
SELECT doc_id,
       200 AS http_status,
       CASE WHEN doc_id % 3 <> 0 THEN 'GET' END AS req_method,
       CASE WHEN doc_id % 3 <> 0
            THEN '/doc/' || CAST(doc_id AS VARCHAR) END AS req_path,
       CASE WHEN doc_id % 3 <> 0 THEN 'text/html, */*' END AS req_accept,
       CASE WHEN doc_id % 3 <> 0 THEN 'dp' END AS req_ua,
       CASE WHEN doc_id % 3 <> 0 THEN CAST(0 AS BIGINT) END
           AS req_body_len,
       CAST(strlen('<html>' || coalesce(text, '') || '</html>') AS BIGINT)
           AS body_len
FROM documents
"""


def q_wat_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enriched WAT sidecar (r14 — ``write_wat_shards(with_anchors,
    with_images)`` / ``read_wat``): the anchor-text and image-caption
    arrays WAT consumers expect next to the link list. Pages carry two
    links whose TEXT arms vary (entity decode / image-only NULL — the
    anchors array must stay index-ALIGNED with links through nulls),
    one plain ``<img alt>`` and one figure whose figcaption must
    outrank the alt, with a ``data-src`` decoy. On the hash: the
    one-walk link/anchor alignment, JSON roundtrip of null array
    elements (``to_json`` keeps them so positions survive), caption
    precedence, and src resolution. Scratch shards removed before
    returning."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    n = (F.col("doc_id") % 37).cast("string")
    url = F.concat(F.lit("https://site"), n, F.lit(".com/d/p"), did,
                   F.lit(".html"))
    t1 = F.when(F.col("doc_id") % 3 == 0, F.lit("go &amp; see")) \
        .when(F.col("doc_id") % 3 == 1, F.lit('<img data-src="t.gif">')) \
        .otherwise(F.concat(F.lit("read "), did))
    html = F.concat(
        F.lit('<html><body><a href="/l/'), did, F.lit('">'), t1,
        F.lit('</a><a href="r'), did, F.lit('.html"><b>b</b>old</a>'),
        F.lit('<img data-src="no.jpg" alt="decoy">'),
        F.lit('<img src="i'), did, F.lit('.jpg" alt="pic '), did,
        F.lit('"><figure><img src="f'), did,
        F.lit('.png" alt="shadowed"><figcaption>Cap '), did,
        F.lit("</figcaption></figure></body></html>"),
    )
    src = docs.select(
        url.alias("target_uri"),
        F.lit(200).cast("int").alias("http_status"),
        F.lit("text/html").alias("http_content_type"),
        html.alias("html"),
    )
    out = tempfile.mkdtemp(prefix="watenr_")
    try:
        warcx.write_wat_shards(src, out, html_col="html",
                               with_anchors=True, with_images=True)
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    back = warcx.read_wat(spark, out)
    res = back.select(
        F.regexp_extract(F.col("wat_url"), r"/p([0-9]+)\.html$", 1)
        .cast("long").alias("doc_id"),
        "wat_n_links",
        F.array_join(F.col("wat_links"), " ").alias("links_joined"),
        # join with a NULL placeholder so alignment through null
        # anchor texts is ON the hash
        F.array_join(
            F.transform(F.col("wat_anchors"),
                        lambda a: F.coalesce(a, F.lit("∅"))),
            "|",
        ).alias("anchors_joined"),
        F.array_join(
            F.transform(F.col("wat_images"), lambda s: s["url"]),
            " ",
        ).alias("img_urls"),
        F.array_join(
            F.transform(F.col("wat_images"),
                        lambda s: F.coalesce(s["caption"], F.lit("∅"))),
            "|",
        ).alias("captions_joined"),
    )
    return _materialize_and_clean(res, out)


SQL_WAT_ENRICHED = """
WITH b AS (
    SELECT doc_id,
           CAST(doc_id AS VARCHAR) AS did,
           CAST(doc_id % 37 AS VARCHAR) AS n
    FROM documents
)
SELECT doc_id,
       2 AS wat_n_links,
       'https://site' || n || '.com/l/' || did || ' '
           || 'https://site' || n || '.com/d/r' || did || '.html'
           AS links_joined,
       CASE doc_id % 3
           WHEN 0 THEN 'go & see'
           WHEN 1 THEN '∅'
           ELSE 'read ' || did
       END || '|' || 'b old' AS anchors_joined,
       'https://site' || n || '.com/d/i' || did || '.jpg '
           || 'https://site' || n || '.com/d/f' || did || '.png'
           AS img_urls,
       'pic ' || did || '|' || 'Cap ' || did AS captions_joined
FROM b
"""


def q_recrawl_due(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl due-priority (``cdx.recrawl_due``): the frontier queue
    the interval estimator exists for — per urlkey, the last capture,
    its age as of a crawl-wave cut timestamp, and the integer
    due-permille priority. Same capture fixture as
    ``revisit_schedule`` (four digest arms + single-capture URLs),
    ``asof = 2024-04-01T00:00:00`` — far enough out that bulk URLs
    (daily captures through ~mid-January at sf0.01) are overdue by
    varying amounts and the single-capture default-interval arm is
    barely due. On the hash: the shared timezone-free epoch
    arithmetic on BOTH the data and the literal, max-capture
    selection, integer permille division, and the >= 1000 due rule.
    Plan: ONE urlkey exchange, priority math projection-only."""
    from dataproc_spark.extensions import cdx as cdxx

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id") % 23
    seq = F.expr("doc_id div 23")
    hh = F.lpad((F.col("doc_id") % 24).cast("string"), 2, "0")
    mi = F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0")
    ss = F.lpad(((F.col("doc_id") * 7) % 60).cast("string"), 2, "0")
    day = F.date_format(
        F.date_add(F.lit("2024-01-01").cast("date"), seq.cast("int")),
        "yyyyMMdd",
    )
    ts = F.concat(day, hh, mi, ss)
    karm = k % 4
    digest = (
        F.when(karm == 0, F.concat(F.lit("c"), k.cast("string")))
        .when(karm == 1, F.concat(F.lit("u"), F.col("doc_id")
                                  .cast("string")))
        .when(karm == 2, F.concat(F.lit("m"), (seq % 2).cast("string")))
        .otherwise(F.when(
            seq % 3 == 0, F.lit(None).cast("string")
        ).otherwise(F.concat(F.lit("n"), k.cast("string"))))
    )
    bulk = docs.select(
        F.concat(F.lit("k"), k.cast("string")).alias("urlkey"),
        ts.alias("ts"), digest.alias("digest"),
    )
    singles = docs.where(F.col("doc_id") % 10 == 0).select(
        F.concat(F.lit("single"), F.col("doc_id").cast("string"))
        .alias("urlkey"),
        F.lit("20240101000000").alias("ts"),
        F.lit("z").alias("digest"),
    )
    return cdxx.recrawl_due(bulk.unionAll(singles),
                            asof="20240401000000")


SQL_RECRAWL_DUE = r"""
WITH caps AS (
    SELECT 'k' || CAST(doc_id % 23 AS VARCHAR) AS urlkey,
           strftime(DATE '2024-01-01'
                        + to_days(CAST(doc_id // 23 AS INTEGER)),
                    '%Y%m%d')
               || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
               || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
               || lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')
               AS ts,
           CASE (doc_id % 23) % 4
               WHEN 0 THEN 'c' || CAST(doc_id % 23 AS VARCHAR)
               WHEN 1 THEN 'u' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN 'm' || CAST((doc_id // 23) % 2 AS VARCHAR)
               ELSE CASE WHEN (doc_id // 23) % 3 = 0 THEN NULL
                         ELSE 'n' || CAST(doc_id % 23 AS VARCHAR) END
           END AS digest
    FROM documents
    UNION ALL
    SELECT 'single' || CAST(doc_id AS VARCHAR), '20240101000000', 'z'
    FROM documents WHERE doc_id % 10 = 0
),
flagged AS (
    SELECT urlkey, ts,
           date_diff('day', DATE '1970-01-01',
                     CAST(strptime(substr(ts, 1, 8), '%Y%m%d') AS DATE))
                   * 86400
               + CAST(substr(ts, 9, 2) AS BIGINT) * 3600
               + CAST(substr(ts, 11, 2) AS BIGINT) * 60
               + CAST(substr(ts, 13, 2) AS BIGINT) AS ep,
           CASE WHEN ROW_NUMBER() OVER w > 1
                     AND digest IS DISTINCT FROM LAG(digest) OVER w
                THEN 1 ELSE 0 END AS chg
    FROM caps
    WINDOW w AS (PARTITION BY urlkey
                 ORDER BY ts ASC, digest ASC NULLS FIRST)
),
agg AS (
    SELECT urlkey,
           CAST(COUNT(*) AS BIGINT) AS n_captures,
           CAST(SUM(chg) AS BIGINT) AS n_changes,
           CAST(MAX(ep) - MIN(ep) AS BIGINT) AS span_s,
           CAST(MAX(ep) AS BIGINT) AS last_ep,
           MAX(ts) AS last_ts
    FROM flagged GROUP BY urlkey
),
est AS (
    SELECT *,
           LEAST(GREATEST(
               CASE WHEN n_captures < 2 OR span_s <= 0 THEN 524288
                    WHEN n_changes = 0 THEN 2 * span_s
                    ELSE span_s // n_changes END,
               4096), 16777216) AS clamped
    FROM agg
),
sched AS (
    SELECT urlkey, n_captures, n_changes, span_s,
           CAST(CASE WHEN clamped <= 1 THEN 1
                     ELSE CAST(1 AS BIGINT) << length(bin(clamped - 1))
                END AS BIGINT) AS revisit_s,
           last_ts,
           CAST(date_diff('day', DATE '1970-01-01', DATE '2024-04-01')
                    * 86400 - last_ep AS BIGINT) AS age_s
    FROM est
)
SELECT urlkey, n_captures, n_changes, span_s, revisit_s, last_ts,
       age_s,
       CAST((age_s * 1000) // revisit_s AS BIGINT) AS due_permille,
       (age_s * 1000) // revisit_s >= 1000 AS due
FROM sched
"""


def q_warc_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-offset sidecar (``write_warc_shards(offsets_sidecar)`` /
    ``read_warc_offsets``): the record-level byte-range index only the
    SINK can know — what turns a CDX hit into a single-record range
    fetch instead of a shard scan (closing the divergence
    ``cdx_index`` documents). One UNCOMPRESSED shard, records sorted
    by URI, so every offset is pure byte arithmetic the oracle
    rebuilds from the envelope layout: fixed framing (version line,
    Type/Record-ID/Date headers, blank line, trailing CRLFs = 184
    bytes with the URI/Content-Type/Content-Length-digit terms
    added), the payload length, and a cumulative sum in URI order.
    Any envelope framing drift, header reorder, or off-by-CRLF moves
    every subsequent offset and hash-fails. The unit suite separately
    pins that gzip-member offsets slice back to single records.
    Scratch shards removed before returning."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id").cast("string")
    uri = F.concat(F.lit("https://site"), (F.col("doc_id") % 37)
                   .cast("string"), F.lit(".com/doc/"), did)
    body = F.concat(F.lit("<html>"), F.coalesce(F.col("text"), F.lit("")),
                    F.lit("</html>"))
    src = (
        docs.select(uri.alias("target_uri"),
                    body.cast("binary").alias("payload"))
        .repartition(1)
        .sortWithinPartitions("target_uri")
    )
    out = tempfile.mkdtemp(prefix="warcoff_")
    try:
        warcx.write_warc_shards(
            src, out, compress=False, content_type="text/html",
            offsets_sidecar=True,
        )
    except Exception:
        shutil.rmtree(out, ignore_errors=True)
        raise
    idx = warcx.read_warc_offsets(spark, out)
    res = idx.select(
        F.regexp_extract(F.col("target_uri"), r"/doc/([0-9]+)$", 1)
        .cast("long").alias("doc_id"),
        "offset", "length",
    )
    return _materialize_and_clean(res, out)


SQL_WARC_OFFSETS = """
WITH b AS (
    SELECT doc_id,
           'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com/doc/'
               || CAST(doc_id AS VARCHAR) AS uri,
           strlen('<html>' || coalesce(text, '') || '</html>') AS n
    FROM documents
),
sized AS (
    SELECT doc_id, uri,
           184 + length(uri) + length('text/html')
               + length(CAST(n AS VARCHAR)) + n AS sz
    FROM b
)
SELECT doc_id,
       CAST(COALESCE(SUM(sz) OVER (
                ORDER BY uri
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS offset,
       CAST(sz AS BIGINT) AS length
FROM sized
"""


# --------------------------------------------------------------------------
# r15: revisit-record WRITING — digest dedup at the sink
# --------------------------------------------------------------------------

def q_warc_revisit_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revisit-record WRITING (``warc.plan_revisit_records`` /
    ``write_warc_shards_deduped``): digest-based dedup AT THE SINK —
    duplicate bodies become tiny revisit records (digest + refers-to,
    empty payload) instead of stored copies, the other half of the
    ``resolve_revisits`` read path (r14 verdict gap). Fixture: content
    classes ``cls = doc_id % 20`` — every document in a class shares
    one body, so ~96% of captures at 500 docs write as revisits; the
    donor is the MIN URI string per digest (deterministic election On
    the hash, including the lexicographic-not-numeric URI order). The
    chain writes the mixed archive, re-ingests it, and resolves: every
    body must reconstruct, every revisit must point at its donor's
    minted record id (``md5('resp:' digest ':' key)`` — value-checked,
    DuckDB rebuilds the sha256 digest and the md5 id). Plan: ONE
    digest-keyed metadata aggregation + ONE digest join moving bodies
    once; the archive is written per-partition with no further
    exchange. Scratch shards removed before returning."""
    import shutil
    import tempfile

    from dataproc_spark.extensions import warc as warcx
    from dataproc_spark.queries.diagnostics import _materialize_and_clean

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    cls = (F.col("doc_id") % 20).cast("string")
    uri = F.concat(F.lit("https://site"),
                   (F.col("doc_id") % 37).cast("string"),
                   F.lit(".com/doc/"), did)
    body = F.concat(F.lit("<html>class "), cls, F.lit(" body</html>"))
    src = docs.select(uri.alias("target_uri"),
                      body.cast("binary").alias("payload"))
    out = tempfile.mkdtemp(prefix="warcrw_")
    try:
        warcx.write_warc_shards_deduped(
            src.repartition(4, "target_uri"), out,
            content_type="text/html",
        )
    except BaseException:
        shutil.rmtree(out, ignore_errors=True)
        raise
    back = warcx.read_warc(spark, out,
                           warc_types=("response", "revisit"))
    resolved = warcx.resolve_revisits(back)
    res = resolved.select(
        _warc_doc_id(),
        "is_revisit",
        "source_record_id",
        F.decode(F.col("body"), "UTF-8").alias("body_text"),
        F.octet_length("body").cast("long").alias("n_body_bytes"),
    )
    return _materialize_and_clean(res, out)


SQL_WARC_REVISIT_WRITE = """
WITH b AS (
    SELECT doc_id,
           'https://site' || CAST(doc_id % 37 AS VARCHAR) || '.com/doc/'
               || CAST(doc_id AS VARCHAR) AS uri,
           '<html>class ' || CAST(doc_id % 20 AS VARCHAR)
               || ' body</html>' AS body
    FROM documents
),
d AS (
    SELECT doc_id, uri, body,
           'sha256:' || sha256(body) AS digest,
           MIN(uri) OVER (PARTITION BY doc_id % 20) AS donor_uri
    FROM b
)
SELECT doc_id,
       uri <> donor_uri AS is_revisit,
       CASE WHEN uri <> donor_uri THEN
            '<urn:uuid:' || md5('resp:' || digest || ':' || donor_uri)
                || '>'
       END AS source_record_id,
       body AS body_text,
       CAST(strlen(body) AS BIGINT) AS n_body_bytes
FROM d
"""
