"""URL / domain-level corpus curation.

Web-scale corpora are curated per *domain* before any text-level pass:
parse the host out of each document's URL, roll hosts up to registered
domains, cap how many documents any one domain may contribute, and
report the domain mixture of what survives. The reference engine has
per-``source`` operators but no URL family (VERDICT r7 "what's missing"
#1); this module adds it Spark-first.

Scale posture (100 TB, ~billions of URLs):

* Host extraction is a **map-only** JVM expression (``parse_url`` —
  whole-stage codegen, no Python). Zero shuffles.
* Registered-domain rollup: the default is a deterministic suffix
  heuristic (map-only); :mod:`.psl` implements the full
  public-suffix-list algorithm over a pinned in-repo snapshot as
  per-depth broadcast joins (wildcard + exception rules, longest
  match) — still zero shuffles. ``with_domain(..., psl=True)`` opts
  in; the heuristic stays the no-PSL fallback.
* ``cap_per_domain`` is ONE shuffle (window over domain). The hazard is
  domain skew — a crawl's biggest domain can be 10^4× the median — so
  the operator offers a two-phase salted pre-cap: phase 1 caps within
  (domain, salt) — bounding every window partition at ``cap`` rows per
  salt — and phase 2 runs the exact cap over the ≤ cap × n_salts
  survivors. The giant domain's window partition shrinks from its raw
  document count to ``cap × n_salts`` regardless of skew.
* ``domain_mixture`` is a map-side-combined count per domain (one
  shuffle); the share denominator is a 1-row aggregate broadcast back,
  never a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: two-level public suffixes the registered-domain heuristic recognises
#: (the oracle-able stand-in for the full public-suffix list; the real
#: PSL becomes a broadcast-joined table at the seam marked below)
_TWO_LEVEL_SUFFIXES = (
    "co", "com", "ac", "gov", "org", "net", "edu",
)

#: ``host.endswith(label . two_level_suffix . cc)`` pattern, shared by the
#: Spark expression and the DuckDB oracle (keep it portable: no
#: lookbehind, no named groups)
_REGDOM_PATTERN = (
    r"([^.]+\.(?:" + "|".join(_TWO_LEVEL_SUFFIXES) + r")\.[a-z]{2})$"
)
_LAST_TWO_PATTERN = r"([^.]+\.[^.]+)$"


def host_of(url_col: str | Column = "url") -> Column:
    """Lower-cased host of a URL — JVM ``parse_url(url, 'HOST')``,
    map-only / codegen-friendly. NULL for unparseable URLs (callers
    decide whether NULL-host docs are dropped or quarantined)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    # try_parse_url, not parse_url: Spark 4's parse_url THROWS on an
    # invalid URL, which on real crawl data means one malformed row
    # aborts the whole job — NULL-and-quarantine is the only viable
    # contract at scale
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def registered_domain(host_col: str | Column = "host") -> Column:
    """Registered domain (eTLD+1) of a host under the two-level-suffix
    heuristic: ``a.b.site.co.uk`` → ``site.co.uk``; ``www.site.com`` →
    ``site.com``; a bare single-label host maps to itself.

    This is the deterministic, oracle-able fallback; the full
    public-suffix-list algorithm (wildcards, exceptions, longest match)
    lives in :func:`dataproc_spark.extensions.psl.registered_domain_psl`
    as a broadcast join over the pinned snapshot — same plan family
    (map-only + broadcast), rule-complete.
    """
    c = F.col(host_col) if isinstance(host_col, str) else host_col
    # the suffix patterns are lowercase: lower the input here so a raw
    # (non-host_of) host column can't collapse every *.CO.UK site into
    # one 'CO.UK' domain via the last-two fallback
    c = F.lower(c)
    three = F.regexp_extract(c, _REGDOM_PATTERN, 1)
    two = F.regexp_extract(c, _LAST_TWO_PATTERN, 1)
    return F.when(three != "", three).when(two != "", two).otherwise(c)


def with_domain(
    df: DataFrame, url_col: str = "url", host_col: str = "host",
    domain_col: str = "domain", psl: bool = False,
) -> DataFrame:
    """Attach ``host`` and registered ``domain`` columns — the map-only
    preamble every operator below builds on.

    ``psl=True`` rolls hosts up with the full public-suffix-list
    algorithm over the pinned snapshot (:mod:`.psl` — wildcard and
    exception rules, longest-match; per-depth broadcast joins, still
    zero shuffles); the default stays the two-level-suffix heuristic,
    which remains the no-PSL fallback and keeps the r8-era gates
    byte-stable."""
    out = df.withColumn(host_col, host_of(url_col))
    if psl:
        from dataproc_spark.extensions.psl import registered_domain_psl

        return registered_domain_psl(out, host_col=host_col,
                                     out_col=domain_col)
    return out.withColumn(domain_col, registered_domain(host_col))


#: query parameters that never change page identity (tracking junk) —
#: the deterministic, oracle-able core of URL canonicalization; real
#: deployments extend the list per-site via config, same plan shape
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "ref",
)

#: one alternation regex matching a single tracking param (with its
#: value) wherever it sits in the query string; applied iteratively
#: because params are independent — shared with the DuckDB oracle
_TRACKING_RE = r"(?:" + "|".join(TRACKING_PARAMS) + r")=[^&#]*"


def canonical_url(url_col: str | Column = "url") -> Column:
    """Canonical form of a URL for URL-level dedup: lower-cased scheme
    and host, fragment dropped, tracking params (:data:`TRACKING_PARAMS`)
    stripped, empty ``?`` and trailing slash removed.

    Pure ``regexp_replace`` chain — map-only, codegen-friendly, and
    RE2-portable so the oracle applies the identical rewrites. Two URLs
    that differ only by tracking decoration, fragment, case of
    scheme/host, or a trailing slash canonicalize identically; path and
    meaningful query params are preserved (case-sensitive, as the URL
    spec requires).
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    # lower-case ONLY the scheme and host:port — never path, query, or
    # the userinfo (user:password@ is case-sensitive per RFC 3986, so a
    # credential must survive verbatim; r8 follow-up review finding)
    auth = F.regexp_extract(c, r"^[^/?#]*//([^/?#]*)", 1)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([^/?#]*//)", 1)),
        F.regexp_extract(auth, r"^(.*@)", 1),  # greedy: up to the LAST @
        F.lower(F.regexp_replace(auth, r"^.*@", "")),
        F.regexp_replace(c, r"^[^/?#]*//[^/?#]*", ""),
    )
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    # split at the FIRST '?': tracking params live in the query string
    # ONLY. A literal '&name=' in a path segment (legal per RFC 3986
    # sub-delims) must survive, and a '?' inside a query VALUE is data —
    # an unanchored '?'-normalization would eat both (r8 review finding).
    base = F.regexp_extract(c, r"^([^?]*)", 1)
    query = F.regexp_replace(c, r"^[^?]*", "")
    # normalize ONLY the leading '?' to '?&' so one lookbehind-free
    # pattern strips a tracking param at any position — RE2 (DuckDB's
    # engine) has no lookbehind, so the oracle could not replay a
    # (?<=\?) form
    query = F.regexp_replace(query, r"^\?", "?&")
    query = F.regexp_replace(query, r"&" + _TRACKING_RE, "")
    query = F.regexp_replace(query, r"^\?&", "?")  # undo the normalization
    query = F.regexp_replace(query, r"^\?$", "")  # query emptied entirely
    # trailing slash comes off the PATH, not the reassembled URL: on the
    # full string it corrupted a query VALUE ending in '/' and never
    # fired when a query was present (r8 follow-up review finding)
    base = F.regexp_replace(base, r"/$", "")
    return F.concat(base, query)


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    order_by: list[str] | None = None,
) -> DataFrame:
    """URL-level dedup: keep ONE document per canonical URL (the
    cheapest dedup pass a web corpus gets — it runs before any
    text-level fingerprinting and typically removes the recrawl bulk).
    Winner per canonical URL is the first row by ``order_by``
    (ascending; pass a unique id last for determinism). One shuffle on
    the canonical URL; document bodies ride the shuffle only for kept
    candidates' rows — at 100 TB, project to (id, canonical) first and
    semi-join the winners back if bodies are heavy.
    """
    from dataproc_spark.core import ensure_no_columns

    order_by = order_by or ["doc_id"]
    ensure_no_columns(df, ("_canon", "_rn", "canonical_url"),
                      "dedup_by_url")
    # asc_nulls_last, not asc: Spark's default ascending order puts
    # NULLS FIRST, so a NULL-keyed row (e.g. an unscored document) would
    # beat every real row — the opposite of "preferring rows by
    # order_by", and the opposite of the DuckDB oracle's ASC default.
    # NULL-URL rows are NOT duplicates of each other: the window would
    # put every NULL canonical key in ONE partition and keep a single
    # row (silently destroying unrelated unfetched-URL docs — r8
    # follow-up review finding), so they each partition alone on the
    # last order_by column (documented: pass a unique id last).
    w = Window.partitionBy(
        "_canon",
        F.when(F.col("_canon").isNull(), F.col(order_by[-1])),
    ).orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return (
        df.withColumn("_canon", canonical_url(url_col))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("_canon", "canonical_url")
    )


def cap_per_domain(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    order_by: list[str] | None = None,
    salts: int = 0,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, preferring rows by
    ``order_by`` (ascending, with the final column as the deterministic
    tie-break — pass a unique id last or ties are nondeterministic).

    ``salts > 0`` enables the two-phase skew guard: phase 1 caps within
    ``(domain, hash(id-ish order key) % salts)`` so no window partition
    exceeds its raw share of one salt bucket, phase 2 applies the exact
    cap over the ≤ ``cap × salts`` survivors per domain. The result is
    identical to the single-phase cap (phase 1 only ever discards rows
    ranked > cap within a subset of the domain, which the exact cap
    would also discard — keeping the best ``cap`` per salt bucket is a
    superset of the global best ``cap``).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from dataproc_spark.core import ensure_no_columns

    order_by = order_by or ["doc_id"]
    ensure_no_columns(df, ("_salt", "_rn1", "_rn"), "cap_per_domain")
    # NULLS LAST for the same reason as dedup_by_url: NULL-quality docs
    # must not win the cap over scored ones
    order_cols = [F.col(c).asc_nulls_last() for c in order_by]
    # rows with a NULL domain (unparseable/missing URL) do not belong to
    # any COMMON domain — capping them as one would silently drop
    # unrelated documents (r8 follow-up review finding); each partitions
    # alone on the last order_by column (documented: pass a unique id
    # last) and so always survives the cap
    null_key = F.when(F.col(domain_col).isNull(), F.col(order_by[-1]))
    if salts and salts > 1:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_by]), F.lit(salts))
        df = (
            df.withColumn("_salt", salt)
            .withColumn("_rn1", F.row_number().over(
                Window.partitionBy(domain_col, null_key, "_salt")
                .orderBy(*order_cols)
            ))
            .where(F.col("_rn1") <= cap)
            .drop("_salt", "_rn1")
        )
    w = Window.partitionBy(domain_col, null_key).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def domain_mixture(
    df: DataFrame,
    domain_col: str = "domain",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-domain mixture report: document count, total weight (e.g.
    token count; defaults to doc count), and the domain's share of the
    corpus in integer **basis points** (``weight * 10000 div total``) —
    integer arithmetic so the report is bit-stable across engines.

    One map-side-combined shuffle for the per-domain aggregate; the
    denominator is a single-row aggregate cross-broadcast back onto the
    (small: one row per domain) report frame — never a global window
    over one partition.
    """
    w = (
        F.sum(F.col(weight_col)).cast("long")
        if weight_col
        else F.count(F.lit(1)).cast("long")
    )
    per = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        w.alias("weight"),
    )
    total = per.agg(F.sum("weight").cast("long").alias("_total"))
    return (
        per.join(F.broadcast(total))
        .withColumn(
            # integer DIV, not float division + cast: float rounding is
            # the one thing that could make two engines disagree here
            # zero-total guard: ANSI Spark aborts on DIV 0 (an
            # all-empty-extraction corpus has total weight 0)
            "share_bps",
            F.expr(
                "CAST(CASE WHEN _total > 0 THEN (weight * 10000) DIV _total "
                "ELSE 0 END AS BIGINT)"
            ),
        )
        .drop("_total")
    )


#: fixed entity set decoded by :func:`extract_text` — ``&amp;`` LAST so
#: double-escaped text can't cascade into a decoded ``&lt;`` becoming a
#: strippable tag (decode happens only after tags are gone anyway)
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def extract_text(html_col: str | Column = "html") -> Column:
    """Plain text from an HTML document: comments, ``<script>``/
    ``<style>`` blocks (content and all), then every remaining tag are
    replaced by spaces; the fixed :data:`HTML_ENTITIES` set is decoded
    AFTER tag removal (so ``&lt;script&gt;`` in user text never becomes
    a strippable tag); runs of ASCII whitespace collapse to one space.

    The WET-extraction step of a crawl pipeline as a pure
    ``regexp_replace``/``replace`` chain — map-only, whole-stage
    codegen, RE2-portable (no backreferences: script and style get
    separate patterns; no lookaround; explicit ``[ \\t\\r\\n]`` class
    because Java's ``\\s`` and RE2's disagree on vertical tab). A
    production boilerplate model (content-block classification) is a
    downstream scorer over these extractions, not a replacement for
    this pass.
    """
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    c = _strip_nontext(c)
    c = _clean_fragment(c)
    return c


def _strip_nontext(c: Column) -> Column:
    """Comments and ``<script>``/``<style>`` blocks (content and all)
    replaced by spaces — the shared preamble of :func:`extract_text`
    and :func:`extract_main_text`."""
    c = F.regexp_replace(c, r"(?is)<!--.*?-->", " ")
    # name boundary: `<script[^>]*>` also matched custom elements whose
    # NAME merely starts with script/style (<style-guide>) and then ate
    # everything to the next real closer — silent content loss (r8
    # follow-up review finding). `(?:\s[^>]*)?` keeps it RE2-portable.
    c = F.regexp_replace(c, r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style(?:\s[^>]*)?>.*?</style\s*>", " ")
    return c


def _clean_fragment(c: Column) -> Column:
    """Tag-strip + entity-decode + whitespace-collapse of an HTML
    fragment (no comment/script handling — callers apply
    :func:`_strip_nontext` first)."""
    c = F.regexp_replace(c, r"(?is)<[^>]+>", " ")
    for entity, repl in HTML_ENTITIES:
        c = F.replace(c, F.lit(entity), F.lit(repl))
    c = F.regexp_replace(c, r"[ \t\r\n]+", " ")
    return F.trim(c)


#: block-level elements whose open/close tags delimit text blocks for
#: the density filter; inline markup (a, span, b, em, …) stays inside
#: its block. Shared with the DuckDB oracle.
BLOCK_TAGS = (
    "div", "p", "h[1-6]", "li", "ul", "ol", "dl", "dt", "dd",
    "table", "thead", "tbody", "tr", "td", "th",
    "nav", "footer", "header", "aside", "section", "article", "main",
    "blockquote", "br", "hr", "form", "fieldset", "figure", "figcaption",
)

#: split pattern: any open/close/self-closing block tag (RE2-portable —
#: no lookaround, inline (?i) only)
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:" + "|".join(BLOCK_TAGS) + r")(?:\s[^>]*)?/?>"
)

#: a complete inline anchor (text between <a ...> and </a>); dangling
#: anchors cut by a block boundary lose their tag to the generic strip
#: and count as plain text — deterministic on both engines
ANCHOR_SPAN_RE = r"(?is)<a(?:\s[^>]*)?>.*?</a\s*>"


def extract_main_text(
    html_col: str | Column = "html",
    min_chars: int = 30,
    max_link_pct: int = 33,
) -> Column:
    """Block-level boilerplate removal (the curation standard beyond
    WET-style tag-strip): split the document into text blocks at
    block-element boundaries (:data:`BLOCK_TAGS`), score each block by
    cleaned text length and **link density** (share of characters that
    came from inside ``<a>`` anchors), and keep only blocks with at
    least ``min_chars`` characters and at most ``max_link_pct`` percent
    link text. Navigation bars, footers, sidebars, and related-links
    lists are short and/or link-dominated, so they drop; paragraphs of
    running text survive. Kept blocks re-join with single spaces.

    Link density is defined subtractively and integer-exactly:
    ``link_len = len(clean(block)) - len(clean(block minus anchor
    spans))`` with the keep rule ``link_len * 100 <= max_link_pct *
    text_len`` — no floats, so the rule is bit-stable across engines.

    Plan: the entire pass is ONE projection — ``split`` into a block
    array, higher-order ``transform``/``filter`` with the same
    regexp/entity chain as :func:`extract_text` inside the lambda,
    ``array_join`` — map-only, zero shuffles, no explode/regroup, and
    RE2-portable so the DuckDB oracle replays it list-for-list. This is
    the deterministic core of a trafilatura-style extractor; a learned
    block classifier would replace the keep RULE, not the plan shape.

    NULL html yields NULL (not ``''``) — callers decide whether an
    unfetched page is an empty document or a quarantined row, the same
    contract as :func:`host_of`.
    """
    if min_chars < 1 or not (0 <= max_link_pct <= 100):
        raise ValueError(
            f"min_chars must be >= 1 and max_link_pct in 0..100, got "
            f"{min_chars}, {max_link_pct}"
        )
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    blocks = F.split(_strip_nontext(c), BLOCK_SPLIT_RE)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _clean_fragment(b).alias("t"),
            _clean_fragment(
                F.regexp_replace(b, ANCHOR_SPAN_RE, " ")
            ).alias("nl"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["t"]) >= min_chars)
        & (
            (F.length(s["t"]) - F.length(s["nl"])) * 100
            <= max_link_pct * F.length(s["t"])
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["t"]), " ")


# ---------------------------------------------------------------------------
# HTML entity unescape (r11)
# ---------------------------------------------------------------------------

#: the common named entities, ordered so that ``&amp;`` is LAST: the
#: HTML double-escape ``&amp;lt;`` must yield the literal ``&lt;``,
#: which only happens when every other entity is replaced before the
#: ampersand itself (html.unescape's semantics, reproduced by chain
#: order). Public knowledge: the HTML5 named character references.
HTML_ENTITIES_FAST: tuple = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&#39;", "'"), ("&#34;", '"'), ("&nbsp;", " "),
    ("&mdash;", "—"), ("&ndash;", "–"),
    ("&hellip;", "…"), ("&middot;", "·"),
    ("&copy;", "©"), ("&reg;", "®"), ("&trade;", "™"),
    ("&laquo;", "«"), ("&raquo;", "»"),
    ("&lsquo;", "‘"), ("&rsquo;", "’"),
    ("&ldquo;", "“"), ("&rdquo;", "”"),
    ("&eacute;", "é"), ("&egrave;", "è"),
    ("&auml;", "ä"), ("&ouml;", "ö"), ("&uuml;", "ü"),
    ("&szlig;", "ß"), ("&ccedil;", "ç"),
    ("&amp;", "&"),  # MUST stay last
)


def unescape_html(col, mode: str = "fast"):
    """Column expression: decode HTML character references in extracted
    text — the cleanup pass that belongs right after
    :func:`extract_main_text` (real page text is full of ``&amp;`` /
    ``&#39;`` / ``&nbsp;``, and a tokenizer or lang-ID profile fed raw
    entities scores garbage).

    ``mode='fast'`` (default) is a pure JVM chain of literal
    ``replace`` calls over :data:`HTML_ENTITIES_FAST` — the ~30
    entities that dominate real web text (plus the two numeric forms of
    the quote characters), zero Python, whole-stage-codegen friendly.
    It leaves unknown/rare references untouched (visible, never
    corrupted) and preserves double-escape semantics (``&amp;lt;`` →
    ``&lt;``) because ``&amp;`` replaces last.

    ``mode='full'`` runs the COMPLETE HTML5 table including all
    numeric (``&#1087;``) and hex (``&#x43F;``) forms via the stdlib
    ``html.unescape`` in an Arrow pandas UDF — use it when the corpus
    is entity-heavy enough to justify the Python stage; the two modes
    agree exactly on the fast subset (unit-tested)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    if mode == "fast":
        for ent, ch in HTML_ENTITIES_FAST:
            c = F.replace(c, F.lit(ent), F.lit(ch))
        return c
    if mode != "full":
        raise ValueError(f"mode must be 'fast' or 'full', got {mode!r}")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _kernel(s):
        import html

        return s.map(lambda v: None if v is None else html.unescape(v))

    _kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_kernel, StringType())(c)


# ---------------------------------------------------------------------------
# robots.txt crawl filtering (r11)
# ---------------------------------------------------------------------------

def robots_like_pattern(path_rule: str) -> tuple:
    """Translate an RFC 9309 path rule into a SQL ``LIKE`` pattern and
    its specificity: ``*`` becomes ``%``, a trailing ``$`` anchors the
    end (no trailing ``%``), LIKE metacharacters in the rule are
    escaped, and specificity is the rule's FULL octet length —
    wildcards and the ``$`` anchor included, matching RFC 9309's "most
    octets" measure as Google's reference parser applies it (rule
    ``pattern.length()``). An earlier draft excluded ``*``/``$`` from
    the count, which flipped ``Allow: /p*`` vs ``Disallow: /pa`` on
    path ``/pa``: the reference ties them (Allow wins), the stripped
    count blocked (r11 advice finding). Returns
    ``(like_pattern, specificity)``."""
    anchored = path_rule.endswith("$")
    core = path_rule[:-1] if anchored else path_rule
    pat = (
        core.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        .replace("*", "%")
    )
    if not anchored:
        pat += "%"
    # OCTET length, not character count: Google's parser ranks by byte
    # length, so a non-ASCII rule ('/café' = 6 octets, 5 chars) must
    # score its UTF-8 size (r12 review finding)
    return pat, len(path_rule.encode("utf-8"))


def _parse_robots_group(text: str, agent: str):
    """Scan a robots.txt and return the SELECTED group's body for
    ``agent`` as ``(rules, crawl_delay, request_rate)`` — the shared
    core of :func:`parse_robots` (path rules) and the r13 politeness
    surfaces (``Crawl-delay``/``Request-rate``, the de-facto frontier-
    scheduling directives RFC 9309 leaves as other-records). Group
    selection follows the RFC: the group whose ``User-agent`` token is
    the longest case-insensitive substring of ``agent`` wins; ``*`` is
    the fallback; groups sharing a token MERGE (§2.2.1). Any known
    in-group directive (allow/disallow/crawl-delay/request-rate)
    starts the group body; unknown directives and comments are
    ignored. The FIRST parseable crawl-delay (a non-negative number,
    seconds) per merged group wins; request-rate is surfaced verbatim
    (its ``n/m[ window]`` forms vary too much to normalize here)."""
    groups: list = []  # (agents, rules, delays, rates)
    cur_agents: list = []
    cur_rules: list = []
    cur_delays: list = []
    cur_rates: list = []
    in_group_body = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules, cur_delays, cur_rates))
                cur_agents, cur_rules = [], []
                cur_delays, cur_rates = [], []
                in_group_body = False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                cur_rules.append((key == "allow", val))
        elif key == "crawl-delay":
            in_group_body = True
            try:
                d = float(val)
            except ValueError:
                continue
            if d >= 0 and d == d and d != float("inf"):  # finite, >= 0
                cur_delays.append(d)
        elif key == "request-rate":
            in_group_body = True
            if val:
                cur_rates.append(val)
    if cur_agents:
        groups.append((cur_agents, cur_rules, cur_delays, cur_rates))
    agent = (agent or "*").lower()
    # RFC 9309 §2.2.1: groups sharing a user-agent token MUST merge —
    # real robots.txt files routinely repeat 'User-agent: *' blocks
    # (CMS plugins append their own), and taking only the first group
    # silently dropped every later rule (r11 second-review finding).
    merged: dict = {}  # token -> (rules, delays, rates), file order
    for agents, rules, delays, rates in groups:
        for a in agents:
            slot = merged.setdefault(a, ([], [], []))
            slot[0].extend(rules)
            slot[1].extend(delays)
            slot[2].extend(rates)
    best: tuple = (-1, ([], [], []))  # (match length, body)
    for a, body in merged.items():
        if a == "*":
            score = 0
        elif a and a in agent:
            score = len(a)
        else:
            continue
        if score > best[0]:
            best = (score, body)
    rules, delays, rates = best[1]
    return (
        rules,
        delays[0] if delays else None,
        rates[0] if rates else None,
    )


def parse_robots(text: str, agent: str = "*") -> list:
    """Parse a robots.txt (RFC 9309-lite) and return the rule list for
    ``agent`` as ``(allow, like_pattern, specificity)`` tuples sorted
    by priority (longest match first; on a specificity tie Allow wins —
    the RFC's evaluation order, pre-applied so a matcher just takes the
    first hit). Group selection follows the RFC (see
    :func:`_parse_robots_group`); an empty ``Disallow:`` value is a
    no-op (the classic allow-all idiom)."""
    rules, _, _ = _parse_robots_group(text, agent)
    out = [
        (allow,) + robots_like_pattern(rule) for allow, rule in rules
    ]
    # priority order: longest specificity first, Allow before Disallow
    # on ties — a matcher takes the FIRST matching entry
    out.sort(key=lambda r: (-r[2], not r[0]))
    return out


def robots_crawl_delay(text: str, agent: str = "*"):
    """The effective ``Crawl-delay`` (seconds, float) for ``agent`` —
    the frontier scheduler's per-host politeness knob, selected with
    the SAME group rules as :func:`parse_robots` (r12 verdict item 5:
    the parser ignored it as an unknown directive). ``None`` when the
    selected group declares none or the value doesn't parse as a
    finite non-negative number."""
    _, delay, _ = _parse_robots_group(text, agent)
    return delay


def robots_request_rate(text: str, agent: str = "*"):
    """The ``Request-rate`` declaration for ``agent``, verbatim
    (typically ``n/m`` = n requests per m seconds, sometimes with a
    time window suffix — too divergent in the wild to normalize here;
    the scheduler interprets). ``None`` when undeclared."""
    _, _, rate = _parse_robots_group(text, agent)
    return rate


def robots_sitemaps(text_col: str | Column = "robots_txt") -> Column:
    """The ``Sitemap:`` URLs declared in a robots.txt — the standard
    sitemap-DISCOVERY mechanism (a sitemaps.org cross-submission
    extension every major crawler honors; RFC 9309 treats it as an
    ignorable other-record, so :func:`parse_robots` skips it and this
    operator surfaces it). Returns an ``array<string>`` of the
    declared URLs in file order: the directive is case-insensitive,
    lives OUTSIDE user-agent groups (global), the value is the FIRST
    whitespace-delimited token after the colon (lenient-crawler
    recovery — a malformed ``Sitemap: <url> extra`` line yields the
    URL rather than nothing; r12 advice finding, matching how
    :func:`parse_robots` recovers values), and ``#`` comments are
    stripped first — so a literal ``#`` in a sitemap URL truncates
    there, the RFC-consistent reading (a sitemap URL never needs a
    fragment). Feed the exploded result
    through :func:`sitemap_entries` (after fetching) to seed the
    frontier: robots → sitemaps → entries is the standard discovery
    chain.

    Pure built-in expression: comment strip → per-line regexp scan via
    a higher-order transform → NULL-compaction. Map-only, zero
    shuffles, RE2-portable pattern."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.split(F.coalesce(c, F.lit("")), "\n")
    urls = F.transform(
        lines,
        lambda l: F.regexp_extract(
            F.regexp_replace(l, "#.*$", ""),
            r"(?i)^\s*sitemap\s*:\s*(\S+)",
            1,
        ),
    )
    return F.filter(urls, lambda u: u != "")


#: rules attached per host by :func:`robots_rules_frame`
ROBOTS_RULES_TYPE = (
    "array<struct<allow:boolean,pat:string,spec:int>>"
)


def robots_rules_frame(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
    dedup_texts: bool = True,
    with_politeness: bool = False,
) -> DataFrame:
    """(host, robots.txt text) → (host, priority-sorted rule array) —
    the tiny dimension side of crawl filtering, parsed in an Arrow
    kernel (robots files are small and hosts number in the millions at
    worst, vs billions of URLs).

    ``dedup_texts`` (default on, r13 — r12 verdict finding): identical
    robots bodies across hosts (CDN-hosted subdomains serve one file
    to thousands of hosts) parse ONCE — the kernel runs over DISTINCT
    texts and the result re-joins to hosts by text equality
    (NULL-safe), bounding parse work by distinct files instead of
    hosts. Two extra dimension-side shuffles (distinct + re-join),
    zero change to the URL side.

    ``with_politeness`` adds ``crawl_delay`` (double seconds,
    :func:`robots_crawl_delay`) and ``request_rate`` (verbatim string,
    :func:`robots_request_rate`) columns — the frontier-scheduling
    directives, selected with the same agent-group rules."""
    from dataproc_spark.core import ensure_has_columns, ensure_no_columns

    ensure_has_columns(robots, [host_col, text_col])
    # internal scratch names must not collide with caller columns
    # (r13 advice: a robots frame already carrying '_txt'/'_p' would
    # hit an ambiguous-column error or a silently wrong re-join)
    ensure_no_columns(robots, ["_txt", "_p"], "robots_rules_frame")
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType, BooleanType, DoubleType, IntegerType, StringType,
        StructField, StructType,
    )

    rules_t = ArrayType(StructType([
        StructField("allow", BooleanType()),
        StructField("pat", StringType()),
        StructField("spec", IntegerType()),
    ]))
    fields = [StructField("rules", rules_t)]
    if with_politeness:
        fields += [
            StructField("crawl_delay", DoubleType()),
            StructField("request_rate", StringType()),
        ]
    ptype = StructType(fields)

    def _kernel(txt):
        cols: dict = {c: [] for c in
                      ["rules"] + (["crawl_delay", "request_rate"]
                                   if with_politeness else [])}
        for t in txt:
            if t is None:
                for v in cols.values():
                    v.append(None)
                continue
            cols["rules"].append(parse_robots(t, agent))
            if with_politeness:
                _, delay, rate = _parse_robots_group(t, agent)
                cols["crawl_delay"].append(delay)
                cols["request_rate"].append(rate)
        df = pd.DataFrame(cols, dtype=object)
        if with_politeness:
            df["crawl_delay"] = df["crawl_delay"].astype("float64")
        return df

    _kernel.__annotations__ = {"txt": pd.Series, "return": pd.DataFrame}
    udf = pandas_udf(_kernel, ptype)
    extra = ["crawl_delay", "request_rate"] if with_politeness else []
    if not dedup_texts:
        parsed = robots.select(
            F.col(host_col).alias("host"),
            udf(F.col(text_col)).alias("_p"),
        )
        return parsed.select(
            "host", F.col("_p.rules").alias("rules"),
            *[F.col(f"_p.{c}").alias(c) for c in extra],
        )
    texts = robots.select(F.col(text_col).alias("_txt")).distinct()
    parsed = texts.select("_txt", udf(F.col("_txt")).alias("_p"))
    # NULL-safe equality: hosts with a NULL robots body must keep their
    # (NULL-rules) row, not fall out of an equi-join
    joined = robots.join(
        parsed, F.col(text_col).eqNullSafe(F.col("_txt")), "left"
    )
    return joined.select(
        F.col(host_col).alias("host"),
        F.col("_p.rules").alias("rules"),
        *[F.col(f"_p.{c}").alias(c) for c in extra],
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    out_col: str = "allowed",
) -> DataFrame:
    """Crawl-politeness filter: mark each URL allowed/blocked under its
    host's robots rules (:func:`robots_rules_frame` output). Matching
    is RFC 9309 longest-match over the URL *path* (query excluded),
    Allow winning specificity ties; a host with no rules (or no robots
    row at all) defaults to allowed — the crawl-world default.

    100 TB plan: the rules side is per-HOST and broadcast; the winner
    is picked by a higher-order ``filter`` + ``get(0)`` over the
    pre-sorted rule array — so the URL side is MAP-ONLY: no shuffle,
    no per-URL aggregation, no window. The only cost scaling with the
    corpus is one broadcast-hash-join probe and an array walk whose
    length is the host's rule count."""
    from pyspark.sql import functions as F

    # RFC 9309 §2.2.2: an empty path is matched as '/' — a frontier URL
    # like 'https://host.com' (no trailing slash) must NOT bypass a
    # block-all 'Disallow: /'; scheme matching is case-insensitive for
    # the same reason (r11 second-review finding). Unparseable URLs
    # also fall back to '/', the conservative side of a politeness
    # filter.
    raw_path = F.regexp_extract(
        F.col(url_col),
        r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+([^?#]*)",
        1,
    )
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    joined = urls.join(F.broadcast(rules), on=host_col, how="left")
    matches = F.filter(
        F.coalesce(F.col("rules"), F.expr(f"CAST(array() AS {ROBOTS_RULES_TYPE})")),
        lambda r: F.like(path, r["pat"], F.lit("\\")),
    )
    winner = F.get(matches, 0)
    return joined.withColumn(
        out_col, F.coalesce(winner["allow"], F.lit(True))
    ).drop("rules")


def frontier_schedule(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    order_by: list[str] | None = None,
    default_delay: float = 1.0,
) -> DataFrame:
    """Politeness-aware frontier scheduling: the step between "these
    URLs are allowed" (:func:`robots_allowed`) and "fetch them" — a
    crawler must space same-host requests by the host's
    ``Crawl-delay``. Joins each URL's host to its delay (the
    ``robots_rules_frame(with_politeness=True)`` frame; hosts with no
    row or a NULL delay get ``default_delay`` seconds), ranks URLs
    within each host by ``order_by`` (ascending, NULLS LAST — pass a
    unique id last for determinism, the :func:`cap_per_domain`
    contract), and emits:

    - ``fetch_seq`` — 0-based fetch position within the host;
    - ``delay_ms`` — the host's effective delay in integer
      milliseconds (exact across engines — no float offsets);
    - ``fetch_offset_ms`` — ``fetch_seq * delay_ms``, the earliest
      politeness-legal start relative to the host's first fetch.

    ``rules`` must be ONE row per host (the
    :func:`robots_rules_frame` contract) — a duplicate host row would
    fan the join out and corrupt every sequence, the same precondition
    as every id-keyed operator here. NULL-host rows (unparseable
    URLs) do NOT share one politeness sequence: each schedules alone
    at ``fetch_seq 0`` (partitioned on the last ``order_by`` column,
    the :func:`dedup_by_url` NULL rule) — quarantining them upstream
    is still the right pipeline, but a stray row must not serialize a
    million unrelated fetches behind one fake host.

    100 TB plan: ONE broadcast join (the rules side is per-host) +
    ONE window shuffle on the host. A mega-host is the skew case and
    CANNOT be salted here (the sequence is inherently global per
    host) — run :func:`cap_per_domain` first, which is what a real
    frontier does anyway (a host contributing 10^7 URLs at delay 1 s
    would take months to drain regardless of the engine)."""
    from dataproc_spark.core import ensure_has_columns, ensure_no_columns

    order_by = order_by or ["url"]
    ensure_has_columns(rules, [host_col, "crawl_delay"])
    ensure_no_columns(
        urls, ("fetch_seq", "delay_ms", "fetch_offset_ms", "crawl_delay"),
        "frontier_schedule",
    )
    pol = rules.select(host_col, "crawl_delay")
    joined = urls.join(F.broadcast(pol), on=host_col, how="left")
    delay_ms = F.round(
        F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay)))
        * 1000
    ).cast("long")
    null_key = F.when(F.col(host_col).isNull(), F.col(order_by[-1]))
    w = Window.partitionBy(host_col, null_key).orderBy(
        *[F.col(c).asc_nulls_last() for c in order_by]
    )
    return (
        joined.withColumn("fetch_seq",
                          (F.row_number().over(w) - 1).cast("long"))
        .withColumn("delay_ms", delay_ms)
        .withColumn("fetch_offset_ms",
                    (F.col("fetch_seq") * F.col("delay_ms")).cast("long"))
        .drop("crawl_delay")
    )


#: rel tokens that exclude an edge from "followed" link-graph rollups —
#: the HTML spec's link-type tokens search engines discount
#: (rel is a space-separated token LIST, so matching is per token,
#: never substring: rel="nofollowme" must not match)
NOFOLLOW_REL_TOKENS = ("nofollow", "sponsored", "ugc")


def host_link_graph(
    links: DataFrame,
    url_col: str = "url",
    link_col: str = "link_url",
    rel_col: str = "rel",
    drop_rel: tuple = NOFOLLOW_REL_TOKENS,
    include_self: bool = False,
) -> DataFrame:
    """Roll an :func:`extract_links` edge list up to the HOST graph —
    the aggregation every crawl-scale ranking (PageRank over hosts,
    spam neighborhoods, frontier prioritization) actually consumes:
    one row per (src_host, dst_host) with ``n_links`` (all edges) and
    ``n_followed`` (edges whose ``rel`` carries none of ``drop_rel``
    — token-exact over the space-separated rel list, case-insensitive;
    a missing rel follows). Rows whose either host fails to parse are
    dropped (an edge with no endpoint identity), as are same-host
    self edges unless ``include_self``.

    100 TB plan: host extraction is the map-only ``host_of``
    projection; the ONE shuffle is the (src_host, dst_host) aggregate
    with map-side combine — it carries host pairs and two counters,
    never pages. Feed the result straight to
    :func:`...graph.pagerank` (``n_followed`` as the weight)."""
    src_h = host_of(url_col)
    dst_h = host_of(link_col)
    rel = F.lower(F.coalesce(
        F.col(rel_col) if isinstance(rel_col, str) else rel_col, F.lit("")
    ))
    tokens = F.split(rel, r"\s+")
    flagged = F.exists(
        tokens, lambda t: t.isin(*[x.lower() for x in drop_rel])
    )
    out = links.select(
        src_h.alias("src_host"),
        dst_h.alias("dst_host"),
        (~flagged).cast("long").alias("_follow"),
    ).where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if not include_self:
        out = out.where(F.col("src_host") != F.col("dst_host"))
    return out.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.sum("_follow").cast("long").alias("n_followed"),
    )


def anchor_text_rollup(
    links: DataFrame,
    url_col: str = "link_url",
    text_col: str = "anchor_text",
    rel_col: str = "rel",
    k: int = 3,
    drop_rel: tuple = NOFOLLOW_REL_TOKENS,
    max_text_len: int | None = None,
) -> DataFrame:
    """Aggregate INBOUND anchor text per link target — the classic
    web-corpus ranking/summarization signal (the anchor words other
    pages use to describe a URL): one row per ``link_url`` with

    - ``n_links`` — inbound edges kept (after the rel spam filter);
    - ``n_anchored`` — kept edges that carried visible anchor text;
    - ``top_anchors`` — the ``k`` most frequent distinct anchor texts
      as ``array<struct<anchor_text,n>>``, ordered by count DESC then
      text ASC (the deterministic tie-break the oracle replays).

    Edges whose ``rel`` carries any ``drop_rel`` token (token-exact
    over the space-separated list, case-insensitive — the
    :func:`host_link_graph` rule) are excluded entirely: nofollow/
    sponsored/ugc anchors are exactly the spam text this signal must
    not learn from. ``max_text_len`` truncates texts BEFORE counting
    (a shuffle-row bound for corpora with pathological anchors); NULL
    disables.

    100 TB plan: two shuffles. (1) ``groupBy(link_url, text)`` with
    map-side combine — rows carry (url, short text, count), never
    pages; heavy targets (a homepage linked from everywhere) are
    already collapsed per distinct text by the combine. (2) a
    ``link_url`` window ranks texts then the final ``groupBy`` reuses
    the window's hash partitioning (no third exchange). A target with
    millions of DISTINCT texts is the residual skew case — AQE splits
    it, and ``max_text_len`` collapses the long tail first."""
    from pyspark.sql import Window

    from dataproc_spark.core import ensure_has_columns

    ensure_has_columns(links, [url_col, text_col, rel_col])
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rel = F.lower(F.coalesce(F.col(rel_col), F.lit("")))
    flagged = F.exists(
        F.split(rel, r"\s+"),
        lambda t: t.isin(*[x.lower() for x in drop_rel]),
    )
    text = F.col(text_col)
    if max_text_len is not None:
        text = F.substring(text, 1, max_text_len)
    pair = (
        links.where(~flagged)
        .select(F.col(url_col).alias("link_url"), text.alias("_t"))
        .groupBy("link_url", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    w = Window.partitionBy("link_url").orderBy(
        F.col("_t").isNull().asc(),  # NULL-text group ranks last
        F.col("_n").desc(), F.col("_t").asc(),
    )
    ranked = pair.withColumn("_rk", F.row_number().over(w))
    return ranked.groupBy("link_url").agg(
        F.sum("_n").cast("long").alias("n_links"),
        F.coalesce(
            F.sum(F.when(F.col("_t").isNotNull(), F.col("_n"))), F.lit(0)
        ).cast("long").alias("n_anchored"),
        F.transform(
            F.array_sort(F.collect_list(F.when(
                F.col("_t").isNotNull() & (F.col("_rk") <= k),
                F.struct(F.col("_rk").alias("rk"),
                         F.col("_t").alias("anchor_text"),
                         F.col("_n").alias("n")),
            ))),
            lambda s: F.struct(
                s["anchor_text"].alias("anchor_text"), s["n"].alias("n")
            ),
        ).alias("top_anchors"),
    )


# ---------------------------------------------------------------------------
# HTTP redirect-chain resolution (r13) — the capture-graph walk
# ---------------------------------------------------------------------------

#: the HTTP statuses that redirect with a Location header (RFC 9110
#: §15.4; 300/304 have no mandatory Location and never chain)
REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def header_value(
    headers_col: str | Column, name: str
) -> Column:
    """First value of HTTP header ``name`` in an ``http_headers`` map
    (``split_http_envelope`` lowercases keys and joins repeats; the
    lookup re-lowers entry keys so caller-built maps with canonical
    casing also hit). NULL when the header — or the map — is absent.
    Map-only."""
    c = F.col(headers_col) if isinstance(headers_col, str) else headers_col
    hits = F.filter(
        F.map_entries(c), lambda e: F.lower(e["key"]) == name.lower()
    )
    return F.get(hits, 0)["value"]


def resolve_redirects(
    records: DataFrame,
    max_hops: int = 5,
    url_col: str = "target_uri",
    status_col: str = "http_status",
    headers_col: str = "http_headers",
    order_col: str = "warc_date",
) -> DataFrame:
    """Resolve HTTP redirect chains across a capture set — ~a quarter
    of real capture records are 3xx, and every consumer of the archive
    (URL dedup, PageRank edges, CDX lookup) wants the *final* URL a
    source actually lands on, not the hop. One output row per distinct
    capture URL:

    - ``source_url`` — the capture's own URL;
    - ``final_url`` — where the chain ends: the URL itself for a
      non-redirect capture, the last confirmed URL for ``ok``/
      ``truncated``, the first uncaptured target for ``external``,
      NULL for ``loop`` (a cycle has no final destination);
    - ``n_hops`` — redirect edges traversed (0 for non-redirects; for
      ``loop`` the edges confirmed-traversed before the revisit was
      detected — the closing edge is flagged, not walked);
    - ``resolution`` — ``'ok'`` (reached a captured non-redirect),
      ``'external'`` (chain leaves the capture set), ``'loop'``
      (a URL repeats within the chain), ``'truncated'`` (still
      redirecting after ``max_hops`` edges).

    A capture redirects when its status is one of
    :data:`REDIRECT_STATUSES` AND its envelope carries a ``Location``
    header (:func:`header_value`); the target is
    ``resolve_url(capture_url, location)`` — RFC 9110 §10.2.2 allows
    relative Locations, so the full RFC 3986 resolution applies.
    Duplicate captures of one URL dedup to the newest ``order_col``
    (``warc_date`` — ties by status/target, fully deterministic);
    NULL-``url`` rows are dropped (no identity to chain from).

    100 TB plan: the walk is ``max_hops`` equi-joins of the WALKING
    set (only still-unresolved chains — real chains are median 1 hop,
    so it shrinks geometrically) against a 3-narrow-column node table
    projected off the capture frame; bodies never enter the operator.
    ``localCheckpoint`` per round cuts the growing lineage (the
    :func:`...dedup.connected_components` pattern). Loop detection
    carries a per-chain visited array bounded by ``max_hops`` + 1
    URLs. No driver-side collection anywhere.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    loc = F.trim(header_value(headers_col, "location"))
    ordc = (
        F.col(order_col).cast("string")
        if order_col in records.columns
        else F.lit("")
    )
    raw = records.where(F.col(url_col).isNotNull()).select(
        F.col(url_col).alias("url"),
        F.col(status_col).cast("int").alias("_st"),
        F.when(loc == "", F.lit(None)).otherwise(loc).alias("_loc"),
        ordc.alias("_ord"),
    )
    w = Window.partitionBy("url").orderBy(
        F.col("_ord").desc_nulls_last(),
        F.col("_st").asc_nulls_last(),
        F.col("_loc").asc_nulls_last(),
    )
    # coalesce to false: a NULL status with a non-NULL Location (a
    # caller-built frame outside the envelope-split contract) makes
    # the conjunction NULL, and a NULL predicate fails BOTH ~redir and
    # redir filters — the row would silently vanish from the output
    # (r13 review finding)
    redir = F.coalesce(
        F.col("_st").isin(*REDIRECT_STATUSES) & F.col("_loc").isNotNull(),
        F.lit(False),
    )
    nodes = (
        raw.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "url",
            redir.alias("_redir"),
            F.when(redir, resolve_url(F.col("url"), F.col("_loc")))
            .alias("_next"),
        )
        .persist()
    )
    try:
        lookup = nodes.select(
            F.col("url").alias("_lu"),
            F.col("_redir").alias("_lu_redir"),
            F.col("_next").alias("_lu_next"),
        )
        parts = [
            nodes.where(~F.col("_redir")).select(
                F.col("url").alias("source_url"),
                F.col("url").alias("final_url"),
                F.lit(0).alias("n_hops"),
                F.lit("ok").alias("resolution"),
            )
        ]
        walking = nodes.where(F.col("_redir")).select(
            F.col("url").alias("source_url"),
            F.col("_next").alias("cur"),
            F.lit(1).alias("hops"),
            F.array(F.col("url")).alias("visited"),
        ).localCheckpoint()
        for _ in range(max_hops):
            if walking.isEmpty():
                break
            j = walking.join(
                lookup, walking.cur == F.col("_lu"), "left"
            ).localCheckpoint()
            parts.append(j.where(F.col("_lu").isNull()).select(
                "source_url",
                F.col("cur").alias("final_url"),
                F.col("hops").alias("n_hops"),
                F.lit("external").alias("resolution"),
            ))
            parts.append(
                j.where(F.col("_lu").isNotNull() & ~F.col("_lu_redir"))
                .select(
                    "source_url",
                    F.col("cur").alias("final_url"),
                    F.col("hops").alias("n_hops"),
                    F.lit("ok").alias("resolution"),
                )
            )
            looped = F.array_contains(
                F.col("visited"), F.col("_lu_next")
            ) | (F.col("_lu_next") == F.col("cur"))
            parts.append(
                j.where(F.col("_lu_redir") & looped).select(
                    "source_url",
                    F.lit(None).cast("string").alias("final_url"),
                    F.col("hops").alias("n_hops"),
                    F.lit("loop").alias("resolution"),
                )
            )
            parts.append(
                j.where(
                    F.col("_lu_redir") & ~looped
                    & (F.col("hops") >= max_hops)
                ).select(
                    "source_url",
                    F.col("cur").alias("final_url"),
                    F.col("hops").alias("n_hops"),
                    F.lit("truncated").alias("resolution"),
                )
            )
            walking = j.where(
                F.col("_lu_redir") & ~looped & (F.col("hops") < max_hops)
            ).select(
                "source_url",
                F.col("_lu_next").alias("cur"),
                (F.col("hops") + 1).alias("hops"),
                F.concat(F.col("visited"), F.array(F.col("cur")))
                .alias("visited"),
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # materialize before unpersisting the node table the lineage
        # reads through (checkpointed parts are already cut; the
        # zero-hop slice and `lookup` still reference `nodes`)
        return out.localCheckpoint()
    finally:
        nodes.unpersist()


# ---------------------------------------------------------------------------
# sitemap parsing (r12) — URL-frontier seeding
# ---------------------------------------------------------------------------

#: the five XML predefined characters with ALL their conforming escape
#: spellings — named, decimal (leading zeros legal), and hex (either
#: case) character references; a conforming generator emits them
#: interchangeably (r12 review finding: named-only left '&#38;' in
#: frontier URLs). Each character's forms are ONE alternation so one
#: regexp_replace pass decodes them together: the pass scans original
#: positions left-to-right, so '&amp;#38;' and '&#38;amp;' each decode
#: exactly once (the replacement is never rescanned). The ampersand
#: row stays LAST (the double-escape rule across characters).
_XML_ENTITY_PATTERNS = (
    (r"&lt;|&#0*60;|&#[xX]0*3[cC];", "<"),
    (r"&gt;|&#0*62;|&#[xX]0*3[eE];", ">"),
    (r"&quot;|&#0*34;|&#[xX]0*22;", '"'),
    (r"&apos;|&#0*39;|&#[xX]0*27;", "'"),
    (r"&amp;|&#0*38;|&#[xX]0*26;", "&"),
)


def _xml_unescape(c: Column) -> Column:
    """Decode the five XML specials in named AND numeric-reference form
    (:data:`_XML_ENTITY_PATTERNS` — one pass per character, ampersand
    last, each decoding exactly once). Other numeric references stay
    verbatim: a sitemap ``<loc>`` must be RFC-3986-encoded, so
    non-ASCII arrives %-escaped, never as a character reference."""
    for pat, ch in _XML_ENTITY_PATTERNS:
        c = F.regexp_replace(c, pat, ch)
    return c


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse sitemap XML (the sitemaps.org protocol) into one row per
    entry — the operator that seeds a crawl's URL frontier. Handles
    both document kinds: ``<urlset>`` pages (``kind='url'``, with
    ``loc``/``lastmod``/``changefreq``/``priority``) and
    ``<sitemapindex>`` pointers (``kind='sitemap'``, ``loc``/
    ``lastmod`` only — fetch-and-recurse is the caller's loop, the
    standard two-level shape). ``pos`` is the entry's 0-based position
    within its document, enumerated over url entries FIRST and then
    index pointers (the protocol says order carries no meaning, but a
    deterministic output needs one). Missing child tags are NULL;
    ``priority`` casts to double; ``<loc>`` values XML-unescape (the
    protocol REQUIRES ``&`` in URLs to arrive as ``&amp;``).

    Implementation is deliberately regex-structured rather than a DOM:
    sitemap files are machine-generated, schema-fixed XML (the
    protocol forbids arbitrary nesting), so non-greedy block extraction
    + per-block child extraction is exact for conforming files and
    engine-portable (the oracle replays it with RE2). Tag matches
    require a NAME BOUNDARY (``<url>`` or ``<url ...attrs>``) — a bare
    ``<url[^>]*>`` also eats ``<urlset>`` and swallows the first entry
    into a phantom block (caught in review; the fixture's shape made
    the two forms coincide). CDATA sections are out of scope (the
    protocol's own examples entity-escape).

    One map-only projection + ``posexplode`` — no shuffle, no UDF; at
    100 TB the frontier seed is a scan-shaped job like every other
    map stage here. Input rows with no parseable entries produce no
    output rows (a malformed sitemap seeds nothing; count inputs vs
    outputs to quarantine).
    """
    # clear error instead of an AMBIGUOUS_REFERENCE AnalysisException
    # at the final select — the documented fetch-and-recurse loop hits
    # this if a prior pass's columns are fed back unselected (r12
    # review finding)
    from dataproc_spark.core import ensure_no_columns

    ensure_no_columns(
        df,
        ("pos", "kind", "loc", "lastmod", "changefreq", "priority",
         "_entry"),
        "sitemap_entries",
    )
    xml = F.coalesce(
        F.col(xml_col) if isinstance(xml_col, str) else xml_col,
        F.lit(""),
    )
    others = [c for c in df.columns]

    def _blocks(tag: str) -> Column:
        return F.regexp_extract_all(
            xml, F.lit(f"(?s)<{tag}(?:\\s[^>]*)?>(.*?)</{tag}>"),
            F.lit(1)
        )

    def _child(b: Column, tag: str) -> Column:
        got = F.regexp_extract(
            b, f"(?s)<{tag}(?:\\s[^>]*)?>\\s*(.*?)\\s*</{tag}>", 1
        )
        return F.when(got == "", F.lit(None)).otherwise(
            _xml_unescape(got)
        )

    entries = F.concat(
        F.transform(
            _blocks("url"),
            lambda b: F.struct(
                F.lit("url").alias("kind"),
                _child(b, "loc").alias("loc"),
                _child(b, "lastmod").alias("lastmod"),
                _child(b, "changefreq").alias("changefreq"),
                _child(b, "priority").cast("double").alias("priority"),
            ),
        ),
        F.transform(
            _blocks("sitemap"),
            lambda b: F.struct(
                F.lit("sitemap").alias("kind"),
                _child(b, "loc").alias("loc"),
                _child(b, "lastmod").alias("lastmod"),
                F.lit(None).cast("string").alias("changefreq"),
                F.lit(None).cast("double").alias("priority"),
            ),
        ),
    )
    ex = df.select(
        *others, F.posexplode(entries).alias("pos", "_entry")
    )
    return ex.select(
        *others, "pos",
        F.col("_entry.kind").alias("kind"),
        F.col("_entry.loc").alias("loc"),
        F.col("_entry.lastmod").alias("lastmod"),
        F.col("_entry.changefreq").alias("changefreq"),
        F.col("_entry.priority").alias("priority"),
    )


def expand_sitemaps(
    fetched: DataFrame,
    url_col: str = "url",
    xml_col: str = "sitemap_xml",
    max_depth: int = 3,
    roots: DataFrame | None = None,
) -> DataFrame:
    """Materialize the sitemap TREE over a frame of fetched sitemap
    bodies — the recursion :func:`sitemap_entries` documents as "the
    caller's loop", made an operator (r13): each seed — ``roots`` (a
    one-column frame of URLs, e.g. the :func:`robots_sitemaps`
    discoveries; default: every fetched URL) — starts a walk;
    ``<urlset>`` entries emit page rows, ``<sitemapindex>`` pointers
    join back to ``fetched`` by URL and recurse to ``max_depth``. One
    output row per discovery:

    - ``root_url`` — the seed sitemap the entry descends from;
    - ``source_url`` — the sitemap that directly lists it;
    - ``depth`` — pointer hops below the seed (0 = listed by the seed);
    - ``loc``/``lastmod``/``changefreq``/``priority`` — the entry
      (:func:`sitemap_entries` fields) for ``status='ok'`` page rows;
    - ``status`` — ``'ok'`` (a page URL), ``'missing'`` (a pointer to
      a sitemap with no fetched body — the caller's fetch list), or
      ``'truncated'`` (a pointer past ``max_depth``; ``loc`` is the
      unexpanded target, the other entry fields NULL).

    Pointer CYCLES (a child indexing its parent — CMS misconfigs do
    this) are cut by a per-walk visited array, bounded by
    ``max_depth`` + 1 URLs; a sitemap reachable from two roots is
    walked once per root (each root's frontier is independent — the
    tree view, not the graph view). ``fetched`` must be one row per
    sitemap URL.

    100 TB plan: the same shape as :func:`resolve_redirects` —
    ``max_depth`` equi-joins of a shrinking pointer frontier against
    the fetched frame (sitemap corpora are index-sized: millions of
    files, not billions), each round one join + the map-only parse,
    ``localCheckpoint`` cutting lineage. Page-entry output never
    re-enters the loop."""
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    from dataproc_spark.core import ensure_no_columns

    ensure_no_columns(
        fetched,
        ("root_url", "source_url", "depth", "status", "pos", "kind",
         "loc", "lastmod", "changefreq", "priority", "_visited",
         "_sm_url", "_body_url"),
        "expand_sitemaps",
    )
    bodies = fetched.select(
        F.col(url_col).alias("_body_url"),
        F.col(xml_col).alias(xml_col),
    ).persist()
    try:
        seed_urls = (
            roots.select(F.col(roots.columns[0]).alias("_body_url"))
            if roots is not None
            else bodies.select("_body_url")
        )
        frontier = seed_urls.select(
            F.col("_body_url").alias("root_url"),
            F.col("_body_url").alias("_sm_url"),
            F.lit(0).alias("depth"),
            F.array(F.col("_body_url")).alias("_visited"),
        ).localCheckpoint()
        out_cols = [
            "root_url", "source_url", "depth", "status", "loc",
            "lastmod", "changefreq", "priority",
        ]

        def _page_rows(parsed):
            return parsed.where(F.col("kind") == "url").select(
                "root_url",
                F.col("_sm_url").alias("source_url"),
                "depth",
                F.lit("ok").alias("status"),
                "loc", "lastmod", "changefreq", "priority",
            )

        parts = []
        for _ in range(max_depth + 1):
            if frontier.isEmpty():
                break
            j = frontier.join(
                bodies, frontier._sm_url == F.col("_body_url"), "left"
            ).localCheckpoint()
            parts.append(j.where(F.col("_body_url").isNull()).select(
                "root_url",
                F.lit(None).cast("string").alias("source_url"),
                "depth",
                F.lit("missing").alias("status"),
                F.col("_sm_url").alias("loc"),
                *[F.lit(None).cast("string").alias(c)
                  for c in ("lastmod", "changefreq")],
                F.lit(None).cast("double").alias("priority"),
            ))
            have = j.where(F.col("_body_url").isNotNull()).drop(
                "_body_url"
            )
            parsed = sitemap_entries(have, xml_col=xml_col).localCheckpoint()
            parts.append(_page_rows(parsed))
            pointers = parsed.where(
                (F.col("kind") == "sitemap") & F.col("loc").isNotNull()
                & ~F.array_contains(F.col("_visited"), F.col("loc"))
            )
            parts.append(pointers.where(
                F.col("depth") + 1 > max_depth
            ).select(
                "root_url",
                F.col("_sm_url").alias("source_url"),
                (F.col("depth") + 1).alias("depth"),
                F.lit("truncated").alias("status"),
                "loc",
                *[F.lit(None).cast("string").alias(c)
                  for c in ("lastmod", "changefreq")],
                F.lit(None).cast("double").alias("priority"),
            ))
            frontier = pointers.where(
                F.col("depth") + 1 <= max_depth
            ).select(
                "root_url",
                F.col("loc").alias("_sm_url"),
                (F.col("depth") + 1).alias("depth"),
                F.concat(F.col("_visited"), F.array(F.col("loc")))
                .alias("_visited"),
            )
        if not parts:  # an empty fetched frame discovers nothing
            return fetched.sparkSession.createDataFrame(
                [],
                "root_url string, source_url string, depth int, "
                "status string, loc string, lastmod string, "
                "changefreq string, priority double",
            )
        out = parts[0].select(*out_cols)
        for p in parts[1:]:
            out = out.unionByName(p.select(*out_cols))
        return out.localCheckpoint()
    finally:
        bodies.unpersist()


# ---------------------------------------------------------------------------
# link extraction + RFC 3986 reference resolution (r12) — the web graph
# ---------------------------------------------------------------------------

def _remove_dot_segments(p: Column) -> Column:
    """RFC 3986 §5.2.4 ``remove_dot_segments`` over an absolute path,
    exactly: fold the segments through the spec's output stack (``.``
    skips, ``..`` pops, anything else pushes) with ``F.aggregate`` —
    the algorithm is a left fold, so it expresses as ONE higher-order
    JVM expression, no UDF and no bounded-regex approximation. A
    trailing ``.``/``..`` leaves the trailing slash the spec requires
    (``/a/b/..`` → ``/a/``); ``..`` at the root clamps (the pop of an
    empty stack is a no-op).

    A no-dot-segment FAST PATH (``when(~p.contains('/.'), p)``) was
    tried and MEASURED SLOWER (r14, 2× on the interleaved toggle
    probe): the guard duplicates the merged-path subexpression across
    the CASE branches and codegen does not eliminate it there — the
    fold is cheaper than evaluating ``p`` twice. Keep the fold
    unconditional."""
    segs = F.split(F.regexp_replace(p, "^/", ""), "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(
                s == "..",
                F.slice(
                    acc, F.lit(1),
                    F.greatest(F.size(acc) - 1, F.lit(0)),
                ),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    res = F.concat(F.lit("/"), F.array_join(folded, "/"))
    return F.when(
        p.rlike(r"(^|/)\.{1,2}$") & ~res.endswith("/"),
        F.concat(res, F.lit("/")),
    ).otherwise(res)


def resolve_url(base: Column, ref: Column) -> Column:
    """Resolve a reference against a base URL — RFC 3986 §5 for the
    forms a crawl meets: absolute (hierarchical ``scheme://`` URLs get
    their path dot-segment-normalized per §5.2.2; opaque schemes —
    ``mailto:``, ``urn:`` — pass verbatim; fragments always drop),
    protocol-relative ``//host/...``, root-relative ``/path``,
    query-only ``?q=...``, empty/fragment-only (→ the base, fragment
    dropped), and path-relative with FULL dot-segment normalization
    (:func:`_remove_dot_segments` — an exact higher-order fold, not a
    bounded regex chain). Fragments never survive (two URLs differing
    only by fragment are the same fetch). ``base`` must be absolute
    with an authority (a crawl's page URL always is); NULL refs stay
    NULL. Pure built-in expression — map-only."""
    ref = F.regexp_replace(ref, "#.*$", "")  # fragment never survives
    b_nofrag = F.regexp_replace(base, "#.*$", "")
    b_scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    b_origin = F.regexp_extract(
        base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1
    )
    b_path_raw = F.regexp_extract(
        base, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    # the merge needs '/' for an empty base path (RFC §5.3 merge with
    # authority), but a QUERY-ONLY ref keeps the base path VERBATIM —
    # urljoin/RFC produce 'https://h.ex?a=1', not 'https://h.ex/?a=1'
    # (caught by the stdlib-equivalence test)
    b_path = F.when(b_path_raw == "", F.lit("/")).otherwise(b_path_raw)
    b_dir = F.regexp_replace(b_path, "[^/]*$", "")
    r_path = F.regexp_extract(ref, r"^([^?#]*)", 1)
    r_query = F.regexp_extract(ref, r"(\?[^#]*)", 1)

    def _norm_hier(u: Column) -> Column:
        # RFC 3986 §5.2.2 applies remove_dot_segments to EVERY resolved
        # path, absolute and protocol-relative references included —
        # skipping them left '//cdn.net/a/../b' unnormalized, so the
        # same fetch appeared under two link_urls (r12 review finding)
        origin = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
        path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
        rest = F.regexp_extract(u, r"(\?[^#]*)", 1)
        return F.concat(
            origin,
            F.when(path == "", F.lit("")).otherwise(
                _remove_dot_segments(path)
            ),
            rest,
        )

    return (
        F.when(ref.isNull(), F.lit(None).cast("string"))
        .when(ref == "", b_nofrag)
        .when(
            ref.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), _norm_hier(ref)
        )
        # scheme without authority (mailto:, urn:, data:): opaque —
        # no hierarchical path to normalize, keep verbatim
        .when(ref.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:"), ref)
        .when(
            ref.startswith("//"),
            _norm_hier(F.concat(b_scheme, F.lit(":"), ref)),
        )
        .when(
            ref.startswith("/"),
            F.concat(b_origin, _remove_dot_segments(r_path), r_query),
        )
        .when(ref.startswith("?"), F.concat(b_origin, b_path_raw, ref))
        .otherwise(
            F.concat(
                b_origin,
                _remove_dot_segments(F.concat(b_dir, r_path)),
                r_query,
            )
        )
    )


#: per-tag attribute extraction: anchored walk over the OPEN-TAG body
#: that consumes quoted values as units, requiring the attribute name
#: to start an attribute (preceded by whitespace or the tag start —
#: ``data-href`` never matches). Quoted values capture in full
#: (whitespace and ``>`` included); bare values end at whitespace/'>'.
_TAG_ATTR_RE = (
    r"(?is)^(?:(?:\"[^\"]*\"|'[^']*'|[^\"'])*?\s)?"
    r"{name}\s*=\s*(\"[^\"]*\"|'[^']*'|[^\"'\s>]+)"
)


def _tag_attr(tag: Column, name: str) -> Column:
    """The (quote-stripped) value of attribute ``name`` in an open-tag
    body captured by the quote-aware tag walk; ``''`` when absent."""
    return F.regexp_replace(
        F.regexp_extract(tag, _TAG_ATTR_RE.format(name=name), 1),
        "^[\"']|[\"']$",
        "",
    )


def base_href(html_col: str | Column = "html") -> Column:
    """The first ``<base>`` element WITH an href, quote-stripped —
    ``''`` when the page declares none. The with-href qualifier is the
    HTML spec's rule: a leading ``<base target="_blank">`` must not
    shadow a later ``<base href=...>`` (r13 second-review finding —
    the draft took the first base TAG). HTML gives ``<base>`` document
    scope (the spec's per-position scoping — base applies to elements
    after it in tree order — is a browser DOM detail; crawl extractors
    apply it document-wide, and a conforming page puts it in
    ``<head>`` before any content anyway). Same quote-aware walk as
    the link extraction; comments are not stripped (the
    :func:`extract_links` contract). Map-only."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    tags = F.regexp_extract_all(
        c, F.lit(r"(?is)<base\s((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"),
        F.lit(1),
    )
    hrefs = F.filter(
        F.transform(tags, lambda t: _tag_attr(t, "href")),
        lambda h: h != "",
    )
    return F.coalesce(F.get(hrefs, 0), F.lit(""))


#: the anchor OPEN TAG as a split delimiter: same ``<a\s`` + quote-aware
#: body alternation as the attrs walk (so both match at IDENTICAL
#: offsets and counts — chunk i+1 of the split is exactly the text
#: following anchor i), plus the optional closing ``>`` the attrs walk
#: stops before. RE2-portable.
_ANCHOR_OPEN_SPLIT_RE = r"(?is)<a\s(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>?"


def _anchor_texts(html: Column) -> Column:
    """Per-anchor inner text, aligned 1:1 with the attrs walk of
    :func:`_link_structs` (element i ↔ anchor i): split the document
    on the open-tag pattern; within each following chunk the anchor's
    text runs to the first ``</a>`` (a chunk already ends where the
    NEXT anchor opens — the browser auto-close rule for non-nestable
    ``<a>``). Nested inline tags strip to spaces, entities decode via
    the :data:`HTML_ENTITIES_FAST` chain, whitespace collapses. ``''``
    when the anchor shows no text (image-only, ``<a href=x></a>``) or
    never closes before the next anchor / end of document (dangling —
    the :data:`ANCHOR_SPAN_RE` convention); callers map the sentinel
    to NULL outside the lambda (see :func:`_clean`'s comment).
    Map-only, RE2-portable."""
    chunks = F.split(html, _ANCHOR_OPEN_SPLIT_RE)

    def _clean(chunk: Column) -> Column:
        inner = F.regexp_extract(chunk, r"(?is)^(.*?)</a\s*>", 1)
        t = F.regexp_replace(inner, r"(?is)<[^>]+>", " ")
        for ent, ch in HTML_ENTITIES_FAST:
            t = F.replace(t, F.lit(ent), F.lit(ch))
        # the ''-for-no-text sentinel maps to NULL OUTSIDE this lambda
        # (extract_links' post-explode projection): HOF lambdas are
        # interpreted with no subexpression elimination, and both CASE
        # and nullif duplicate the whole clean chain per chunk
        return F.trim(F.regexp_replace(t, r"[ \t\r\n]+", " "))

    return F.transform(
        F.slice(chunks, 2, F.greatest(F.size(chunks) - 1, F.lit(0))),
        _clean,
    )


def _link_structs(html: Column, with_text: bool = False) -> Column:
    """The quote-aware anchor walk shared by :func:`extract_links` and
    :func:`extract_link_array`: whole ``<a ...`` open-tag bodies →
    array of struct(href, rel), fragment-only/empty self-edges
    excluded. ``with_text`` zips :func:`_anchor_texts` in as a third
    ``anchor_text`` field — ``zip_with`` so BOTH arrays evaluate once
    per page (an index lookup inside the attrs lambda would re-derive
    the whole text array per anchor), and the zip runs BEFORE the
    self-edge filter so alignment is positional by construction."""
    tags = F.regexp_extract_all(
        html,
        F.lit(r"(?is)<a\s((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"),
        F.lit(1),
    )

    def _attrs(t):
        return [
            _tag_attr(t, "href").alias("href"),
            # contains-guard: most anchors carry no rel, and a FAILING
            # lazy attribute walk is the expensive path (the regex must
            # exhaust every split point) — the substring test skips it
            # (false positives like a 'rel' inside another value just
            # fall through to the exact walk)
            F.when(
                F.lower(t).contains("rel"), _tag_attr(t, "rel")
            ).otherwise(F.lit("")).alias("rel"),
        ]

    if with_text:
        links = F.zip_with(
            tags, _anchor_texts(html),
            lambda t, txt: F.struct(
                *_attrs(t), txt.alias("anchor_text")
            ),
        )
    else:
        links = F.transform(tags, lambda t: F.struct(*_attrs(t)))
    return F.filter(
        links,
        lambda s: (~s["href"].startswith("#")) & (s["href"] != ""),
    )


def _effective_base(
    html: Column, base_col: str, honor_base: bool
) -> Column:
    """The resolution base of a page: the first ``<base href>``
    resolved against the page URL when present and honored, else the
    page URL itself."""
    if not honor_base:
        return F.col(base_col)
    b = base_href(html)
    return F.when(
        b != "", resolve_url(F.col(base_col), b)
    ).otherwise(F.col(base_col))


#: the img OPEN TAG as a split delimiter — same construction as
#: :data:`_ANCHOR_OPEN_SPLIT_RE` (quote-aware body, optional ``>``),
#: so the split chunks align 1:1 with the img attrs walk
_IMG_OPEN_SPLIT_RE = r"(?is)<img\s(?:\"[^\"]*\"|'[^']*'|[^>\"'])*/?>?"


def _fragment_text(c: Column) -> Column:
    """Tag-strip + fast-entity decode + whitespace collapse of a small
    HTML fragment inside a HOF lambda (``''`` sentinel for empty —
    callers map to NULL outside the lambda, the :func:`_anchor_texts`
    rule)."""
    t = F.regexp_replace(c, r"(?is)<[^>]+>", " ")
    for ent, ch in HTML_ENTITIES_FAST:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"[ \t\r\n]+", " "))


def extract_images(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    honor_base: bool = True,
    with_figcaption: bool = True,
) -> DataFrame:
    """Extract the images of an HTML page with their TEXT pairing —
    the (image_url, caption) edge list a CLIP-style multimodal corpus
    is built from. One output row per ``<img src=...>`` in document
    order: ``img_pos`` (0-based), ``src`` (raw attribute), ``alt``
    (entity-decoded, whitespace-collapsed; NULL when the attribute is
    ABSENT, ``''`` kept when present-but-empty — the decorative-image
    marker a curation filter keys on), ``figcaption`` (the cleaned
    ``<figcaption>`` text of the img's enclosing ``<figure>``; NULL
    outside figures), and ``img_url`` (``src`` resolved against the
    page's effective base — the same ``<base href>`` machinery as
    :func:`extract_links`). ``data-src`` and src-less ``<img>``
    (decoys / JS-lazy placeholders) never match — the quote-aware
    :data:`_TAG_ATTR_RE` boundary rule. A caption for pairing is
    ``coalesce(figcaption, nullif(alt, ''))``.

    Figure association is offset-free and expression-only: figure
    SPANS extract in document order; each img's enclosing-figure
    ordinal is the running ``<figure``-minus-``</figure>`` balance
    over the split chunks PRECEDING it (the aligned-split rule of
    :func:`_anchor_texts`). Exact for the machine-written HTML this
    module contracts for (figures balanced and non-nested — the HTML
    spec forbids nesting); an UNCLOSED figure upstream shifts the
    ordinal off the span list and the caption degrades to NULL rather
    than mispairing silently... except when a stray unclosed figure
    precedes a real one — the documented conforming-markup boundary.

    Plan: two ``regexp_extract_all`` walks (img tags, figure spans) +
    one aligned split + integer running sums — all inside ONE
    projection, map-only, zero shuffles, zero Python, RE2-portable.
    Joining the result against a media frame by ``img_url`` is the
    caller's one (broadcastable) shuffle."""
    from dataproc_spark.core import ensure_no_columns

    out_cols = ["img_pos", "src", "alt", "img_url"] + (
        ["figcaption"] if with_figcaption else []
    )
    ensure_no_columns(df, out_cols, "extract_images")
    html = F.coalesce(
        F.col(html_col) if isinstance(html_col, str) else html_col,
        F.lit(""),
    )
    imgs = _image_structs(html, with_figcaption)
    # carry the page-level base through the generator input — the
    # post-explode projection would re-run the prescan per image row
    # (see extract_links)
    ifields = ["src", "alt"] + (
        ["figcaption"] if with_figcaption else []
    )
    eb = _effective_base(html, base_col, honor_base)
    imgs = F.zip_with(
        imgs, F.array_repeat(eb, F.size(imgs)),
        lambda s, b: F.struct(
            *[s[f].alias(f) for f in ifields], b.alias("_eb")
        ),
    )
    others = list(df.columns)
    sel = [
        *others,
        "img_pos",
        F.col("_img.src").alias("src"),
        F.col("_img.alt").alias("alt"),
    ]
    if with_figcaption:
        sel.append(
            F.nullif(F.col("_img.figcaption"), F.lit(""))
            .alias("figcaption")
        )
    return df.select(
        *others, F.posexplode(imgs).alias("img_pos", "_img")
    ).select(
        *sel,
        resolve_url(F.col("_img._eb"), F.col("_img.src"))
        .alias("img_url"),
    )


def _image_structs(html: Column, with_figcaption: bool = True) -> Column:
    """The quote-aware img walk shared by :func:`extract_images` and
    :func:`extract_image_array`: array of struct(src, alt[,
    figcaption]) in document order, src-less tags excluded. Alt is
    NULL when ABSENT, ``''`` kept when present-but-empty; figcaption
    carries the ``''`` no-text sentinel (callers map to NULL outside
    the lambdas — the :func:`_anchor_texts` rule)."""
    tags = F.regexp_extract_all(
        html,
        F.lit(r"(?is)<img\s((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"),
        F.lit(1),
    )

    def _img_struct(t, cap):
        # alt: '' when ABSENT (regexp_extract's no-match sentinel) is
        # re-distinguished from a present-but-empty alt="" by checking
        # the attribute name exists in the tag body at all
        has_alt = t.rlike(
            r"(?is)^(?:(?:\"[^\"]*\"|'[^']*'|[^\"'])*?\s)?alt\s*="
        )
        alt_raw = _tag_attr(t, "alt")
        alt = F.when(has_alt, _fragment_text(alt_raw))
        fields = [
            _tag_attr(t, "src").alias("src"),
            alt.alias("alt"),
        ]
        if cap is not None:
            fields.append(cap.alias("figcaption"))
        return F.struct(*fields)

    if with_figcaption:
        fig_spans = F.regexp_extract_all(
            html,
            F.lit(r"(?is)<figure(?:\s[^>]*)?>.*?</figure\s*>"),
            F.lit(0),
        )
        fig_caps = F.transform(
            fig_spans,
            lambda s: _fragment_text(F.regexp_extract(
                s, r"(?is)<figcaption(?:\s[^>]*)?>(.*?)</figcaption\s*>",
                1,
            )),
        )
        chunks = F.split(html, _IMG_OPEN_SPLIT_RE)
        # per-chunk figure open/close counts; img i's preceding text is
        # chunks[0..i] (1-based slice 1..i+1)
        opens = F.transform(chunks, lambda c: F.size(
            F.regexp_extract_all(c, F.lit(r"(?is)<figure[\s>]"), F.lit(0))
        ))
        closes = F.transform(chunks, lambda c: F.size(
            F.regexp_extract_all(c, F.lit(r"(?is)</figure\s*>"), F.lit(0))
        ))

        def _cum(arr, i):
            return F.aggregate(
                F.slice(arr, 1, i + 1), F.lit(0), lambda a, x: a + x
            )

        structs = F.transform(
            tags,
            lambda t, i: _img_struct(
                t,
                F.when(
                    _cum(opens, i) > _cum(closes, i),
                    F.get(fig_caps, _cum(opens, i) - 1),
                ),
            ),
        )
    else:
        structs = F.transform(tags, lambda t: _img_struct(t, None))
    return F.filter(structs, lambda s: s["src"] != "")


def extract_image_array(
    html_col: str | Column = "html",
    base_col: str = "url",
    honor_base: bool = True,
) -> Column:
    """The page's images as ONE ``array<struct<url,caption>>`` column —
    the no-explode form :func:`extract_images` flattens, shaped for a
    WAT metadata record (r14): ``url`` is the resolved src (same
    effective-base machinery as links), ``caption`` is
    ``coalesce(figcaption, nullif(alt, ''))`` — the
    :func:`image_text_pairs` rule. Map-only, zero shuffles."""
    html = F.coalesce(
        F.col(html_col) if isinstance(html_col, str) else html_col,
        F.lit(""),
    )
    imgs = _image_structs(html)
    eff = _effective_base(html, base_col, honor_base)
    # base carried as a zip_with child — see extract_link_array
    return F.zip_with(
        imgs, F.array_repeat(eff, F.size(imgs)),
        lambda s, b: F.struct(
            resolve_url(b, s["src"]).alias("url"),
            F.coalesce(
                F.nullif(s["figcaption"], F.lit("")),
                F.nullif(s["alt"], F.lit("")),
            ).alias("caption"),
        ),
    )


def extract_link_pairs(
    html_col: str | Column = "html",
    base_col: str = "url",
    honor_base: bool = True,
) -> Column:
    """The page's outlinks WITH their anchor text as ONE
    ``array<struct<url,text>>`` column (r14) — what a WAT record
    carries next to the bare link list. Same walk and base handling
    as :func:`extract_link_array`; ``text`` NULL for image-only or
    dangling anchors. Map-only, zero shuffles."""
    html = F.coalesce(
        F.col(html_col) if isinstance(html_col, str) else html_col,
        F.lit(""),
    )
    links = _link_structs(html, with_text=True)
    eff = _effective_base(html, base_col, honor_base)
    # base carried as a zip_with child — see extract_link_array
    return F.zip_with(
        links, F.array_repeat(eff, F.size(links)),
        lambda s, b: F.struct(
            resolve_url(b, s["href"]).alias("url"),
            F.nullif(s["anchor_text"], F.lit("")).alias("text"),
        ),
    )


def image_text_pairs(
    images: DataFrame,
    media: DataFrame,
    img_url_col: str = "img_url",
    media_url_col: str = "url",
    require_caption: bool = True,
    broadcast_media: bool = False,
) -> DataFrame:
    """Join :func:`extract_images` output against a media frame (URL →
    payload/bytes/features) to emit the (image, caption) pairs a
    multimodal training corpus consumes. ``caption`` is
    ``coalesce(nullif(figcaption, ''), nullif(alt, ''))`` — the
    enclosing figure's caption wins over alt text, and an EMPTY value
    on either source (the decorative-image marker, or a bare
    ``<figcaption></figcaption>``) never becomes a caption. ``require_caption`` (default)
    drops caption-less images — flip it off for coverage audits.

    100 TB plan: ONE equi-join on the URL. Both sides are large in
    production (the edge list and the fetched-media store), so the
    default is a shuffle hash join on ``img_url`` — pre-bucket both
    sides by URL to make it co-located; set ``broadcast_media=True``
    only for a small curated media dimension. The caption filter runs
    BEFORE the join (shrinks the probe side); payload bytes move once,
    never re-shuffled afterward."""
    from dataproc_spark.core import ensure_has_columns

    ensure_has_columns(images, [img_url_col])
    ensure_has_columns(media, [media_url_col])
    # nullif on BOTH sources: an external images frame may carry a
    # present-but-empty figcaption '' that must never beat a real alt
    # or survive require_caption (r14 review finding)
    cap_parts = []
    if "figcaption" in images.columns:
        cap_parts.append(F.nullif(F.col("figcaption"), F.lit("")))
    if "alt" in images.columns:
        cap_parts.append(F.nullif(F.col("alt"), F.lit("")))
    if not cap_parts:
        raise ValueError(
            "image_text_pairs: images frame has neither 'figcaption' "
            "nor 'alt' — nothing to caption with"
        )
    from dataproc_spark.core import ensure_no_columns

    ensure_no_columns(images, ["caption", "_murl"], "image_text_pairs")
    overlap = sorted(
        (set(images.columns) | {"caption"})
        & {c for c in media.columns if c != media_url_col}
    )
    if overlap:
        raise ValueError(
            f"image_text_pairs: media columns {overlap} collide with "
            "the images frame — rename before joining"
        )
    imgs = images.withColumn("caption", F.coalesce(*cap_parts))
    if require_caption:
        imgs = imgs.where(F.col("caption").isNotNull())
    m = media.withColumnRenamed(media_url_col, "_murl")
    m = F.broadcast(m) if broadcast_media else m
    return imgs.join(
        m, imgs[img_url_col] == m["_murl"], "inner"
    ).drop("_murl")


def extract_link_array(
    html_col: str | Column = "html",
    base_col: str = "url",
    honor_base: bool = True,
) -> Column:
    """The page's resolved outlinks as ONE ``array<string>`` column —
    the no-explode form :func:`extract_links` flattens; what a WAT
    metadata record or a per-page feature wants (r13). Same walk,
    same base handling, zero shuffles, zero Python."""
    html = F.coalesce(
        F.col(html_col) if isinstance(html_col, str) else html_col,
        F.lit(""),
    )
    links = _link_structs(html)
    # zip the page-level base in as a zip_with CHILD (evaluated once
    # per row) — an outer reference inside the HOF lambda re-runs the
    # whole base prescan PER ELEMENT (interpreted HOFs have no
    # subexpression elimination; measured 3.5× on 10-link pages, r14)
    eff = _effective_base(html, base_col, honor_base)
    return F.zip_with(
        links, F.array_repeat(eff, F.size(links)),
        lambda s, b: resolve_url(b, s["href"]),
    )


def page_title(html_col: str | Column = "html") -> Column:
    """The page's ``<title>`` text: first title element, entities
    decoded (the :data:`HTML_ENTITIES_FAST` chain), whitespace
    collapsed, trimmed. NULL when the page has no (or an empty) title
    — callers decide whether an untitled page matters. Map-only."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    got = F.regexp_extract(
        c, r"(?is)<title(?:\s[^>]*)?>\s*(.*?)\s*</title\s*>", 1
    )
    t = F.trim(F.regexp_replace(unescape_html(got), r"[ \t\r\n]+", " "))
    return F.when(t == "", F.lit(None)).otherwise(t)


def meta_robots(
    html_col: str | Column = "html", name: str = "robots"
) -> Column:
    """Page-level robots directives — the ``<meta name=robots
    content="noindex, nofollow">`` element a polite pipeline honors
    AFTER robots.txt (robots.txt gates the FETCH; the meta tag gates
    indexing/link-following of a fetched page). Returns the lowercased
    trimmed directive tokens as ``array<string>`` (first matching meta
    element wins; ``name`` swaps in a crawler-specific element like
    ``googlebot``), NULL when the page declares none. Quote-aware walk
    (attribute order free: ``content`` before ``name`` works);
    map-only."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    tags = F.regexp_extract_all(
        c,
        F.lit(r"(?is)<meta\s((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"),
        F.lit(1),
    )
    hits = F.filter(
        tags,
        lambda t: F.lower(_tag_attr(t, "name")) == name.lower(),
    )
    content = _tag_attr(F.get(hits, 0), "content")
    toks = F.filter(
        F.transform(
            F.split(F.lower(content), ","), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )
    return F.when(
        content.isNull() | (F.size(toks) == 0), F.lit(None)
    ).otherwise(toks)


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    resolve: bool = True,
    honor_base: bool = True,
    with_anchor_text: bool = True,
) -> DataFrame:
    """Extract the outlinks of an HTML page — the edge list of the web
    graph every crawl-scale ranking (PageRank over hosts, frontier
    prioritization, spam neighborhoods) is built on. One output row per
    ``<a href=...>`` in document order: ``link_pos`` (0-based),
    ``href`` (the raw attribute value), ``rel`` (the anchor's ``rel``
    attribute verbatim — ``nofollow``/``ugc``/``sponsored`` are how
    link-graph pipelines filter spam edges; NULL when absent), and —
    with ``resolve=True`` — ``link_url`` (:func:`resolve_url` against
    the page's *effective base*: the first ``<base href>`` resolved
    against ``base_col`` when present and ``honor_base`` (r13 — a
    templated page setting ``<base href>`` otherwise resolved every
    relative link to the wrong URL, r12 verdict finding), else
    ``base_col`` itself; absolute links are unaffected either way).

    ``with_anchor_text`` (default on, r14) adds ``anchor_text`` — the
    anchor's visible inner text (nested tags stripped, entities
    decoded via the fast chain, whitespace collapsed; NULL for
    image-only or dangling anchors — :func:`_anchor_texts`): inbound
    anchor text is the highest-value web-corpus ranking/caption signal
    and what WAT consumers expect next to links. The text walk is a
    second full-document regex pass (the aligned split), evaluated
    ONCE per page before the explode (``zip_with`` in
    :func:`_link_structs`) — pass ``False`` on a hot path that never
    reads the column (the host-graph rollup does): the text sits
    inside the exploded struct, so Catalyst cannot prune it away for
    you (measured, not assumed — an indexed post-explode lookup WAS
    prunable but re-derived the whole text array per link, O(links²)
    per page after CollapseProject inlining).

    Extraction is attribute-boundary-exact for machine-written HTML:
    the open tag is captured whole with a quote-aware walk (an
    href-looking token inside an earlier attribute's quoted value
    can't steal the match; a quoted ``>`` can't hide the link — the
    r12 review bug class), then ``href``/``rel`` extract per tag with
    the same walk (``data-href`` never matches; value order in the tag
    doesn't matter). Fragment-only or empty links (``#section``/
    ``href=""`` — self-edges) are excluded. Patterns are RE2-portable
    (alternation + lazy quantifiers, no lookaround). Comments are NOT
    stripped — run :func:`extract_main_text`-style pre-cleaning first
    if commented-out markup matters.

    Plan: ``regexp_extract_all`` + per-tag ``transform`` + ``filter``
    + ``posexplode`` + the resolve expression — map-only, zero
    shuffles, zero Python. The host-graph rollup downstream
    (``groupBy(src_host, dst_host)``) is the first shuffle, and it
    carries host pairs, not pages.
    """
    from dataproc_spark.core import ensure_no_columns

    ensure_no_columns(
        df,
        ["link_pos", "href", "rel"]
        + (["link_url"] if resolve else [])
        + (["anchor_text"] if with_anchor_text else []),
        "extract_links",
    )
    html = F.coalesce(
        F.col(html_col) if isinstance(html_col, str) else html_col,
        F.lit(""),
    )
    links = _link_structs(html, with_text=with_anchor_text)
    if resolve:
        # the effective base is a full-document prescan; computed in
        # the post-explode projection it would run PER LINK ROW —
        # carrying it through the generator input evaluates it once
        # per page (measured 3.5× on 10-link pages, r14; the same
        # CollapseProject inlining that bit the anchor-text draft)
        fields = ["href", "rel"] + (
            ["anchor_text"] if with_anchor_text else []
        )
        eb = _effective_base(html, base_col, honor_base)
        links = F.zip_with(
            links, F.array_repeat(eb, F.size(links)),
            lambda s, b: F.struct(
                *[s[f].alias(f) for f in fields], b.alias("_eb")
            ),
        )
    others = list(df.columns)
    post = (
        [F.nullif(F.col("_link.anchor_text"), F.lit(""))
         .alias("anchor_text")]
        if with_anchor_text else []
    )
    ex = df.select(
        *others, F.posexplode(links).alias("link_pos", "_link")
    ).select(
        *others,
        "link_pos",
        F.col("_link.href").alias("href"),
        F.when(F.col("_link.rel") == "", F.lit(None))
        .otherwise(F.col("_link.rel")).alias("rel"),
        *post,
        *([resolve_url(F.col("_link._eb"), F.col("_link.href"))
           .alias("link_url")] if resolve else []),
    )
    return ex
