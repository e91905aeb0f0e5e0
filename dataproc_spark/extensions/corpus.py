"""Corpus shaping for training pipelines: chunking, deterministic global
shuffle, and inverted-index construction.

These are the steps between "cleaned documents" and "training batches":
split long documents into fixed-token training chunks, assign every
example a reproducible shuffle position (so epoch order is stable across
reruns and cluster layouts), and build the term → posting-list index that
powers retrieval-style selection (the reference's shard/selective-search
world view — ``/root/reference/dataproc/selectivesearch.py`` consumes
per-shard retrieval results; this module covers how such an index is
*built* at corpus scale).

Scale design
------------
* ``chunk_documents`` is map-only: tokenize once, ``explode`` one small
  integer range per document (number of chunks, not number of tokens),
  slice the token array per chunk. No shuffle, no UDF; output size is the
  input token count.
* ``shuffle_order`` is the hash-shuffle used for training-epoch order:
  shard by a content hash (md5 — engine-portable, append-stable) and
  number rows *within* shards. One hash shuffle + per-shard sort — never
  a single global sort; readers stream shards in shard order for a
  deterministic epoch without any coordinator.
* ``inverted_index`` is explode → hash aggregate: one shuffle on the
  term, postings built with ``collect_list`` bounded by per-(term, doc)
  position counts (document length), not corpus size. Hot terms are the
  classic skew case — ``min_tf`` prunes the singleton tail and
  stopword-class terms can be pre-filtered by the caller (or routed
  through ``skew.salted_agg`` when counting only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataproc_spark.extensions.dedup import tokens
from dataproc_spark.extensions.sampling import hash_hex


def chunk_documents(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    joiner: str = " ",
) -> DataFrame:
    """Split each document into consecutive ``chunk_tokens``-token chunks.

    Returns ``(id_col, chunk_id, chunk_text, n_tokens)`` — chunk_id is
    0-based and consecutive per document; the final chunk may be short.
    Empty documents (no tokens) yield zero chunks.

    Map-only: the explode is over the per-document CHUNK count (length /
    chunk_tokens), and each chunk re-joins a slice of the one token
    array — no shuffle, no second tokenize.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    toks = tokens(col)
    base = df.where(F.size(toks) > 0).select(
        F.col(id_col), toks.alias("_t")
    )
    n_chunks = F.ceil(F.size("_t") / F.lit(chunk_tokens)).cast("int")
    chunk = F.slice(
        F.col("_t"),
        F.col("chunk_id") * chunk_tokens + 1,
        F.lit(chunk_tokens),
    )
    return (
        base.select(
            id_col,
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
            "_t",
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.array_join(chunk, joiner).alias("chunk_text"),
            F.size(chunk).alias("n_tokens"),
        )
    )


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "epoch0",
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic global shuffle: assign every row a ``(shard, pos)``
    training-order coordinate from a content hash.

    Readers consume shards in shard order, rows in ``pos`` order — a full
    deterministic permutation of the corpus that is reproducible across
    reruns and cluster layouts (hash-derived, like everything in
    ``sampling``) and re-randomizable per epoch via ``salt``.

    ``shard`` is the first hex nibbles of ``md5(id#salt)`` (so
    ``n_shards`` must be a power of 16 divisor of the hex space: 16 or
    256), ``pos`` numbers rows *within* a shard by hash order. One hash
    shuffle + per-shard sort; there is never a global sort — at 100 TB a
    single ORDER BY over the corpus is the thing this operator exists to
    avoid.
    """
    if n_shards not in (16, 256):
        raise ValueError(
            f"n_shards must be 16 or 256 (whole hex nibbles), got {n_shards}"
        )
    clash = [c for c in ("shard", "pos", "_h", "_rh") if c in df.columns]
    if clash:
        raise ValueError(
            f"shuffle_order would overwrite existing column(s) {clash}; "
            f"rename them first (withColumn silently clobbering user data "
            f"is the failure this guard prevents)"
        )
    nibbles = 1 if n_shards == 16 else 2
    h = hash_hex(id_col, salt)
    shard = F.conv(F.substring(h, 1, nibbles), 16, 10).cast("int")
    # third sort key: a hash of the WHOLE row. When id_col repeats (e.g.
    # chunk_documents output keyed by doc_id), (_h, id) ties exactly and
    # row_number would depend on partition layout — breaking the
    # bit-stable permutation this operator promises (r7 review finding).
    # The row hash makes distinct rows order deterministically; fully
    # identical rows remain interchangeable, which cannot change the
    # emitted content.
    rowhash = F.xxhash64(*[F.col(c) for c in df.columns])
    w = Window.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(id_col).asc(), F.col("_rh").asc()
    )
    return (
        df.withColumn("_h", h)
        .withColumn("_rh", rowhash)
        .withColumn("shard", shard)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h", "_rh")
    )


#: PII patterns, engine-portable (valid under both Java regex and RE2 —
#: no lookbehind, no backreferences): email addresses, IPv4 literals, and
#: long digit runs (phone/SSN/CC shapes: 9+ chars of digits/dash/space
#: bounded by digits).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_NUMRUN = r"\d[\d\- ]{7,}\d"


def redact_pii(
    df: DataFrame, col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace emails / IPv4s / long digit runs with ``<EMAIL>`` /
    ``<IP>`` / ``<NUM>`` tokens and count each match class.

    Map-only JVM-side ``regexp_replace`` chain (email → IP → digit-run,
    so an address is tokenized before its digits could be mistaken for a
    number run); adds ``n_emails`` / ``n_ips`` / ``n_numruns`` counted on
    the ORIGINAL text (counts are per-pattern pre-redaction; replacements
    cascade). This is the scrubbing *plumbing* — pattern completeness is a
    policy decision; callers extend by chaining more ``regexp_replace``
    steps over ``out_col``.
    """
    out_col = out_col or col
    # fail at the call, not at a far-away AMBIGUOUS_REFERENCE / parquet
    # write: the added columns must not already exist (r8 review
    # finding; same guard shape as shuffle_order's clash check)
    added = ["n_emails", "n_ips", "n_numruns"]
    if out_col != col:
        added.append(out_col)
    clashes = [c for c in added if c in df.columns]
    if clashes:
        raise ValueError(
            f"redact_pii would duplicate existing column(s) {clashes}; "
            "drop or rename them first"
        )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(col), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_NUMRUN,
        "<NUM>",
    )

    def n(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0)))

    counts = [
        n(PII_EMAIL).alias("n_emails"),
        n(PII_IPV4).alias("n_ips"),
        n(PII_NUMRUN).alias("n_numruns"),
    ]
    if out_col == col:
        return df.select(
            *[c for c in df.columns if c != col], red.alias(col), *counts
        )
    return df.select(*df.columns, red.alias(out_col), *counts)


def inverted_index(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_tf: int = 1,
) -> DataFrame:
    """Term → posting-list index: one row per (term, document) with the
    term frequency and the 0-based token positions (comma-joined string —
    engine-portable for the oracle; positions sorted numerically).

    ``posexplode`` the token array → hash-aggregate on (term, doc). The
    postings payload is bounded by document length; ``min_tf`` drops
    low-frequency postings (singleton tail) before they are materialized.
    """
    if min_tf < 1:
        raise ValueError(f"min_tf must be >= 1, got {min_tf}")
    t = df.select(
        # a NULL id would merge unrelated documents into one posting
        # (groupBy puts every NULL key in one group) — fail loudly
        F.when(F.col(id_col).isNotNull(), F.col(id_col))
        .otherwise(
            F.raise_error(
                F.lit(f"inverted_index: NULL {id_col} — postings need a "
                      "non-null document id")
            )
        )
        .alias(id_col),
        F.posexplode(tokens(col)).alias("pos", "term"),
    )
    return (
        t.groupBy("term", id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("pos")),
                    lambda p: p.cast("string"),
                ),
                ",",
            ).alias("positions"),
        )
        .where(F.col("tf") >= min_tf)
    )


def remove_repeated_spans(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document repeated-passage removal: drop every token that sits
    inside an ``n``-gram appearing in at least ``min_df`` distinct
    documents — the bounded, relational form of suffix-array passage dedup
    (boilerplate headers, license blocks, navigation chrome), applied
    *within* documents instead of dropping whole near-duplicates.

    Output: ``(id_col, n_removed, text_clean)`` — the surviving tokens
    re-joined with single spaces, original order preserved.

    Scale design: n-gram occurrences are a map-only explode (one row per
    token position, same volume as ``inverted_index``); document
    frequency is ONE hash aggregate on the gram (map-side partials bound
    the shuffle to distinct (gram, doc) pairs); covered positions come
    from a semi-join of occurrences against the hot-gram set — the skew
    case is an ultra-hot boilerplate gram, bounded because each document
    contributes at most its own positions, and AQE splits the residue.
    The rewrite itself never shuffles tokens: covered positions aggregate
    to ONE small array per affected document, and the token drop is an
    index-aware ``filter`` over the original array, map-side.

    Storage contract (r8 ADVICE): each call ``localCheckpoint``-s the
    tokenized corpus once (see :func:`_row_keyed_tokens` for why
    ``persist`` cannot substitute); those executor blocks are released
    when the returned frame is garbage-collected driver-side (the
    checkpoint RDD is only reachable through its plan), NOT at the end
    of this call. Repeated calls whose results are all held alive hold
    that many tokenized copies — at 100 TB, drop result handles you are
    done with, and budget executor storage for one full token-array
    materialization per live result.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    toks = _row_keyed_tokens(df, col, id_col)
    grams = _positioned_grams(toks, "_rid", n)
    hot = (
        grams.select("g", "_rid")
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df_docs"))
        .where(F.col("df_docs") >= min_df)
        .select("g")
    )
    return _cut_covered_tokens(toks, grams, hot, id_col, n)


def _row_keyed_tokens(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Tokenized frame with a frozen per-ROW key ``_rid`` for the
    span-cut family. The row key (not ``id_col``) drives the
    covered-positions join, so NULL ids cannot silently escape the cut
    (an equi-join never matches NULL) and duplicate-id rows cannot
    receive each other's cut positions (both r8 follow-up review
    findings). ``localCheckpoint`` freezes ``monotonically_increasing_id``
    — without it the two plan branches could recompute different ids —
    and doubles as the single materialization of the tokenize, which the
    three downstream consumers (hot-gram aggregate, covered semi-join,
    final rewrite) previously each recomputed from the source scan.
    ``persist()`` + unpersist-on-gc is NOT a safe substitute here: an
    evicted cache block recomputes its ids from lineage, and downstream
    of any shuffle the intra-partition row order (hence mono id) can
    differ between the branches — silently mis-keying cuts. Checkpoint
    blocks free when the caller's result frame is GC'd; the public
    entry points document the retention cost (r8 ADVICE)."""
    from dataproc_spark.core import ensure_no_columns

    ensure_no_columns(df, ("_rid",), "span removal")
    return (
        df.select(F.col(id_col), tokens(col).alias("_t"))
        .withColumn("_rid", F.monotonically_increasing_id())
        .localCheckpoint()
    )


def _positioned_grams(toks: DataFrame, id_col: str, n: int) -> DataFrame:
    """(id, pos, g) word n-gram occurrences from a tokenized frame —
    map-only explode, one row per token position. Docs shorter than
    ``n`` emit no grams — and must not reach ``sequence()``, whose
    (0, negative) form counts DOWN instead of producing empty."""
    return (
        toks.where(F.size("_t") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_t) - {n}),"
                    f" i -> struct(i AS pos,"
                    f" concat_ws(' ', slice(_t, i + 1, {n})) AS g))"
                )
            ).alias("s"),
        )
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.g").alias("g"))
    )


def _cut_covered_tokens(
    toks: DataFrame, grams: DataFrame, bad_grams: DataFrame,
    id_col: str, n: int,
) -> DataFrame:
    """Shared span-cut rewrite: semi-join occurrences against the bad-gram
    set, aggregate covered positions to ONE small array per affected
    ROW (the ``_rid`` key from :func:`_row_keyed_tokens`), drop them
    with an index-aware map-side ``filter`` — token bodies never
    shuffle."""
    covered = (
        grams.join(bad_grams, "g", "leftsemi")
        .select(
            "_rid",
            F.explode(F.expr(f"sequence(pos, pos + {n} - 1)")).alias("cpos"),
        )
        .groupBy("_rid")
        .agg(F.array_sort(F.collect_set("cpos")).alias("_cov"))
    )
    return (
        toks.join(covered, "_rid", "left")
        .select(
            id_col,
            F.when(F.col("_cov").isNull(), F.lit(0))
            .otherwise(F.size("_cov"))
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.filter(
                    "_t",
                    lambda x, i: F.col("_cov").isNull()
                    | ~F.array_contains("_cov", i),
                ),
                " ",
            ).alias("text_clean"),
        )
    )


def remove_contaminated_spans(
    train: DataFrame,
    evalset: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Surgical benchmark decontamination: drop every TRAIN token sitting
    inside an ``n``-gram that occurs anywhere in the eval set — the
    span-level alternative to ``contamination_pairs``-then-drop, for
    pipelines that keep the document and cut only the overlap (the
    standard practice when eval sets quote common public text).

    Output: ``(id_col, n_removed, text_clean)`` — same contract as
    :func:`remove_repeated_spans`.

    Scale: the eval side collapses to its DISTINCT gram set before the
    join — typically thousands of rows against a trillion-gram train
    explode, so the semi-join broadcasts under AQE; train-side positions
    aggregate per affected doc and the rewrite is map-side (see
    :func:`_cut_covered_tokens`). A false positive costs a cut span,
    never a dropped document.

    Storage contract: same as :func:`remove_repeated_spans` — one
    ``localCheckpoint`` of the tokenized TRAIN side per call, released
    when the returned frame is garbage-collected (r8 ADVICE).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = _row_keyed_tokens(train, col, id_col)
    grams = _positioned_grams(toks, "_rid", n)
    # the eval side needs no row key: only its distinct gram SET joins
    etoks = evalset.select(tokens(col).alias("_t")).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    bad = _positioned_grams(etoks, "_rid", n).select("g").distinct()
    return _cut_covered_tokens(toks, grams, bad, id_col, n)


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    salt: str = "epoch0",
    n_shards: int = 16,
) -> None:
    """Materialize the deterministic epoch shuffle as training shard
    files: ``shard=<k>/`` parquet directories, rows stored in ``pos``
    order so a trainer streaming shard 0..n-1 front-to-back reads the
    exact :func:`shuffle_order` permutation.

    ``repartition(n, shard)`` + ``sortWithinPartitions(pos)`` +
    ``partitionBy(shard)`` is ONE hash shuffle and per-shard sorts —
    never a global ORDER BY — and each shard directory is written by the
    tasks that own it. Re-salt per epoch for a fresh permutation; the
    layout (and hence a resumed run's read order) is bit-stable across
    reruns and cluster sizes.
    """
    ordered = shuffle_order(df, id_col=id_col, salt=salt, n_shards=n_shards)
    (
        ordered.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Diff two corpus snapshots by id + content fingerprint: each id
    becomes one row with status ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` — the audit step between corpus versions (what moved
    between v1 and v2, what an incremental re-train must touch).

    Both sides reduce to (id, 16-byte fingerprint) BEFORE the join, so
    the shuffle carries fingerprints, never bodies — the same width
    discipline as ``incremental_dedup``. One full outer join on the id;
    at 100 TB both fingerprint projections bucket on the id and the
    join co-locates.
    """
    from dataproc_spark.extensions.dedup import content_fingerprint

    # presence comes from explicit per-side markers, NOT fingerprint
    # nullness: content_fingerprint(NULL) is NULL, so a NULL-content doc
    # present on both sides would otherwise read as 'added' and a
    # removed NULL-content doc would never read 'removed' (r7 review
    # finding — an incremental re-train driven by the diff would
    # re-ingest unchanged docs and never delete removed ones)
    # reduce each side to ONE row per id before the join: a snapshot
    # carrying a duplicate id would otherwise multiply join rows and
    # emit contradictory statuses for the same document (r8 review
    # finding). Duplicates collapse to their max fingerprint —
    # deterministic; in-snapshot duplicates are the dedup family's
    # problem, the diff's contract is one verdict per id.
    # distinctly-NAMED id columns per side: old and new often share
    # lineage (two filters of one snapshot frame), where o[id]/n[id]
    # qualified refs trip Spark's ambiguous-self-join check
    o = (
        old.select(
            F.col(id_col).alias("_id_old"),
            content_fingerprint(content_col).alias("_fp_old"),
        )
        .groupBy("_id_old")
        .agg(F.max("_fp_old").alias("_fp_old"), F.lit(1).alias("_in_old"))
    )
    n = (
        new.select(
            F.col(id_col).alias("_id_new"),
            content_fingerprint(content_col).alias("_fp_new"),
        )
        .groupBy("_id_new")
        .agg(F.max("_fp_new").alias("_fp_new"), F.lit(1).alias("_in_new"))
    )
    # null-safe join key: a plain equi-join never matches NULL ids, so a
    # NULL-id doc present in both snapshots emitted the contradictory
    # ('added' AND 'removed') pair (r8 follow-up review finding). The
    # per-side one-row-per-id collapse above leaves at most one NULL row
    # per side, so the null-safe match is 1:1.
    joined = o.join(
        n, F.col("_id_old").eqNullSafe(F.col("_id_new")), "full_outer"
    )
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(F.col("_fp_old").eqNullSafe(F.col("_fp_new")), "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        F.coalesce(F.col("_id_old"), F.col("_id_new")).alias(id_col),
        status.alias("status"),
    )


_UNICODE_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_text(
    df: DataFrame, col: str = "text", form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """Unicode-normalize a text column (UAX #15) — the canonicalization
    pass every tokenizer pipeline runs before fingerprinting or BPE, so
    that ``é`` (composed) and ``e`` + U+0301 (decomposed) stop being
    distinct tokens/fingerprints.

    Spark has no normalization built-in, so this is one of the few
    legitimate Python crossings: a vectorized (Arrow) pandas UDF over
    ``Series.str.normalize`` — batched, map-only, no shuffle; NULLs pass
    through. ``form`` is one of NFC/NFD/NFKC/NFKD (NFC for dedup
    canonicalization, NFKC when compatibility characters — ligatures,
    fullwidth forms — must also collapse).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in _UNICODE_FORMS:
        raise ValueError(
            f"form must be one of {_UNICODE_FORMS}, got {form!r}"
        )
    out_col = out_col or col
    if out_col != col and out_col in df.columns:
        raise ValueError(
            f"normalize_text would duplicate existing column {out_col!r}; "
            "drop or rename it first"
        )
    # fail at the call, not as an AttributeError inside the executor:
    # the pandas `.str` accessor needs actual strings
    from pyspark.sql.types import StringType

    if not isinstance(df.schema[col].dataType, StringType):
        raise ValueError(
            f"normalize_text requires a string column; {col!r} is "
            f"{df.schema[col].dataType.simpleString()}"
        )

    def _norm(s):
        return s.str.normalize(form)

    # real annotation objects: the module-level `from __future__ import
    # annotations` would stringify inline hints, which the pandas_udf
    # signature inference rejects (same shape as q_sql_udf_tokens)
    _norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_norm, "string")(F.col(col)))


def token_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
    scale: int = 1 << 12,
) -> DataFrame:
    """Distribution drift between two corpus snapshots as per-token
    Jensen–Shannon divergence contributions — the monitoring step a
    pipeline runs between crawls (or between a source and its filtered
    output) to see WHICH tokens moved, not just that something did
    (Lin 1991, "Divergence measures based on the Shannon entropy" —
    public IEEE TIT classic).

    All-integer surrogate so any engine replays it bit-for-bit: token
    probabilities quantize to parts-per-million (``cnt · 10⁶ div
    total`` — tokens rarer than 1 ppm quantize to 0 and contribute 0,
    the documented floor), logs are the Mitchell fixed-point
    :func:`...classify.quantized_log2`, and each side's contribution is

        ``p · (Q(2p) − Q(p + q))``   (0 when p = 0)

    — the JSD term ``p·log₂(2p/(p+q))`` with the ratio folded into a
    Q-difference. ``contrib_q`` (the two sides' sum, in ppm·Q units)
    ranks tokens; output is the ``top_k`` by ``contrib_q`` DESC /
    token ASC with both counts and both ppm shares. Exact-math JSD
    terms are ≥ 0; here a token whose shares are NEAR-EQUAL can go
    slightly negative — the signed Mitchell residual, bounded by
    ``0.086·scale·(p+q)`` — while a genuinely drifted token's signal
    is ``~scale·p`` (an order of magnitude above the error floor), so
    the RANKING is what this operator exports, not a calibrated total
    divergence.

    100 TB plan: two token-count aggregates (map-side combined) + the
    two 1-row totals broadcast via crossJoin + ONE full-outer join on
    token + a partial top-k (TakeOrderedAndProject) — raw documents
    are scanned once per side and never shuffled."""
    from dataproc_spark.extensions.classify import quantized_log2

    if top_k < 1:
        raise ValueError(f"token_drift: top_k must be >= 1, got {top_k}")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    ca, cb = counts(a, "a_cnt"), counts(b, "b_cnt")
    tot = ca.agg(F.sum("a_cnt").alias("_ta")).crossJoin(
        cb.agg(F.sum("b_cnt").alias("_tb"))
    )
    m = F.lit(1_000_000).cast("long")
    joined = (
        ca.join(cb, "token", "full_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.coalesce("a_cnt", F.lit(0).cast("long")).alias("a_cnt"),
            F.coalesce("b_cnt", F.lit(0).cast("long")).alias("b_cnt"),
            F.col("_ta"), F.col("_tb"),
        )
    )
    # an EMPTY side has NULL total: every token of the other side is
    # then "all drift" by definition — surface it, don't NULL-divide
    p = F.when(
        F.col("_ta").isNull(),
        F.raise_error(F.lit("token_drift: snapshot `a` has no tokens")),
    ).otherwise(F.call_function("div", F.col("a_cnt") * m, F.col("_ta")))
    q = F.when(
        F.col("_tb").isNull(),
        F.raise_error(F.lit("token_drift: snapshot `b` has no tokens")),
    ).otherwise(F.call_function("div", F.col("b_cnt") * m, F.col("_tb")))
    scored = joined.select(
        "token", "a_cnt", "b_cnt",
        p.alias("p_ppm"), q.alias("q_ppm"),
    )

    def term(own: str, other: str) -> F.Column:
        two = F.lit(2).cast("long") * F.col(own)
        mix = F.col(own) + F.col(other)
        return F.when(
            F.col(own) > 0,
            F.col(own) * (quantized_log2(two, scale)
                          - quantized_log2(mix, scale)),
        ).otherwise(F.lit(0).cast("long"))

    return (
        scored.withColumn(
            "contrib_q", term("p_ppm", "q_ppm") + term("q_ppm", "p_ppm")
        )
        .orderBy(F.col("contrib_q").desc(), F.col("token").asc())
        .limit(int(top_k))
    )
