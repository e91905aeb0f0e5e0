"""Driver-contract query registry: every implemented operator as a
(spark_callable, duckdb_oracle_sql) pair over the testdata tables.

The selective-search shapes are instantiated from the TPC-H-ish star
schema (FIXTURES.md §B mapping): ``query`` = l_orderkey % 7, ``shard`` =
l_suppkey % 5, ``bucket`` = l_linenumber % 2, ``score`` = revenue in
integer cents. **All aggregate arithmetic is exact-integer** (money in
cents via round(x*100), integer `div`, row_number with total tie-break
orders) so Spark and DuckDB produce bit-identical values regardless of
floating-point summation order — the one systematic hazard of
cross-engine value-hash comparison.

Oracle SQL strings are ANSI-ish DuckDB SQL against the pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings). Rows-only entries (no SQL) are the genuinely
non-relational ops: the greedy bucket resolver (sequential stateful walk)
and the LSH pipelines (hash-function-dependent candidates).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dataproc_spark.queries._tables import (  # noqa: F401
    TABLES,
    _t,
    register_tables,
)
from dataproc_spark.queries.selective import *  # noqa: F401,F403
from dataproc_spark.queries.tpch import *  # noqa: F401,F403
from dataproc_spark.queries.events import *  # noqa: F401,F403
from dataproc_spark.queries.streaming import *  # noqa: F401,F403
from dataproc_spark.queries.dedup import *  # noqa: F401,F403
from dataproc_spark.queries.documents import *  # noqa: F401,F403
from dataproc_spark.queries.vocab import *  # noqa: F401,F403
from dataproc_spark.queries.embeddings import *  # noqa: F401,F403
from dataproc_spark.queries.diagnostics import *  # noqa: F401,F403
from dataproc_spark.queries.web import *  # noqa: F401,F403


#: name -> (spark callable, oracle SQL or None for rows-only checks)
#:
#: ORDERING CONTRACT: the driver's correctness gate records only the FIRST
#: 50 registry entries each round.  Entries are therefore ordered by
#: verification need, not by topic: (a) queries whose freshest driver
#: evidence is oldest (rotated into the window this round), (b) queries
#: whose implementation or oracle changed this round, (c) core sentinels,
#: then (d) everything already green in a recent round (the r3/r4
#: extension wave; their evidence stands in CORRECTNESS_r03/r04).
#: COVERAGE.md records which round vouches for which entry.
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # -- (a) r05 verification window: the 43 queries whose only driver
    # -- evidence was CORRECTNESS_r02 (rotated in), including the whole
    # -- events/streaming family repaired this round -----------------------
    "selection_rank": (q_selection_rank, SQL_SELECTION_RANK),
    "select_with_decay": (q_select_with_decay, SQL_SELECT_WITH_DECAY),
    "evaluate_buckets": (q_evaluate_buckets, SQL_EVALUATE_BUCKETS),
    "evaluate_measures": (q_evaluate_measures, SQL_EVALUATE_MEASURES),
    "trec_export": (q_trec_export, SQL_TREC_EXPORT),
    "cartesian": (q_cartesian, SQL_CARTESIAN),
    "load_selection_csv": (q_load_selection_csv, SQL_LOAD_SELECTION_CSV),
    "load_bucket_selection_csv": (
        q_load_bucket_selection_csv,
        SQL_LOAD_BUCKET_SELECTION_CSV,
    ),
    "shard_results_roundtrip": (
        q_shard_results_roundtrip,
        SQL_SHARD_RESULTS_ROUNDTRIP,
    ),
    "select_buckets": (q_select_buckets, SQL_SELECT_BUCKETS),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "rollup_pricing": (q_rollup_pricing, SQL_ROLLUP_PRICING),
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "customers_without_orders": (
        q_customers_without_orders,
        SQL_CUSTOMERS_WITHOUT_ORDERS,
    ),
    "exists_orders": (q_exists_orders, SQL_EXISTS_ORDERS),
    "parts_above_brand_avg": (
        q_parts_above_brand_avg,
        SQL_PARTS_ABOVE_BRAND_AVG,
    ),
    "nations_above_avg_revenue": (
        q_nations_above_avg_revenue,
        SQL_NATIONS_ABOVE_AVG_REVENUE,
    ),
    "returnflag_pivot": (q_returnflag_pivot, SQL_RETURNFLAG_PIVOT),
    "priority_intersect": (q_priority_intersect, SQL_PRIORITY_INTERSECT),
    "priority_except": (q_priority_except, SQL_PRIORITY_EXCEPT),
    "left_join_fill": (q_left_join_fill, SQL_LEFT_JOIN_FILL),
    "orders_by_month": (q_orders_by_month, SQL_ORDERS_BY_MONTH),
    "union_all_sources": (q_union_all_sources, SQL_UNION_ALL_SOURCES),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "events_range_window": (q_events_range_window, SQL_EVENTS_RANGE_WINDOW),
    "cube_doc_stats": (q_cube_doc_stats, SQL_CUBE_DOC_STATS),
    "merge_schema_scan": (q_merge_schema_scan, SQL_MERGE_SCHEMA_SCAN),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "events_json": (q_events_json, SQL_EVENTS_JSON),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "latest_per_user": (q_latest_per_user, SQL_LATEST_PER_USER),
    "stream_hourly": (q_stream_hourly, SQL_EVENTS_HOURLY),
    "stream_sessions": (q_stream_sessions, SQL_STREAM_SESSIONS),
    "stream_dedup_bounded": (q_stream_dedup_bounded, SQL_STREAM_DEDUP_BOUNDED),
    "stream_enrich": (q_stream_enrich, SQL_STREAM_ENRICH),
    "stream_stream_join": (q_stream_stream_join, SQL_STREAM_STREAM_JOIN),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash": (q_dedup_minhash, None),
    "dedup_minhash_portable": (
        q_dedup_minhash_portable, SQL_DEDUP_MINHASH_PORTABLE,
    ),
    "dedup_simhash": (q_dedup_simhash, None),
    # -- (b) failed in r03/r04 (events ts type), fixed this round ----------
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "top_events_daily": (q_top_events_daily, SQL_TOP_EVENTS_DAILY),
    "stream_dedup": (q_stream_dedup, SQL_STREAM_DEDUP),
    # -- (c) core sentinels -------------------------------------------------
    "select_top_t": (q_select_top_t, SQL_SELECT_TOP_T),
    "evaluate_sweep": (q_evaluate_sweep, SQL_EVALUATE_SWEEP),
    "resolve_buckets": (q_resolve_buckets, SQL_RESOLVE_BUCKETS),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    # ======================= 50-entry window boundary ======================
    # -- (d) extension wave: green rows in CORRECTNESS_r03/r04 -------------
    "dedup_simhash_portable": (
        q_dedup_simhash_portable, SQL_DEDUP_SIMHASH_PORTABLE,
    ),
    "dedup_cc": (q_dedup_cc, SQL_DEDUP_CC),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "doc_sample": (q_doc_sample, SQL_DOC_SAMPLE),
    "mixture_sample": (q_mixture_sample, SQL_MIXTURE_SAMPLE),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "salted_token_counts": (q_salted_token_counts, SQL_SALTED_TOKEN_COUNTS),
    "salted_join": (q_salted_join, SQL_SALTED_JOIN),
    "count_min": (q_count_min, SQL_COUNT_MIN),
    "bloom_filter": (q_bloom_filter, SQL_BLOOM_FILTER),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "median_tokens": (q_median_tokens, SQL_MEDIAN_TOKENS),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "corpus_prep": (q_corpus_prep, SQL_CORPUS_PREP),
    "chunk_documents": (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
    "shuffle_order": (q_shuffle_order, SQL_SHUFFLE_ORDER),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "redact_pii": (q_redact_pii, SQL_REDACT_PII),
    "curriculum_bins": (q_curriculum_bins, SQL_CURRICULUM_BINS),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "bigram_lm": (q_bigram_lm, SQL_BIGRAM_LM),
    "jsonl_roundtrip": (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP),
    "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    "orc_roundtrip": (q_orc_roundtrip, SQL_ORC_ROUNDTRIP),
    "partitioned_scan": (q_partitioned_scan, SQL_PARTITIONED_SCAN),
    "label_centroids": (q_label_centroids, SQL_LABEL_CENTROIDS),
    "ann_ivf_exact": (q_ann_ivf_exact, SQL_ANN_IVF_EXACT),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "ngram_jaccard_maxdf": (q_ngram_jaccard_maxdf, SQL_NGRAM_JACCARD_MAXDF),
    "decontaminate_maxdf": (q_decontaminate_maxdf, SQL_DECONTAMINATE_MAXDF),
    "quality_filter": (q_quality_filter, SQL_QUALITY_FILTER),
    "bpe_token_stats": (q_bpe_token_stats, SQL_BPE_TOKEN_STATS),
    "text_stats": (q_text_stats, SQL_TEXT_STATS),
    "token_topk": (q_token_topk, SQL_TOKEN_TOPK),
    "lang_predict": (q_lang_predict, SQL_LANG_PREDICT),
    "lang_mixture": (q_lang_mixture, SQL_LANG_MIXTURE),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
    "multimodal_bytes": (q_multimodal_bytes, SQL_MULTIMODAL_BYTES),
    "embed_near_dup": (q_embed_near_dup, SQL_EMBED_NEAR_DUP),
    "embed_lsh_near_dup": (q_embed_lsh_near_dup, SQL_EMBED_LSH_NEAR_DUP),
    "embed_lsh_recall": (q_embed_lsh_recall, SQL_EMBED_LSH_RECALL),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "dedup_spans": (q_dedup_spans, SQL_DEDUP_SPANS),
    "ann_recall": (q_ann_recall, SQL_ANN_RECALL),
    "embed_dedup": (q_embed_dedup, SQL_EMBED_DEDUP),
    "doc_novelty": (q_doc_novelty, SQL_DOC_NOVELTY),
    "select_token_budget": (q_select_token_budget, SQL_SELECT_TOKEN_BUDGET),
    "stream_sink_roundtrip": (q_stream_sink_roundtrip, SQL_EVENTS_HOURLY),
    "funnel_steps": (q_funnel_steps, SQL_FUNNEL_STEPS),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "user_event_sequences": (q_user_event_sequences, SQL_USER_EVENT_SEQUENCES),
    "stream_funnel": (q_stream_funnel, SQL_FUNNEL_STEPS),
    "sql_events_hourly": (q_sql_events_hourly, SQL_EVENTS_HOURLY),
    "events_resample": (q_events_resample, SQL_EVENTS_RESAMPLE),
    "dedup_cluster_sizes": (q_dedup_cluster_sizes, SQL_DEDUP_CLUSTER_SIZES),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "incremental_dedup": (q_incremental_dedup, SQL_INCREMENTAL_DEDUP),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "ann_bucketed": (q_ann_bucketed, SQL_ANN_BUCKETED),
    "ann_ivf": (q_ann_ivf, None),
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q7": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q8": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q17": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q21": (q_tpch_q21, SQL_TPCH_Q21),
    "tpch_q22": (q_tpch_q22, SQL_TPCH_Q22),
    "sql_session_windows": (q_sql_session_windows, SQL_SESSION_WINDOWS),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q12": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q15": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q18": (q_tpch_q18, SQL_TPCH_Q18),
    "tpch_q19": (q_tpch_q19, SQL_TPCH_Q19),
    "temperature_mixture": (q_temperature_mixture, SQL_TEMPERATURE_MIXTURE),
    "quality_percentile": (q_quality_percentile, SQL_QUALITY_PERCENTILE),
    "stream_incremental_dedup": (
        q_stream_incremental_dedup,
        SQL_STREAM_INCREMENTAL_DEDUP,
    ),
    "embed_kmeans": (q_embed_kmeans, SQL_EMBED_KMEANS),
    "apply_changelog": (q_apply_changelog, SQL_APPLY_CHANGELOG),
    "zorder_key": (q_zorder_key, SQL_ZORDER_KEY),
    "tpch_q2": (q_tpch_q2, SQL_TPCH_Q2),
    "tpch_q9": (q_tpch_q9, SQL_TPCH_Q9),
    "tpch_q11": (q_tpch_q11, SQL_TPCH_Q11),
    "tpch_q16": (q_tpch_q16, SQL_TPCH_Q16),
    "tpch_q20": (q_tpch_q20, SQL_TPCH_Q20),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "corpus_diff": (q_corpus_diff, SQL_CORPUS_DIFF),
    "stream_hourly_append": (q_stream_hourly_append, SQL_STREAM_HOURLY_APPEND),
    "profile_table": (q_profile_table, SQL_PROFILE_TABLE),
    "validate_constraints": (q_validate_constraints, SQL_VALIDATE_CONSTRAINTS),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "window_suite": (q_window_suite, SQL_WINDOW_SUITE),
    "stream_upsert": (q_stream_upsert, SQL_STREAM_UPSERT),
    "from_json_extract": (q_from_json_extract, SQL_FROM_JSON_EXTRACT),
    "hof_suite": (q_hof_suite, SQL_HOF_SUITE),
    "sql_udf_tokens": (q_sql_udf_tokens, SQL_SQL_UDF_TOKENS),
    "rfm_segments": (q_rfm_segments, SQL_RFM_SEGMENTS),
    "hourly_anomalies": (q_hourly_anomalies, SQL_HOURLY_ANOMALIES),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "token_quantiles": (q_token_quantiles, SQL_TOKEN_QUANTILES),
    "skew_report": (q_skew_report, SQL_SKEW_REPORT),
    "centroid_similarity": (q_centroid_similarity, SQL_CENTROID_SIMILARITY),
    "dedup_rates": (q_dedup_rates, SQL_DEDUP_RATES),
    "rank_correlation": (q_rank_correlation, SQL_RANK_CORRELATION),
    # -- r7 additions: pipeline-operator wave ------------------------------
    "co_occurrence": (q_co_occurrence, SQL_CO_OCCURRENCE),
    "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "fuzzy_match": (q_fuzzy_match, SQL_FUZZY_MATCH),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "ngram_containment": (q_ngram_containment, SQL_NGRAM_CONTAINMENT),
    "binary_ingest": (q_binary_ingest, SQL_BINARY_INGEST),
    # -- r8 additions: URL/domain curation family --------------------------
    "url_host_parse": (q_url_host_parse, SQL_URL_HOST_PARSE),
    "domain_cap": (q_domain_cap, SQL_DOMAIN_CAP),
    "domain_mixture": (q_domain_mixture, SQL_DOMAIN_MIXTURE),
    "url_dedup": (q_url_dedup, SQL_URL_DEDUP),
    "bpe_apply": (q_bpe_apply, SQL_BPE_APPLY),
    "stream_upsert_multibatch": (
        q_stream_upsert_multibatch,
        SQL_STREAM_UPSERT_MULTIBATCH,
    ),
    "lm_surprisal": (q_lm_surprisal, SQL_LM_SURPRISAL),
    "html_extract": (q_html_extract, SQL_HTML_EXTRACT),
    "decontaminate_spans": (q_decontaminate_spans, SQL_DECONTAMINATE_SPANS),
    # -- r8 late additions: audio modality + unicode canonicalization ------
    "audio_decode": (q_audio_decode, SQL_AUDIO_DECODE),
    "unicode_normalize": (q_unicode_normalize, SQL_UNICODE_NORMALIZE),
    # -- r9 additions: production-realism curation (PSL eTLD+1) ------------
    "registered_domain_psl": (
        q_registered_domain_psl,
        SQL_REGISTERED_DOMAIN_PSL,
    ),
    "multimodal_jpeg": (q_multimodal_jpeg, SQL_MULTIMODAL_JPEG),
    "html_boilerplate": (q_html_boilerplate, SQL_HTML_BOILERPLATE),
    "ann_ivf_index_roundtrip": (
        q_ann_ivf_index_roundtrip,
        SQL_ANN_IVF_INDEX_ROUNDTRIP,
    ),
    "jpeg_meta": (q_jpeg_meta, SQL_JPEG_META),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "crawl_pipeline": (q_crawl_pipeline, SQL_CRAWL_PIPELINE),
    # -- r10 additions: real-archive realism --------------------------------
    "warc_http_split": (q_warc_http_split, SQL_WARC_HTTP_SPLIT),
    "lang_script_predict": (q_lang_script_predict, SQL_LANG_SCRIPT_PREDICT),
    "cross_doc_spans": (q_cross_doc_spans, SQL_CROSS_DOC_SPANS),
    # -- r11 additions: crawl text realism -----------------------------------
    "charset_body_text": (q_charset_body_text, SQL_CHARSET_BODY_TEXT),
    "warc_revisit_dedup": (q_warc_revisit_dedup, SQL_WARC_REVISIT_DEDUP),
    "html_unescape": (q_html_unescape, SQL_HTML_UNESCAPE),
    "robots_filter": (q_robots_filter, SQL_ROBOTS_FILTER),
    "wet_roundtrip": (q_wet_roundtrip, SQL_WET_ROUNDTRIP),
    "cdx_index": (q_cdx_index, SQL_CDX_INDEX),
    "line_dedup": (q_line_dedup, SQL_LINE_DEDUP),
    "mime_sniff": (q_mime_sniff, SQL_MIME_SNIFF),
    "sitemap_parse": (q_sitemap_parse, SQL_SITEMAP_PARSE),
    "link_extract": (q_link_extract, SQL_LINK_EXTRACT),
    # -- r13 additions: archive-consumer ring --------------------------------
    "redirect_resolve": (q_redirect_resolve, SQL_REDIRECT_RESOLVE),
    "cdx_lookup": (q_cdx_lookup, SQL_CDX_LOOKUP),
    "pdf_text": (q_pdf_text, SQL_PDF_TEXT),
    "host_graph": (q_host_graph, SQL_HOST_GRAPH),
    "frontier_schedule": (q_frontier_schedule, SQL_FRONTIER_SCHEDULE),
    "page_meta": (q_page_meta, SQL_PAGE_META),
    "wat_roundtrip": (q_wat_roundtrip, SQL_WAT_ROUNDTRIP),
    "jpeg_scrub": (q_jpeg_scrub, SQL_JPEG_SCRUB),
    "sitemap_tree": (q_sitemap_tree, SQL_SITEMAP_TREE),
    # -- r14 additions: corpus-construction signals --------------------------
    "anchor_rollup": (q_anchor_rollup, SQL_ANCHOR_ROLLUP),
    "image_pairs": (q_image_pairs, SQL_IMAGE_PAIRS),
    "doc_score": (q_doc_score, SQL_DOC_SCORE),
    "revisit_schedule": (q_revisit_schedule, SQL_REVISIT_SCHEDULE),
    "warc_pair": (q_warc_pair, SQL_WARC_PAIR),
    "image_dedup": (q_image_dedup, SQL_IMAGE_DEDUP),
    "wat_enriched": (q_wat_enriched, SQL_WAT_ENRICHED),
    "recrawl_due": (q_recrawl_due, SQL_RECRAWL_DUE),
    "multimodal_pipeline": (
        q_multimodal_pipeline, SQL_MULTIMODAL_PIPELINE,
    ),
    "audio_dedup": (q_audio_dedup, SQL_AUDIO_DEDUP),
    "warc_offsets": (q_warc_offsets, SQL_WARC_OFFSETS),
    # -- r15 additions: the train→score loop + semantic dedup ring ----------
    "nb_train_score": (q_nb_train_score, SQL_NB_TRAIN_SCORE),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "image_dedup_256": (q_image_dedup_256, SQL_IMAGE_DEDUP_256),
    "warc_revisit_write": (q_warc_revisit_write, SQL_WARC_REVISIT_WRITE),
    "nb_model_roundtrip": (q_nb_model_roundtrip, SQL_NB_MODEL_ROUNDTRIP),
    # -- late-r15 wave: PQ compression/search, incremental near-dup index,
    # -- corpus drift ---------------------------------------------------------
    "ann_pq": (q_ann_pq, SQL_ANN_PQ),
    "incremental_near_dup": (
        q_incremental_near_dup, SQL_INCREMENTAL_NEAR_DUP,
    ),
    "corpus_drift": (q_corpus_drift, SQL_CORPUS_DRIFT),
    "pq_index_roundtrip": (q_pq_index_roundtrip, SQL_PQ_INDEX_ROUNDTRIP),
    "ann_ivfpq": (q_ann_ivfpq, SQL_ANN_IVFPQ),
    "pq_recall": (q_pq_recall, SQL_PQ_RECALL),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
}


#: flagship gates that should appear in every round's recorded window
ALWAYS_VERIFY = ("select_top_t", "evaluate_sweep", "resolve_buckets", "tpch_q6")

#: gates whose IMPLEMENTATION or oracle changed after their latest green
#: driver row, pinned into the verification window until a newer row
#: exists: ``name -> round of the now-stale evidence`` (the pin lifts
#: automatically once a row from a later round lands, so a forgotten
#: entry costs one window slot for exactly one round, never forever).
#: Curated per round by the builder alongside the round's changes.
#: r11: four gates were rebased DURING r10 after their newest driver
#: rows (r9) were recorded, so those rows vouch for pre-rebase behavior
#: (r10 VERDICT finding): registered_domain_psl (full 1,074-rule PSL
#: snapshot replaced the curated subset), multimodal_jpeg (fixtures now
#: carry progressive/restart/subsampled streams), and lang_predict /
#: lang_mixture (the trigram profile constant gained non-Latin
#: languages). crawl_pipeline's r10 pin self-lifted (green r10 row).
REVERIFY_STALE_EVIDENCE: dict[str, int] = {
    # (the r14 pin — link_extract — re-recorded green in r14 and
    # self-lifted)
    # r15: the WARC sink's record-id derivation folded WARC-Type in
    # (ISO 28500 uniqueness fix) and grew record_id_col — warc_pair now
    # mints its own ids, warc_revisit_dedup/warc_offsets exercise the
    # new derivation; anchor_rollup's fixture/oracle were rebased (the
    # nested-tag arm now genuinely merges); image_pairs/
    # multimodal_pipeline ride the image_text_pairs figcaption-nullif
    # fix. All r14 rows vouch for pre-fix behavior.
    "warc_pair": 14,
    "warc_revisit_dedup": 11,
    # r15: cdx_lookup rebased onto the on-disk write_sorted_cdx →
    # write_zipnum_index → load_cdx(pruned) chain
    "cdx_lookup": 13,
    "warc_offsets": 14,
    "anchor_rollup": 14,
    "image_pairs": 14,
    "multimodal_pipeline": 14,
}

#: per-process cache for :func:`registry_order`, keyed on the artifact
#: files' (path, mtime, size) fingerprint
_REGISTRY_ORDER_CACHE: dict = {}


def registry_order(artifacts_dir: str | None = None) -> list[str]:
    """Registry names ordered by verification need, computed from the
    repo's own ``CORRECTNESS_r*.json`` artifacts.

    The driver records correctness rows for only the FIRST 50 entries it
    sees, so with ~100 registry entries the window must rotate or new and
    stale queries silently stop being verified (how the r4 events-ts
    breakage stayed invisible for a round). Priority buckets:

    1. entries whose LATEST recorded row is a failure (re-verify now),
    2. the :data:`ALWAYS_VERIFY` flagship sentinels,
    3. entries never recorded in any round,
    4. everything else, stalest green round first.

    Ties break by literal REGISTRY position, so the order is fully
    deterministic given the artifact files. The dynamic ordering only
    activates once round 5's artifact exists (``max recorded round >=
    5``); before that — including during round 5's own verify — the
    hand-curated literal order stands. Any artifact problem falls back to
    the literal order: ordering must never break ``queries()`` — but the
    fallback is loudly announced on stderr so a silently frozen rotation
    (the failure mode the rotation exists to prevent) stays visible.

    The computed order is cached per process, keyed on the artifact
    files' (path, mtime, size) fingerprint, so repeated
    ``queries()``/``oracle_sql()`` calls don't re-parse every
    ``CORRECTNESS_r*.json``.
    """
    import glob
    import json
    import os
    import re
    import sys

    names = list(REGISTRY)
    # resolve the artifact location ONCE — the fingerprint and the parse
    # below must always read the same files, or the cache key silently
    # desynchronizes from the data it stands for
    # __file__ is the package __init__, one level deeper than the old
    # queries.py module — three dirnames reach the repo root
    root = artifacts_dir or os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))
    artifact_paths = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    )
    try:
        cache_key = tuple(
            (p, os.path.getmtime(p), os.path.getsize(p))
            for p in artifact_paths
        )
        cached = _REGISTRY_ORDER_CACHE.get(cache_key)
        if cached is not None:
            return list(cached)
    except Exception:
        cache_key = None
    try:
        latest_green: dict[str, int] = {}
        latest_any: dict[str, int] = {}
        max_round = 0
        for path in artifact_paths:
            m = re.search(r"_r0*(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            with open(path) as fh:
                data = json.load(fh)
            if not isinstance(data, dict):
                continue
            max_round = max(max_round, rnd)
            for name, row in data.items():
                if not isinstance(row, dict):
                    continue
                latest_any[name] = max(latest_any.get(name, -1), rnd)
                green = (
                    row.get("rows_match") is True
                    and row.get("schema_match") is True
                    and row.get("hash_match") is not False
                )
                # rows-only entries (no oracle by design) are recorded as
                # rows_match=None with err='no_oracle'; the query RAN and
                # its weaker check passed — don't pin them in the failure
                # bucket forever
                rows_only_ok = (
                    row.get("rows_match") is None
                    and row.get("spark_rows") is not None
                    and row.get("err") in (None, "no_oracle")
                )
                if green or rows_only_ok:
                    latest_green[name] = max(latest_green.get(name, -1), rnd)
        if max_round < 5:
            return names
        pos = {n: i for i, n in enumerate(names)}

        def key(n: str):
            lg = latest_green.get(n, -1)
            la = latest_any.get(n, -1)
            if la > lg:  # latest recorded row failed
                bucket = 0
            elif n in ALWAYS_VERIFY:
                bucket = 1
            elif la == -1:  # never recorded
                bucket = 2
            elif lg <= REVERIFY_STALE_EVIDENCE.get(n, -1):
                # implementation changed after its newest green row —
                # that row vouches for the OLD behavior; re-record now
                bucket = 2
            else:
                bucket = 3
            return (bucket, lg, pos[n])

        ordered = sorted(names, key=key)
        if cache_key is not None:
            _REGISTRY_ORDER_CACHE[cache_key] = list(ordered)
        return ordered
    except Exception as exc:  # pragma: no cover - defensive
        print(
            "dataproc_spark.queries.registry_order: falling back to the "
            f"literal REGISTRY order ({type(exc).__name__}: {exc}); the "
            "verification rotation is FROZEN until the CORRECTNESS_r*.json "
            "artifacts parse again",
            file=sys.stderr,
        )
        return names


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name][0] for name in registry_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1]
        for name in registry_order()
        if REGISTRY[name][1] is not None
    }

