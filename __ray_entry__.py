"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from sotohp_ray.functions.tokenizer import sql_token_expr
from sotohp_ray.pipelines import (
    ann,
    multimodal,
    relational,
    textops,
    training,
)
from sotohp_ray.pipelines.fulltext import (
    DELETED_DOC_IDS,
    FILTER_LANG,
    UPDATED_DOC_IDS,
    bm25_facets,
    bm25_facets_sql,
    significant_terms,
    significant_terms_sql,
    hybrid_search_rrf,
    hybrid_search_rrf_sql,
    bm25_top_per_lang,
    bm25_top_per_lang_sql,
    bm25_length_facets,
    bm25_length_facets_sql,
    search_sort_by_length,
    search_sort_by_length_sql,
    term_vectors,
    term_vectors_sql,
    index_disk_usage,
    index_snapshot,
    bm25_lang_stats,
    bm25_lang_stats_sql,
    keyword_search_excluding,
    keyword_search_excluding_sql,
    keyword_search_indexed,
    bm25_oracle_sql,
    bm25_topk,
    bm25_topk_deleted,
    bm25_topk_delete_by_query,
    bm25_topk_update_by_query,
    UPDATE_QUERY,
    DELETE_QUERY,
    bm25_topk_distributed,
    bm25_topk_filtered,
    bm25_topk_paged,
    bm25_paged_sql,
    bm25_topk_filtered_paged,
    bm25_filtered_paged_sql,
    bm25_topk_updated,
    term_positions,
    term_positions_sql,
    fuzzy_search,
    fuzzy_search_sql,
    bm25_fuzzy_topk,
    bm25_fuzzy_topk_sql,
    bm25_pinned,
    bm25_pinned_sql,
    bm25_decay,
    bm25_decay_sql,
    terms_set_search,
    terms_set_search_sql,
    bm25_random_score,
    bm25_random_score_sql,
    phrase_oracle_sql,
    phrase_topk,
    phrase_prefix_topk,
    phrase_prefix_oracle_sql,
    analyze_texts,
    analyze_texts_sql,
    bm25_rescore_phrase,
    bm25_rescore_phrase_sql,
    prefix_search,
    prefix_search_sql,
    regex_search,
    regex_search_sql,
    search_snippets,
    search_snippets_sql,
    similar_docs,
    similar_docs_sql,
    suggest_terms,
    suggest_terms_sql,
    spell_correct,
    spell_correct_sql,
    suggest_phrase,
    suggest_phrase_sql,
    contains_search,
    contains_search_sql,
    suffix_search,
    suffix_search_sql,
    bm25_min_should_match,
    bm25_min_should_match_sql,
    bm25_topk_boosted,
    bm25_explain,
    bm25_explain_sql,
    bm25_dismax,
    bm25_dismax_sql,
    bm25_boosting,
    bm25_boosting_sql,
    synonym_search,
    synonym_search_sql,
    tfidf_topk,
    tfidf_topk_sql,
    proximity_oracle_sql,
    proximity_topk,
    span_near_topk,
    span_near_oracle_sql,
    docs_mget,
    docs_mget_sql,
    term_adjacency_matrix,
    term_adjacency_matrix_sql,
    search_count,
    search_count_sql,
)


_KNN_COSINE_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    s AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(
               e.embedding::DOUBLE[], q.qe::DOUBLE[]), 5) AS score
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, score FROM s
    QUALIFY row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, vec_id ASC
    ) <= 10
"""


_KNN_MMR_LAMBDA1_SQL = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
    ),
    s AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(
               e.embedding::DOUBLE[], q.qe::DOUBLE[]), 5) AS score
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, vec_id ASC
             ) - 1 AS rank
      FROM s
    )
    SELECT query_id, rank, vec_id, score, score AS mmr
    FROM ranked WHERE rank < 10
"""


def entry() -> Any:
    """Flagship pipeline: build the inverted index over the sf0.001
    documents table through the full engine (SPIMI map_batches actor
    pool -> groupby merge -> compressed postings) and answer the fixed
    BM25 query set."""
    return bm25_topk("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- full-text engine (the north star) ---
        "bm25_topk": lambda sf: bm25_topk(sf),
        "bm25_topk_distributed": lambda sf: bm25_topk_distributed(sf),
        "bm25_topk_deleted": lambda sf: bm25_topk_deleted(sf),
        "bm25_topk_delete_by_query":
            lambda sf: bm25_topk_delete_by_query(sf),
        "bm25_topk_update_by_query":
            lambda sf: bm25_topk_update_by_query(sf),
        "bm25_topk_updated": lambda sf: bm25_topk_updated(sf),
        "bm25_topk_filtered": lambda sf: bm25_topk_filtered(sf),
        "bm25_topk_paged": lambda sf: bm25_topk_paged(sf),
        "bm25_topk_filtered_paged": lambda sf: bm25_topk_filtered_paged(sf),
        "term_positions": lambda sf: term_positions(sf),
        "prefix_search": lambda sf: prefix_search(sf),
        "suggest_terms": lambda sf: suggest_terms(sf),
        "spell_correct": lambda sf: spell_correct(sf),
        "suggest_phrase": lambda sf: suggest_phrase(sf),
        "contains_search": lambda sf: contains_search(sf),
        "suffix_search": lambda sf: suffix_search(sf),
        "bm25_min_should_match": lambda sf: bm25_min_should_match(sf),
        "bm25_topk_boosted": lambda sf: bm25_topk_boosted(sf),
        "bm25_explain": lambda sf: bm25_explain(sf),
        "bm25_dismax": lambda sf: bm25_dismax(sf),
        "bm25_boosting": lambda sf: bm25_boosting(sf),
        "synonym_search": lambda sf: synonym_search(sf),
        "tfidf_topk": lambda sf: tfidf_topk(sf),
        "regex_search": lambda sf: regex_search(sf),
        "fuzzy_search": lambda sf: fuzzy_search(sf),
        "bm25_fuzzy_topk": lambda sf: bm25_fuzzy_topk(sf),
        "bm25_pinned": lambda sf: bm25_pinned(sf),
        "bm25_decay": lambda sf: bm25_decay(sf),
        "bm25_random_score": lambda sf: bm25_random_score(sf),
        "terms_set_search": lambda sf: terms_set_search(sf),
        "search_snippets": lambda sf: search_snippets(sf),
        "similar_docs": lambda sf: similar_docs(sf),
        "phrase_topk": lambda sf: phrase_topk(sf),
        "phrase_prefix_topk": lambda sf: phrase_prefix_topk(sf),
        "analyze_texts": lambda sf: analyze_texts(sf),
        "bm25_rescore_phrase": lambda sf: bm25_rescore_phrase(sf),
        "proximity_topk": lambda sf: proximity_topk(sf),
        "span_near_topk": lambda sf: span_near_topk(sf),
        "docs_mget": lambda sf: docs_mget(sf),
        "term_adjacency_matrix": lambda sf: term_adjacency_matrix(sf),
        "search_count": lambda sf: search_count(sf),
        "bm25_facets": lambda sf: bm25_facets(sf),
        "significant_terms": lambda sf: significant_terms(sf),
        "hybrid_search_rrf": lambda sf: hybrid_search_rrf(sf),
        "bm25_top_per_lang": lambda sf: bm25_top_per_lang(sf),
        "bm25_length_facets": lambda sf: bm25_length_facets(sf),
        "search_sort_by_length": lambda sf: search_sort_by_length(sf),
        "term_vectors": lambda sf: term_vectors(sf),
        "index_disk_usage": lambda sf: index_disk_usage(sf),  # rows-only (fs stat)
        "index_snapshot": lambda sf: index_snapshot(sf),  # rows-only (fs state machine)
        "bm25_lang_stats": lambda sf: bm25_lang_stats(sf),
        "keyword_search_indexed": lambda sf: keyword_search_indexed(sf),
        "keyword_search_excluding": lambda sf: keyword_search_excluding(sf),
        "term_df": textops.term_df,
        "rare_terms": textops.rare_terms,
        "term_heavy_hitters": textops.term_heavy_hitters,
        "term_heavy_hitters_cms": textops.term_heavy_hitters_cms,  # rows-only (sketch; exact twin above)
        "token_counts": textops.token_counts,
        "token_estimate": textops.token_estimate,
        "doc_sha256": textops.doc_sha256,
        # --- text analysis / quality ---
        "quality_stats": textops.quality_stats,
        "doc_repetition": textops.doc_repetition,
        "doc_entropy": textops.doc_entropy,
        "doc_compress_ratio": textops.doc_compress_ratio,   # rows-only
        # the composed end-to-end cleaning pipeline (exact dedup x
        # exact near-dedup x quality x decontamination), one operator
        # with one composed oracle
        "corpus_prepare": textops.corpus_prepare,
        # supervised NB language model: the trained model's scores are
        # the oracle-gated surface; argmax predictions are rows-only
        # (sub-1e-6 knife edges could flip between engines)
        "nb_lang_scores": textops.nb_lang_scores,
        "nb_lang_predictions": textops.nb_lang_predictions,  # rows-only
        "doc_dup_grams": textops.doc_dup_grams,
        "doc_dup_spans": textops.doc_dup_spans,
        "corpus_dedup_substrings": textops.corpus_dedup_substrings,  # rows-only
        "similarity_pagerank": textops.similarity_pagerank,  # rows-only (iterative)
        "decontaminate": textops.decontaminate,
        "decontaminate_bloom": textops.decontaminate_bloom,
        "doc_quality_signals": textops.doc_quality_signals,
        "corpus_quality_filter": textops.corpus_quality_filter,
        # --- training-data preparation ---
        "percolate": textops.percolate,
        "token_budget_mixture": training.token_budget_mixture,
        "docs_pii_redacted": training.docs_pii_redacted,
        "doc_chunks": training.doc_chunks,
        "doc_oov_rate": training.doc_oov_rate,
        # BPE subword induction (Sennrich 2016): iterative greedy
        # argmax -> rows-only, reference-equality pytest
        "bpe_train": training.bpe_train,                    # rows-only
        "bpe_token_count": training.bpe_token_count,        # rows-only
        "doc_lm_score": training.doc_lm_score,
        "dsir_weights": training.dsir_weights,
        "training_shards": training.training_shards,
        "doc_span_corruption": training.doc_span_corruption,
        "dataset_split": training.dataset_split,
        "doc_packing": training.doc_packing,
        "training_curriculum": training.training_curriculum,
        "lang_guess": textops.lang_guess,
        "lang_confusion": textops.lang_confusion,
        "keyword_search": textops.keyword_search,
        "corpus_stats": textops.corpus_stats,
        "bigram_counts": textops.bigram_counts,
        "bigram_pmi": textops.bigram_pmi,
        "skipgram_pmi": textops.skipgram_pmi,
        "corpus_zipf_fit": textops.corpus_zipf_fit,
        "sample_stratified": textops.sample_stratified,
        "sample_weighted": textops.sample_weighted,
        "sample_random": textops.sample_random,
        "doc_length_histogram": textops.doc_length_histogram,
        "doc_length_quantiles": textops.doc_length_quantiles,
        "doc_keywords": textops.doc_keywords,
        "vocabulary_stats": textops.vocabulary_stats,
        # --- dedup family ---
        "dedup_exact": textops.dedup_exact,
        "corpus_dedup_exact": textops.corpus_dedup_exact,
        "corpus_dedup_near": textops.corpus_dedup_near,     # rows-only
        "minhash_candidates": textops.minhash_candidates,   # rows-only
        "near_dup_pairs": textops.near_dup_pairs,           # rows-only
        "near_dup_dedup": textops.near_dup_dedup,           # rows-only
        "set_similarity_join": textops.set_similarity_join,
        "similarity_components": textops.similarity_components,
        "simhash_fingerprints": textops.simhash_fingerprints,  # rows-only
        "simhash_near_dups": textops.simhash_near_dups,     # rows-only
        "doc_fingerprint": textops.doc_fingerprint,         # rows-only
        # --- similarity search ---
        "knn_cosine": ann.knn_cosine,
        "knn_cosine_filtered": ann.knn_cosine_filtered,
        "ann_ivf_search_filtered": ann.ann_ivf_search_filtered,  # rows-only
        "ann_ivf_filtered_fullprobe": ann.ann_ivf_filtered_fullprobe,
        "knn_label_consensus": ann.knn_label_consensus,
        "knn_range_search": ann.knn_range_search,
        "knn_mmr": ann.knn_mmr,                             # rows-only
        "knn_cosine_pq": ann.knn_cosine_pq,                 # rows-only
        "knn_cosine_pq_fullrerank": ann.knn_cosine_pq_fullrerank,
        "knn_cosine_binary": ann.knn_cosine_binary,  # rows-only (approximate; exact twin below)
        "knn_cosine_binary_fullrerank":
            ann.knn_cosine_binary_fullrerank,
        "ann_ivfpq_search": ann.ann_ivfpq_search,          # rows-only
        "ann_index_search": ann.ann_index_search,          # rows-only
        "ann_index_fullprobe": ann.ann_index_fullprobe,
        "ann_ivfpq_fullprobe_fullrerank":
            ann.ann_ivfpq_fullprobe_fullrerank,

        "ann_lsh_buckets": ann.ann_lsh_buckets,             # rows-only
        "embedding_near_dup": ann.embedding_near_dup,
        "semdedup": ann.semdedup,
        "ann_lsh_search": ann.ann_lsh_search,               # rows-only
        # zero hyperplanes = one universal bucket = every row is a
        # candidate, so the LSH path degenerates to exact brute force
        # and earns an oracle-gated row (the IVF-fullprobe trick)
        "ann_lsh_fullprobe": lambda sf: ann.ann_lsh_search(
            sf, n_planes=0, n_tables=1
        ),
        "ann_ivf_search": ann.ann_ivf_search,               # rows-only
        # full probe (n_probe == n_centroids) IS exact brute force, so
        # the IVF path earns an oracle-gated row, not just recall tests
        "ann_ivf_fullprobe": lambda sf: ann.ann_ivf_search(
            sf, n_centroids=32, n_probe=32
        ),
        "ann_ivf_buckets": ann.ann_ivf_buckets,             # rows-only
        # lambda=1 MMR is pure relevance: the greedy argmax visits the
        # candidates in (score desc, vec_id asc) order, i.e. the exact
        # top-k — the diversified path earns an oracle-gated row while
        # the diversification semantics stay pytest-gated
        "knn_mmr_lambda1": lambda sf: ann.knn_mmr(sf, lam=1.0),
        "knn_cosine_quantized": ann.knn_cosine_quantized,   # rows-only
        # full re-rank (depth >= corpus) == exact brute force, so the
        # quantized path gets an oracle-gated row too
        "knn_cosine_quantized_fullrerank": lambda sf:
            ann.knn_cosine_quantized(sf, depth=10**9),
        # --- multimodal binary columns ---
        "media_inventory": multimodal.media_inventory,
        "media_thumbnails": multimodal.media_thumbnails,
        "media_rotated": multimodal.media_rotated,
        "media_frame_sample": multimodal.media_frame_sample,
        "media_features": multimodal.media_features,        # rows-only
        # --- relational / streaming-shaped operator coverage ---
        "q1_pricing_summary": relational.q1_pricing_summary,
        "customers_per_region": relational.customers_per_region,
        "top_customers_by_spend": relational.top_customers_by_spend,
        "events_hourly": relational.events_hourly,
        "events_prev_gap": relational.events_prev_gap,
        "events_type_stats": relational.events_type_stats,
        "events_topk_by_value": relational.events_topk_by_value,
        "events_topn_per_user": relational.events_topn_per_user,
        "events_hopping_window": relational.events_hopping_window,
        "events_rolling_max": relational.events_rolling_max,
        "events_distinct_users": relational.events_distinct_users,
        "orders_with_segment": relational.orders_with_segment,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_local_supplier_volume":
            relational.q5_local_supplier_volume,
        "q10_returned_items": relational.q10_returned_items,
        "q4_order_priority": relational.q4_order_priority,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q14_promo_revenue": relational.q14_promo_revenue,
        "q19_discounted_revenue": relational.q19_discounted_revenue,
        "q13_customer_distribution":
            relational.q13_customer_distribution,
        "q18_large_volume_customers":
            relational.q18_large_volume_customers,
        "q22_sales_opportunity": relational.q22_sales_opportunity,
        "q21_suppliers_who_kept_waiting":
            relational.q21_suppliers_who_kept_waiting,
        "q7_volume_shipping": relational.q7_volume_shipping,
        "q8_market_share": relational.q8_market_share,
        "q9_product_type_profit": relational.q9_product_type_profit,
        "q12_shipmode_priority": relational.q12_shipmode_priority,
        "q15_top_supplier": relational.q15_top_supplier,
        "q17_small_quantity_revenue":
            relational.q17_small_quantity_revenue,
        "events_matrix_stats": relational.events_matrix_stats,
        "events_moving_avg": relational.events_moving_avg,
        "events_running_total": relational.events_running_total,
        "events_markov_transitions":
            relational.events_markov_transitions,
        "events_attribution": relational.events_attribution,
        "events_ab_ztest": relational.events_ab_ztest,
        "events_profile": relational.events_profile,
        "events_rollup": relational.events_rollup,
        "events_global_running_total":
            relational.events_global_running_total,
        "events_cross_correlation":
            relational.events_cross_correlation,
        "customer_cohort_ltv": relational.customer_cohort_ltv,
        "events_rolling_active_users":
            relational.events_rolling_active_users,
        "events_stickiness": relational.events_stickiness,
        "events_type_cooccurrence":
            relational.events_type_cooccurrence,
        "parts_brand_type_chi2": relational.parts_brand_type_chi2,
        "orders_skyline": relational.orders_skyline,
        "events_hourly_ewma": relational.events_hourly_ewma,
        "events_hourly_holt": relational.events_hourly_holt,
        "orders_benford": relational.orders_benford,
        "events_user_entropy": relational.events_user_entropy,
        "supplier_part_degree_hist":
            relational.supplier_part_degree_hist,
        "customer_spend_gini": relational.customer_spend_gini,
        "lang_ctfidf": textops.lang_ctfidf,
        "lang_token_fertility": textops.lang_token_fertility,
        "knn_hard_negatives": ann.knn_hard_negatives,
        "customer_geo_centroid": relational.customer_geo_centroid,
        "customer_geo_bounds": relational.customer_geo_bounds,
        "events_retention": relational.events_retention,
        "events_props_stats": relational.events_props_stats,
        "events_value_outliers": relational.events_value_outliers,
        "basket_part_pairs": relational.basket_part_pairs,
        "basket_rules": relational.basket_rules,
        "customers_rfm": relational.customers_rfm,
        "events_range_join": relational.events_range_join,
        "events_user_pivot": relational.events_user_pivot,
        "events_user_hll": relational.events_user_hll,  # rows-only (sketch)
        "events_value_percentile_ranks":
            relational.events_value_percentile_ranks,
        "events_composite_pages": relational.events_composite_pages,
        "events_hourly_pipeline": relational.events_hourly_pipeline,
        "events_funnel": relational.events_funnel,
        "customer_geotile_grid": relational.customer_geotile_grid,
        "events_value_quantile_sketch":
            relational.events_value_quantile_sketch,    # rows-only (sketch)
        "customers_without_big_orders":
            relational.customers_without_big_orders,
        "events_asof_orders": relational.events_asof_orders,
        "events_sessionize": relational.events_sessionize,
        "events_page": relational.events_page,
        "events_cursor_nav": relational.events_cursor_nav,
        "customer_geo_distance": relational.customer_geo_distance,
        "customer_geo_bbox": relational.customer_geo_bbox,
        "customer_geo_ring": relational.customer_geo_ring,
        "parts_per_brand": relational.parts_per_brand,
    }


def oracle_sql() -> dict[str, str]:
    texpr = sql_token_expr("text")
    toks = f"SELECT doc_id, unnest({texpr}) AS term FROM documents"
    markers = ", ".join(f"'{m}'" for m in textops.EN_MARKERS)
    return {
        "bm25_topk": bm25_oracle_sql(),
        "bm25_topk_distributed": bm25_oracle_sql(),
        "bm25_topk_deleted": bm25_oracle_sql(exclude_ids=DELETED_DOC_IDS),
        "bm25_topk_delete_by_query": bm25_oracle_sql(
            exclude_match_terms=tuple(DELETE_QUERY.split())),
        "bm25_topk_update_by_query": bm25_oracle_sql(
            update_match_terms=tuple(UPDATE_QUERY.split())),
        "bm25_topk_updated": bm25_oracle_sql(update_ids=UPDATED_DOC_IDS),
        "bm25_topk_filtered": bm25_oracle_sql(filter_lang=FILTER_LANG),
        "bm25_topk_paged": bm25_paged_sql(),
        "bm25_topk_filtered_paged": bm25_filtered_paged_sql(),
        "term_positions": term_positions_sql(),
        "prefix_search": prefix_search_sql(),
        "suggest_terms": suggest_terms_sql(),
        "spell_correct": spell_correct_sql(),
        "suggest_phrase": suggest_phrase_sql(),
        "contains_search": contains_search_sql(),
        "suffix_search": suffix_search_sql(),
        "bm25_min_should_match": bm25_min_should_match_sql(),
        "bm25_topk_boosted": bm25_oracle_sql(boost_nchars=100.0),
        "bm25_explain": bm25_explain_sql(),
        "bm25_dismax": bm25_dismax_sql(),
        "bm25_boosting": bm25_boosting_sql(),
        "synonym_search": synonym_search_sql(),
        "tfidf_topk": tfidf_topk_sql(),
        "regex_search": regex_search_sql(),
        "fuzzy_search": fuzzy_search_sql(),
        "bm25_fuzzy_topk": bm25_fuzzy_topk_sql(),
        "bm25_pinned": bm25_pinned_sql(),
        "bm25_decay": bm25_decay_sql(),
        "bm25_random_score": bm25_random_score_sql(),
        "terms_set_search": terms_set_search_sql(),
        "search_snippets": search_snippets_sql(),
        "similar_docs": similar_docs_sql(),
        "phrase_topk": phrase_oracle_sql(),
        "phrase_prefix_topk": phrase_prefix_oracle_sql(),
        "analyze_texts": analyze_texts_sql(),
        "bm25_rescore_phrase": bm25_rescore_phrase_sql(),
        "proximity_topk": proximity_oracle_sql(),
        "span_near_topk": span_near_oracle_sql(),
        "docs_mget": docs_mget_sql(),
        "term_adjacency_matrix": term_adjacency_matrix_sql(),
        "search_count": search_count_sql(),
        "bm25_facets": bm25_facets_sql(),
        "significant_terms": significant_terms_sql(),
        "hybrid_search_rrf": hybrid_search_rrf_sql(),
        "bm25_top_per_lang": bm25_top_per_lang_sql(),
        "bm25_length_facets": bm25_length_facets_sql(),
        "search_sort_by_length": search_sort_by_length_sql(),
        "term_vectors": term_vectors_sql(),
        "bm25_lang_stats": bm25_lang_stats_sql(),
        "keyword_search_indexed": textops.keyword_search_sql(),
        "keyword_search_excluding": keyword_search_excluding_sql(),
        "rare_terms": textops.rare_terms_sql(),
        "term_heavy_hitters": textops.term_heavy_hitters_sql(),
        "term_df": f"""
            SELECT term, count(*) AS df
            FROM (SELECT DISTINCT doc_id, term FROM ({toks}))
            GROUP BY term
        """,
        "token_counts": f"""
            SELECT doc_id, len({texpr}) AS n_tokens FROM documents
        """,
        "token_estimate": textops.token_estimate_sql(),
        "doc_sha256": "SELECT doc_id, sha256(text) AS sha FROM documents",
        "corpus_quality_filter": textops.corpus_quality_filter_sql(),
        "doc_repetition": textops.doc_repetition_sql(),
        "doc_entropy": textops.doc_entropy_sql(),
        "corpus_prepare": textops.corpus_prepare_sql(),
        "nb_lang_scores": textops.nb_lang_scores_sql(),
        "doc_dup_grams": textops.doc_dup_grams_sql(),
        "doc_dup_spans": textops.doc_dup_spans_sql(),
        "decontaminate": textops.decontaminate_sql(),
        "doc_quality_signals": textops.doc_quality_signals_sql(),
        "percolate": textops.percolate_sql(),
        "token_budget_mixture": training.token_budget_mixture_sql(),
        "docs_pii_redacted": training.docs_pii_redacted_sql(),
        "doc_chunks": training.doc_chunks_sql(),
        "doc_oov_rate": training.doc_oov_rate_sql(),
        "doc_lm_score": training.doc_lm_score_sql(),
        "dsir_weights": training.dsir_weights_sql(),
        "training_shards": training.training_shards_sql(),
        "doc_span_corruption": training.doc_span_corruption_sql(),
        "dataset_split": training.dataset_split_sql(),
        "doc_packing": training.doc_packing_sql(),
        "training_curriculum": training.training_curriculum_sql(),
        "quality_stats": f"""
            WITH t AS ({toks}),
            agg AS (
              SELECT doc_id, count(*) AS n_tokens,
                     count(DISTINCT term) AS n_distinct_terms
              FROM t GROUP BY doc_id
            )
            SELECT d.doc_id, length(d.text) AS n_chars,
                   coalesce(a.n_tokens, 0) AS n_tokens,
                   coalesce(a.n_distinct_terms, 0) AS n_distinct_terms
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "lang_guess": f"""
            WITH t AS ({toks}),
            hits AS (
              SELECT doc_id, count(DISTINCT term) AS h
              FROM t WHERE term IN ({markers}) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN coalesce(h.h, 0) > 0 THEN 'en' ELSE 'und' END
                     AS lang_guess,
                   coalesce(h.h, 0) AS marker_hits
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        "lang_confusion": textops.lang_confusion_sql(),
        "corpus_dedup_exact": textops.corpus_dedup_exact_sql(),
        "set_similarity_join": textops.set_similarity_join_sql(),
        "similarity_components": textops.similarity_components_sql(),
        "dedup_exact": """
            SELECT sha256(text) AS sha, min(doc_id) AS keep_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "keyword_search": textops.keyword_search_sql(),
        "corpus_stats": textops.corpus_stats_sql(),
        "bigram_counts": textops.bigram_counts_sql(),
        "bigram_pmi": textops.bigram_pmi_sql(),
        "skipgram_pmi": textops.skipgram_pmi_sql(),
        "corpus_zipf_fit": textops.corpus_zipf_fit_sql(),
        "sample_stratified": textops.sample_stratified_sql(),
        "sample_weighted": textops.sample_weighted_sql(),
        "sample_random": textops.sample_random_sql(),
        "doc_length_histogram": textops.doc_length_histogram_sql(),
        "doc_length_quantiles": textops.doc_length_quantiles_sql(),
        "events_topn_per_user": relational.events_topn_per_user_sql(),
        "events_hopping_window": relational.events_hopping_window_sql(),
        "events_rolling_max": relational.events_rolling_max_sql(),
        "events_distinct_users": relational.events_distinct_users_sql(),
        "events_value_percentile_ranks": relational.events_value_percentile_ranks_sql(),
        "events_composite_pages": relational.events_composite_pages_sql(),
        "events_hourly_pipeline": relational.events_hourly_pipeline_sql(),
        "events_funnel": relational.events_funnel_sql(),
        "customer_geotile_grid": relational.customer_geotile_grid_sql(),
        "orders_with_segment": relational.orders_with_segment_sql(),
        "q3_shipping_priority": relational.q3_shipping_priority_sql(),
        "q5_local_supplier_volume":
            relational.q5_local_supplier_volume_sql(),
        "q10_returned_items": relational.q10_returned_items_sql(),
        "q4_order_priority": relational.q4_order_priority_sql(),
        "q6_forecast_revenue": relational.q6_forecast_revenue_sql(),
        "q14_promo_revenue": relational.q14_promo_revenue_sql(),
        "q19_discounted_revenue":
            relational.q19_discounted_revenue_sql(),
        "q13_customer_distribution":
            relational.q13_customer_distribution_sql(),
        "q18_large_volume_customers":
            relational.q18_large_volume_customers_sql(),
        "q22_sales_opportunity": relational.q22_sales_opportunity_sql(),
        "q21_suppliers_who_kept_waiting":
            relational.q21_suppliers_who_kept_waiting_sql(),
        "q7_volume_shipping": relational.q7_volume_shipping_sql(),
        "q8_market_share": relational.q8_market_share_sql(),
        "q9_product_type_profit":
            relational.q9_product_type_profit_sql(),
        "q12_shipmode_priority":
            relational.q12_shipmode_priority_sql(),
        "q15_top_supplier": relational.q15_top_supplier_sql(),
        "q17_small_quantity_revenue":
            relational.q17_small_quantity_revenue_sql(),
        "events_matrix_stats": relational.events_matrix_stats_sql(),
        "events_moving_avg": relational.events_moving_avg_sql(),
        "events_running_total": relational.events_running_total_sql(),
        "events_markov_transitions":
            relational.events_markov_transitions_sql(),
        "events_attribution": relational.events_attribution_sql(),
        "events_ab_ztest": relational.events_ab_ztest_sql(),
        "events_profile": relational.events_profile_sql(),
        "events_rollup": relational.events_rollup_sql(),
        "events_global_running_total":
            relational.events_global_running_total_sql(),
        "events_cross_correlation":
            relational.events_cross_correlation_sql(),
        "customer_cohort_ltv": relational.customer_cohort_ltv_sql(),
        "events_rolling_active_users":
            relational.events_rolling_active_users_sql(),
        "events_stickiness": relational.events_stickiness_sql(),
        "events_type_cooccurrence":
            relational.events_type_cooccurrence_sql(),
        "parts_brand_type_chi2":
            relational.parts_brand_type_chi2_sql(),
        "orders_skyline": relational.orders_skyline_sql(),
        "events_hourly_ewma": relational.events_hourly_ewma_sql(),
        "events_hourly_holt": relational.events_hourly_holt_sql(),
        "orders_benford": relational.orders_benford_sql(),
        "events_user_entropy": relational.events_user_entropy_sql(),
        "supplier_part_degree_hist":
            relational.supplier_part_degree_hist_sql(),
        "customer_spend_gini": relational.customer_spend_gini_sql(),
        "lang_ctfidf": textops.lang_ctfidf_sql(),
        "lang_token_fertility": textops.lang_token_fertility_sql(),
        "knn_hard_negatives": ann.knn_hard_negatives_sql(),
        "customer_geo_centroid": relational.customer_geo_centroid_sql(),
        "customer_geo_bounds": relational.customer_geo_bounds_sql(),
        "events_retention": relational.events_retention_sql(),
        "events_props_stats": relational.events_props_stats_sql(),
        "events_value_outliers":
            relational.events_value_outliers_sql(),
        "basket_part_pairs": relational.basket_part_pairs_sql(),
        "basket_rules": relational.basket_rules_sql(),
        "customers_rfm": relational.customers_rfm_sql(),
        "events_range_join": relational.events_range_join_sql(),
        "events_user_pivot": relational.events_user_pivot_sql(),
        "customers_without_big_orders":
            relational.customers_without_big_orders_sql(),
        "doc_keywords": textops.doc_keywords_sql(),
        "vocabulary_stats": textops.vocabulary_stats_sql(),
        "embedding_near_dup": ann.embedding_near_dup_sql(),
        "semdedup": ann.semdedup_sql(),
        "knn_label_consensus": ann.knn_label_consensus_sql(),
        "events_asof_orders": relational.events_asof_orders_sql(),
        "events_sessionize": relational.events_sessionize_sql(),
        "events_page": relational.events_page_sql(),
        "media_inventory": multimodal.media_inventory_sql(),
        "media_thumbnails": multimodal.media_thumbnails_sql(),
        "media_rotated": multimodal.media_rotated_sql(),
        "media_frame_sample": multimodal.media_frame_sample_sql(),
        "events_cursor_nav": relational.events_cursor_nav_sql(),
        "customer_geo_distance": relational.customer_geo_distance_sql(),
        "customer_geo_bbox": relational.customer_geo_bbox_sql(),
        "customer_geo_ring": relational.customer_geo_ring_sql(),
        "knn_range_search": ann.knn_range_search_sql(),
        "knn_cosine": _KNN_COSINE_SQL,
        "knn_cosine_filtered": ann.knn_cosine_filtered_sql(),
        "ann_ivf_filtered_fullprobe": ann.knn_cosine_filtered_sql(),
        # full-probe IVF == brute-force kNN, same oracle
        "ann_ivf_fullprobe": _KNN_COSINE_SQL,
        # zero-plane LSH == brute-force kNN, same oracle
        "ann_lsh_fullprobe": _KNN_COSINE_SQL,
        # lambda=1 MMR == relevance-ranked top-k with rank + mmr=score
        "knn_mmr_lambda1": _KNN_MMR_LAMBDA1_SQL,
        # full-re-rank quantized search == brute-force kNN, same oracle
        "knn_cosine_quantized_fullrerank": _KNN_COSINE_SQL,
        "knn_cosine_pq_fullrerank": _KNN_COSINE_SQL,
        "knn_cosine_binary_fullrerank": _KNN_COSINE_SQL,
        "ann_ivfpq_fullprobe_fullrerank": _KNN_COSINE_SQL,
        "ann_index_fullprobe": _KNN_COSINE_SQL,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity) * 100.0) AS BIGINT)
                     AS sum_qty_cents,
                   CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT)
                     AS sum_base_price_cents,
                   CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 100.0)
                     AS BIGINT) AS sum_disc_price_cents,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "customers_per_region": """
            SELECT r.r_name, count(*) AS n_customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        "top_customers_by_spend": """
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
            FROM orders GROUP BY 1
            ORDER BY total_spend DESC, o_custkey ASC LIMIT 10
        """,
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_prev_gap": """
            SELECT event_id,
                   coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                   ), -1) AS gap_us
            FROM events
        """,
        "events_type_stats": """
            SELECT event_type, count(*) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "events_topk_by_value": """
            SELECT event_id, value FROM events
            ORDER BY value DESC, event_id ASC LIMIT 20
        """,
        "parts_per_brand": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_retail
            FROM part GROUP BY 1
        """,
    }
