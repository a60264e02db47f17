"""Beyond-reference operators for large-scale training-data pipelines.

SURVEY.md §2.11: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search (brute-force + IVF), text analysis
(tokens, quality, language-ID, fingerprints), multimodal column conventions.
Everything is expressed with JVM-side built-in functions (xxhash64, explode,
zip_with/aggregate) so plans stay inside whole-stage codegen at 100 TB scale;
Python appears only in the (stubbed) multimodal decode path.
"""

from .dedup import (exact_dedup, minhash_signatures, minhash_lsh_pairs,
                    minhash_lsh_dedup, simhash, simhash_near_dup_pairs,
                    ngram_jaccard_pairs, segment_dedup, minhash_index_rows,
                    dedup_against_index, edit_verified_pairs,
                    exact_substring_dedup, ngram_containment_pairs,
                    ngram_containment_pairs_prefix,
                    ngram_containment_pairs_lsh)
from .graph import (connected_components, dup_clusters, identity_clusters,
                    triangle_counts,
                    dedup_by_components, select_cluster_representatives,
                    cluster_representatives)
from .multimodal import (with_media_columns, extract_features,
                         frame_sample_plan, resize_plan, audio_chunk_plan,
                         phash_near_dup)
from .pipeline import (chunk_documents, contaminated_ids, curate,
                       contamination_score,
                       decontaminate, scrub_pii, normalize_text,
                       deterministic_sample, stratified_sample,
                       percentile_filter, mixture_sample,
                       pack_sequences, quota_cap, decontaminate_spans,
                       split_dataset, dsir_logweights, dsir_sample,
                       perplexity_buckets, curate_urls, weighted_sample,
                       temperature_sample, shard_plan, segment_filter,
                       mixture_plan, boilerplate_filter)
from .sessions import (sessionize, session_stats, funnel_stats,
                       cohort_retention, top_paths, event_transitions,
                       rfm_segments, count_anomalies, ab_test_stats,
                       stickiness, forecast_baseline)
from .similarity import (cosine_topk, ivf_cosine_topk,
                         embedding_near_dup_pairs, hyperplane_signatures,
                         lsh_cosine_topk, semantic_dedup, kmeans_assign,
                         quantize_int8, quantized_cosine_topk,
                         random_projection, hard_negatives, rrf_fuse,
                         prototype_prune, pq_train, pq_encode, pq_topk,
                         mmr_rerank, ivfpq_topk)
from .joins import interval_join, salted_join
from .lm import (lm_log_prob, lm_outliers, linear_text_score,
                 tfidf_keywords, cluster_topics)
from .profile import (profile, basket_pairs, basket_rules,
                      correlation_matrix)
from .sketches import (cms_cells, heavy_hitters, hll_distinct,
                       histogram_cells, histogram_quantiles)
from .temporal import asof_join, resample
from .textstats import (with_token_stats, with_quality_score,
                        with_language_id, with_fingerprint,
                        with_repetition_stats, top_ngrams, bm25_topk,
                        with_char_entropy, bpe_pair_counts, pmi_top_pairs,
                        with_gopher_quality, with_readability)

__all__ = [
    "exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
    "minhash_lsh_dedup", "simhash", "simhash_near_dup_pairs",
    "ngram_jaccard_pairs", "segment_dedup", "minhash_index_rows",
    "dedup_against_index", "edit_verified_pairs", "exact_substring_dedup",
    "connected_components", "dup_clusters", "identity_clusters",
    "triangle_counts", "dedup_by_components",
    "select_cluster_representatives", "cluster_representatives",
    "cosine_topk", "ivf_cosine_topk", "embedding_near_dup_pairs",
    "hyperplane_signatures", "lsh_cosine_topk", "semantic_dedup",
    "kmeans_assign", "quantize_int8", "quantized_cosine_topk",
    "random_projection", "hard_negatives", "prototype_prune",
    "pq_train", "pq_encode", "pq_topk", "mmr_rerank", "ivfpq_topk",
    "with_token_stats", "with_quality_score", "with_language_id",
    "with_fingerprint", "with_repetition_stats", "top_ngrams", "bm25_topk",
    "lm_log_prob", "lm_outliers", "linear_text_score", "tfidf_keywords",
    "cluster_topics",
    "profile", "basket_pairs", "basket_rules", "correlation_matrix", "asof_join", "resample", "interval_join", "salted_join",
    "with_media_columns", "extract_features", "frame_sample_plan",
    "phash_near_dup",
    "resize_plan", "audio_chunk_plan",
    "chunk_documents", "contaminated_ids", "contamination_score",
    "curate", "decontaminate",
    "decontaminate_spans",
    "pack_sequences", "scrub_pii", "normalize_text",
    "deterministic_sample", "stratified_sample",
    "percentile_filter", "mixture_sample", "quota_cap", "rrf_fuse",
    "split_dataset", "dsir_logweights", "dsir_sample",
    "perplexity_buckets", "curate_urls", "weighted_sample",
    "temperature_sample", "with_char_entropy", "with_gopher_quality", "shard_plan",
    "segment_filter", "mixture_plan", "bpe_pair_counts", "boilerplate_filter",
    "sessionize", "session_stats", "funnel_stats", "cohort_retention",
    "top_paths", "event_transitions", "rfm_segments", "count_anomalies",
    "ab_test_stats", "stickiness", "with_readability", "forecast_baseline",
    "cms_cells", "heavy_hitters", "hll_distinct",
    "histogram_cells", "histogram_quantiles",
    "ngram_containment_pairs", "ngram_containment_pairs_prefix",
    "ngram_containment_pairs_lsh",
    "pmi_top_pairs",
]
