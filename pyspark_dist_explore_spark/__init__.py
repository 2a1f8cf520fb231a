"""pyspark_dist_explore_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference library ``Bergvca/pyspark_dist_explore`` (distribution
exploration over PySpark DataFrames: histograms, density curves, pandas
conversion), extended with the operators a large-scale training-data
pipeline needs: deduplication (exact / MinHash / SimHash / Jaccard),
vector similarity search, text analysis, multimodal column plumbing and
streaming histograms.

Design (SURVEY.md §3.2): everything is a lazy DataFrame plan handed to
Catalyst — no ``df.rdd``, no driver-side loops over data, no per-row
Python.  The reference's eager path (``df.rdd.flatMap(...).histogram``)
is replaced by a single-shuffle ``groupBy(series, bucket).count()``
pipeline with zero JVM→Python boundary crossings.
"""

from pyspark_dist_explore_spark.operators.histogram import (
    HistogramSpec,
    compute_histogram,
    compute_histogram_dense,
    compute_density,
    compute_ecdf,
    compute_kde,
)
from pyspark_dist_explore_spark.operators.dedup import (
    containment_pairs,
    edit_distance_pairs,
    exact_dedup,
    hamming_neardup,
    fingerprint_dedup,
    incremental_dedup,
    jaccard_pairs_exact,
    minhash_neardup,
    neardup_clusters,
    shingle_rows,
    simhash_neardup,
)
from pyspark_dist_explore_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_neardup_pairs,
    dimension_minmax,
    exact_topk,
    ivf_topk,
    ivf_topk_packed,
    quantize_embeddings,
    topk_quantized,
)
from pyspark_dist_explore_spark.operators.multimodal import (
    afp_samples,
    audio_features,
    audio_fingerprint,
    decode_bmp,
    decode_wav,
    dhash_pixels,
    encode_bmp,
    encode_wav,
    image_dhash,
    read_binary_media,
    resize_images,
    sample_frames,
    write_media_fixture,
)
from pyspark_dist_explore_spark.operators.decontam import (
    contaminated_ids,
    contamination_report,
    decontaminate,
    decontaminate_winnow,
)
from pyspark_dist_explore_spark.operators.dedup import normalize_unicode
from pyspark_dist_explore_spark.operators.packing import (
    chunk_documents,
    pack_related_documents,
    pack_sequences,
    packing_efficiency,
)
from pyspark_dist_explore_spark.operators.sampling import (
    hash_split,
    select_by_token_budget,
    select_by_token_budget_stratified,
    shuffle_shards,
    stratified_sample,
    stratified_sample_hash,
)
from pyspark_dist_explore_spark.operators.stats import (
    describe_exact,
    histogram_approx,
    histogram_drift,
    histogram_drift_by_group,
)
from pyspark_dist_explore_spark.sources.sinks import (
    load_dsir_model,
    load_neardup_snapshot,
    read_jsonl,
    corpus_diff_dirs,
    shard_manifest,
    verify_training_shards,
    write_bucketed_table,
    write_dsir_model,
    write_jsonl,
    write_neardup_snapshot,
    write_partitioned,
    write_training_shards,
)
from pyspark_dist_explore_spark.operators.dsir import (
    dsir_bucket_counts,
    dsir_scores,
    dsir_topk,
)
from pyspark_dist_explore_spark.operators.dedup import (
    canonicalize_url,
    corpus_diff,
    markup_stats,
    strip_markup,
    corpus_overlap,
    corpus_overlap_matrix,
    incremental_minhash_neardup,
    url_host,
    lsh_candidate_prob,
    plan_minhash_lsh,
)
from pyspark_dist_explore_spark.operators.histogram import (
    compute_equidepth_histogram,
)
from pyspark_dist_explore_spark.operators.sampling import (
    cap_per_key,
    materialize_mixture,
    proportional_interleave,
    stratified_take_exact,
    temperature_resample,
    top_frac_per_group,
)
from pyspark_dist_explore_spark.operators.similarity import (
    mean_pool_embeddings,
    random_projection,
    rp_topk,
)
from pyspark_dist_explore_spark.operators.textstats import (
    c4_clean,
    classifier_score,
    drop_duplicate_spans,
    gopher_quality_gate,
    bpe_encode,
    bpe_learn,
    bpe_segment_expr,
    bpe_word_freqs,
    unigram_encode,
    unigram_lm_learn,
    unigram_seed_candidates,
    gopher_repetition_battery,
    oov_stats,
    perplexity_buckets,
    vocabulary,
    with_classifier_gate,
)
from pyspark_dist_explore_spark.pipeline import (
    containment_pair_fn,
    curate_documents,
    curation_funnel,
    edit_verified_pair_fn,
    minhash_pair_fn,
    semantic_pair_fn,
    union_pair_fns,
)
from pyspark_dist_explore_spark.operators.similarity import (
    assign_domains,
    domain_profile,
    domain_scores,
    domain_tag,
    prune_prototypes,
    semantic_dedup,
    semantic_pairs,
)
from pyspark_dist_explore_spark.operators.decontam import (
    semantic_contaminated_ids,
)
from pyspark_dist_explore_spark.session import build_session, recommended_conf
from pyspark_dist_explore_spark.operators.textstats import (
    bigram_logprob_scores,
    classifier_train,
    frequent_ngrams,
    kn_bigram_logprob_scores,
    nb_bucket_weight,
    corpus_profile,
    dedup_lines_within_doc,
    drop_repeated_lines,
    language_id,
    quality_score,
    repetition_signals,
    scrub_text,
    term_frequencies,
    text_profile,
    text_stats,
    tfidf,
    tfidf_doc_vectors,
    unigram_logprob_scores,
    winnowing_fingerprints,
    word2vec_embeddings,
)
from pyspark_dist_explore_spark.streaming.histogram_stream import (
    stream_curate_lite,
    stream_dedup,
    stream_drift_scores,
    stream_enrich,
    stream_interval_join,
    stream_windowed_histogram,
)
from pyspark_dist_explore_spark.viz import (
    Histogram,
    hist,
    distplot,
    pandas_histogram,
)

__all__ = [
    # histogram engine
    "HistogramSpec",
    "compute_histogram",
    "compute_histogram_dense",
    "compute_density",
    "compute_kde",
    "compute_ecdf",
    # reference-compatible surface
    "Histogram",
    "hist",
    "distplot",
    "pandas_histogram",
    # dedup
    "exact_dedup",
    "build_session",
    "curate_documents",
    "recommended_conf",
    "fingerprint_dedup",
    "incremental_dedup",
    "edit_distance_pairs",
    "hamming_neardup",
    "jaccard_pairs_exact",
    "containment_pairs",
    "minhash_neardup",
    "edit_verified_pair_fn",
    "minhash_pair_fn",
    "containment_pair_fn",
    "semantic_pair_fn",
    "union_pair_fns",
    "semantic_dedup",
    "semantic_pairs",
    "assign_domains",
    "domain_tag",
    "domain_profile",
    "semantic_contaminated_ids",
    "neardup_clusters",
    "shingle_rows",
    "simhash_neardup",
    # similarity
    "exact_topk",
    "cosine_neardup_pairs",
    "ann_lsh_topk",
    "ivf_topk",
    "ivf_topk_packed",
    "dimension_minmax",
    "quantize_embeddings",
    "topk_quantized",
    # stats / text
    "describe_exact",
    "histogram_approx",
    "histogram_drift",
    "histogram_drift_by_group",
    "text_stats",
    "text_profile",
    "quality_score",
    "language_id",
    "scrub_text",
    "repetition_signals",
    "drop_repeated_lines",
    "dedup_lines_within_doc",
    "corpus_profile",
    "bigram_logprob_scores",
    "classifier_train",
    "frequent_ngrams",
    "kn_bigram_logprob_scores",
    "nb_bucket_weight",
    "winnowing_fingerprints",
    "term_frequencies",
    "tfidf",
    "tfidf_doc_vectors",
    "unigram_logprob_scores",
    "word2vec_embeddings",
    # multimodal
    "encode_bmp",
    "decode_bmp",
    "dhash_pixels",
    "encode_wav",
    "decode_wav",
    "read_binary_media",
    "image_dhash",
    "resize_images",
    "sample_frames",
    "write_media_fixture",
    "afp_samples",
    "audio_features",
    "audio_fingerprint",
    # sampling / batch shaping
    "hash_split",
    "stratified_sample",
    "stratified_sample_hash",
    "pack_sequences",
    "chunk_documents",
    "contaminated_ids",
    "normalize_unicode",
    "contamination_report",
    "select_by_token_budget",
    "select_by_token_budget_stratified",
    "proportional_interleave",
    "shuffle_shards",
    "decontaminate",
    "decontaminate_winnow",
    # round-8c additions
    "dsir_scores",
    "dsir_topk",
    "dsir_bucket_counts",
    "gopher_quality_gate",
    "gopher_repetition_battery",
    "bpe_learn",
    "bpe_encode",
    "bpe_segment_expr",
    "bpe_word_freqs",
    # round-9 additions
    "c4_clean",
    "curation_funnel",
    "lsh_candidate_prob",
    "plan_minhash_lsh",
    "perplexity_buckets",
    "classifier_score",
    "with_classifier_gate",
    "random_projection",
    "rp_topk",
    "mean_pool_embeddings",
    "compute_equidepth_histogram",
    "drop_duplicate_spans",
    "vocabulary",
    "oov_stats",
    "temperature_resample",
    "stratified_take_exact",
    "cap_per_key",
    "incremental_minhash_neardup",
    "corpus_overlap",
    "corpus_overlap_matrix",
    "materialize_mixture",
    "top_frac_per_group",
    "canonicalize_url",
    "url_host",
    # sinks / physical layout
    "write_partitioned",
    "write_training_shards",
    "shard_manifest",
    "corpus_diff",
    "corpus_diff_dirs",
    "unigram_encode",
    "unigram_lm_learn",
    "unigram_seed_candidates",
    "stream_curate_lite",
    "pack_related_documents",
    "packing_efficiency",
    "domain_scores",
    "prune_prototypes",
    "strip_markup",
    "markup_stats",
    "verify_training_shards",
    "write_bucketed_table",
    "write_jsonl",
    "read_jsonl",
    "write_dsir_model",
    "load_dsir_model",
    "write_neardup_snapshot",
    "load_neardup_snapshot",
    # streaming
    "stream_windowed_histogram",
    "stream_drift_scores",
    "stream_dedup",
    "stream_enrich",
    "stream_interval_join",
]

__version__ = "0.1.0"
