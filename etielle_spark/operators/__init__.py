"""Large-scale training-data pipeline operators.

Beyond the reference's ETL surface (SURVEY.md §2), these are the operators a
100 TB data pipeline needs: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search, text analysis, and
multimodal column plumbing.  All are compositions of built-in DataFrame
operators (JVM-side, whole-stage codegen) except where a Pandas UDF is the
honest tool (multimodal decode).
"""

from .dedup import (
    containment_pairs,
    normalize_text,
    dedup_against,
    duplicate_spans,
    exact_dedup,
    exact_dedup_by_content,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_df,
    simhash,
    winnow_fingerprints,
)
from .clusters import distribution_match_resample
from .multimodal import generate_images, hamming_near_dup, perceptual_hash
from .packing import pack_counts, pack_sequences
from .profile import agreement_kappa, ks_drift, psi_drift, binary_metrics, bootstrap_mean_ci, skew_report
from .rules import k_anonymity_audit
from .similarity import mutual_nn
from .clusters import (
    per_key_sample,
    rendezvous_assign,
    shard_assign,
    write_shards,
)
from .dedup import cross_group_overlap, prefix_filter_pairs
from .search import bm25_topk, inverted_index
from .similarity import (
    brute_force_topk,
    cosine_pairs,
    gram_matrix,
    kmeans_fit,
    lsh_bucket_topk,
    pca_fit,
    pca_project,
    quantize_int8,
    random_projection,
    ridge_fit,
    mmr_select,
    silhouette_centroid,
)
from .clusters import temperature_mixture, unimax_mixture
from .sketches import (
    bloom_anti_join,
    bloom_build,
    bloom_probe,
    hll_distinct,
    kmv_distinct,
)
from .webdataset import wds_read, wds_samples, wds_write
from .text import (
    bpe_encode,
    compression_ratio,
    dsir_logratio,
    vocab_drift,
    densify_counts,
    interpolated_nll,
    logreg_score,
    logreg_train,
    bpe_train,
    cdc_chunks,
    keyness_g2,
    pmi_collocations,
    rake_keyphrases,
    stylometric_deviation,
    chunk_tokens,
    classifier_score,
    doc_fingerprint,
    lang_id,
    pii_redact,
    quality_score,
    token_count,
    token_entropy,
    token_stats,
)

__all__ = [
    "exact_dedup",
    "exact_dedup_by_content",
    "shingle_df",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash",
    "brute_force_topk",
    "cosine_pairs",
    "lsh_bucket_topk",
    "random_projection",
    "hll_distinct",
    "kmv_distinct",
    "shard_assign",
    "write_shards",
    "per_key_sample",
    "rendezvous_assign",
    "prefix_filter_pairs",
    "classifier_score",
    "token_count",
    "token_entropy",
    "chunk_tokens",
    "pii_redact",
    "inverted_index",
    "bm25_topk",
    "token_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "bpe_encode",
    "bpe_train",
    "containment_pairs",
    "dedup_against",
    "duplicate_spans",
    "winnow_fingerprints",
    "distribution_match_resample",
    "hamming_near_dup",
    "perceptual_hash",
    "pack_counts",
    "pack_sequences",
    "agreement_kappa",
    "skew_report",
    "k_anonymity_audit",
    "mutual_nn",
    "cdc_chunks",
    "keyness_g2",
    "pmi_collocations",
    "rake_keyphrases",
    "stylometric_deviation",
    "bloom_build",
    "bloom_probe",
    "bloom_anti_join",
    "wds_write",
    "wds_read",
    "wds_samples",
    "compression_ratio",
    "dsir_logratio",
    "vocab_drift",
    "cross_group_overlap",
    "ks_drift",
    "psi_drift",
    "unimax_mixture",
]
