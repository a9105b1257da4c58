"""LLM-data-pipeline and analytics function modules.

Convenience re-exports so users can ``from pandas_expr_spark.functions
import dedup, similarity, ...`` or reach common entry points directly.
"""

from . import (accessors, clustering, components, curation, dedup,
               multimodal, packing, scan, similarity, sketches, splits,
               text, timeseries, udtf)
from .clustering import kmeans_assign, nearest_centroid, semantic_dedup
from .curation import (budget_sample, epoch_sample, gopher_rules,
                       quality_logit)
from .components import connected_components, dup_clusters
from .dedup import (decontaminate, embedding_near_dup_pairs,
                    minhash_lsh_dedup, minhash_lsh_pairs,
                    ngram_jaccard_pairs, simhash_pairs)
from .packing import pack_documents
from .similarity import brute_force_pairs, cosine_topk, ivf_topk, lsh_topk
from .splits import hash_bucket, hash_sample, hash_split, stratified_downsample
from .text import (lang_id, pii_count, quality_score, redact_pii,
                   repetition_ratio, stopword_ratio, token_count)
from .udtf import chunk_documents

__all__ = [
    "accessors", "clustering", "components", "curation", "dedup",
    "multimodal", "packing", "scan", "similarity", "sketches", "splits",
    "text", "timeseries", "udtf", "kmeans_assign", "nearest_centroid",
    "semantic_dedup", "budget_sample", "epoch_sample", "gopher_rules",
    "quality_logit",
    "connected_components", "dup_clusters",
    "decontaminate", "embedding_near_dup_pairs", "minhash_lsh_dedup",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash_pairs",
    "pii_count", "redact_pii", "pack_documents",
    "brute_force_pairs", "cosine_topk", "ivf_topk", "lsh_topk",
    "hash_bucket", "hash_sample", "hash_split", "stratified_downsample",
    "lang_id", "quality_score", "repetition_ratio", "stopword_ratio",
    "token_count", "chunk_documents",
]
