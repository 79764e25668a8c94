"""Operator library: diff core (reference surface) + extensions.

- ``diff_core``: the reference's diff surface (schema/keyed/unkeyed/...).
- ``ranks``: scale-safe exact global ranking (no single-partition windows).
- ``dedup``: exact / MinHash-LSH / SimHash / semantic dedup + components.
- ``similarity``: exact / LSH / IVF top-k cosine, k-means quantizer.
- ``textquality``: token counts, quality gates, language ID, fingerprints.
"""

from dataframe_differ_spark.operators.diff_core import (
    schema_diff,
    diff,
    diff_unkeyed,
    diff_summary,
    column_mismatch_stats,
    duplicate_keys,
    changed_sample,
)
from dataframe_differ_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup,
    semantic_dedup,
    shingles,
    simhash_dedup,
)
from dataframe_differ_spark.operators.similarity import (
    cosine_join_lsh,
    ivf_index,
    topk_cosine,
    topk_cosine_ivf,
    topk_cosine_lsh,
)
from dataframe_differ_spark.operators.multimodal import (
    decode_features,
    dedup_payloads,
    sample_frames,
)
from dataframe_differ_spark.operators.pipeline import (
    decontaminate,
    hash_split,
    pack_sequences,
)
from dataframe_differ_spark.operators.textquality import (
    language_id,
    quality_features,
    token_counts,
)

__all__ = [
    "schema_diff",
    "diff",
    "diff_unkeyed",
    "diff_summary",
    "column_mismatch_stats",
    "duplicate_keys",
    "changed_sample",
    "connected_components",
    "exact_dedup",
    "minhash_dedup",
    "semantic_dedup",
    "shingles",
    "simhash_dedup",
    "cosine_join_lsh",
    "ivf_index",
    "topk_cosine",
    "topk_cosine_ivf",
    "topk_cosine_lsh",
    "language_id",
    "quality_features",
    "token_counts",
    "decontaminate",
    "hash_split",
    "pack_sequences",
    "decode_features",
    "dedup_payloads",
    "sample_frames",
]
