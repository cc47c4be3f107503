from pivot_spark.operators.pivot import (
    PivotError,
    PivotResult,
    lineage,
    output_schema,
    pivot,
)
from pivot_spark.operators.dedup import dedup_exact
from pivot_spark.operators.ivf import cosine_topk_ivf, ivf_index, ivf_search
from pivot_spark.operators.neardup import (
    neardup_embedding_cosine,
    neardup_minhash_lsh,
    neardup_simhash,
    ngram_jaccard_pairs,
)
from pivot_spark.operators.select_extreme import select_extreme
from pivot_spark.operators.sessionize import session_stats, sessionize, sessionize_stream
from pivot_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from pivot_spark.operators.skew import count_distinct_skewed, salted_join

__all__ = [
    "pivot",
    "PivotResult",
    "PivotError",
    "output_schema",
    "lineage",
    "dedup_exact",
    "neardup_minhash_lsh",
    "neardup_simhash",
    "ngram_jaccard_pairs",
    "neardup_embedding_cosine",
    "cosine_topk",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "ivf_index",
    "ivf_search",
    "select_extreme",
    "sessionize",
    "session_stats",
    "sessionize_stream",
    "count_distinct_skewed",
    "salted_join",
]
