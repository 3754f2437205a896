from .airports import prep_airports
from .asof import asof_join
from .cities import prep_cities
from .clusters import connected_components, dedup_by_components
from .dedup import (
    exact_dedup,
    embedding_dup_pairs,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_pairs,
    simhash_signatures,
)
from .keys import hash_key, surrogate_key
from .similarity import cosine_topk, ivf_topk, lsh_topk
from .skew import salted_join
from .star import build_star_schema
from .temperatures import prep_temperatures
from .topk import topk_per_group_scalable
from .travelers import prep_travelers

__all__ = [
    "asof_join",
    "build_star_schema",
    "connected_components",
    "cosine_topk",
    "dedup_by_components",
    "ivf_topk",
    "embedding_dup_pairs",
    "exact_dedup",
    "hash_key",
    "jaccard_pairs",
    "lsh_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "prep_airports",
    "prep_cities",
    "prep_temperatures",
    "prep_travelers",
    "salted_join",
    "simhash_pairs",
    "simhash_signatures",
    "surrogate_key",
    "topk_per_group_scalable",
]
