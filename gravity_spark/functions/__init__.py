from gravity_spark.functions.text import (  # noqa: F401
    tokenize,
    token_count,
    quality_score,
    detect_language,
    fingerprint,
)
from gravity_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from gravity_spark.functions.similarity import (  # noqa: F401
    cosine_similarity,
    brute_force_topk,
    lsh_bucket_topk,
)
