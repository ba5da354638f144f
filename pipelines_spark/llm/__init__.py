"""Large-scale training-data pipeline operators.

Beyond the reference's own surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), embedding similarity search (brute-force and
bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

Everything is expressed with built-in Spark SQL functions (arrays +
higher-order lambdas stay inside codegen); the only Python UDFs are in
``multimodal`` where a real decoder library would sit.
"""

from pipelines_spark.llm.dedup import (  # noqa: F401
    connected_components,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)
from pipelines_spark.llm.similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    srp_bucketed_topk,
    with_srp_bucket,
)
from pipelines_spark.llm.text import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)
