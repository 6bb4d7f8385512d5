from chemharmony_spark.operators.core import (  # noqa: F401
    balanced_class_floor,
    discordance_filter,
    grid_negatives,
    grouped_median_binarize,
    having_filter,
    keep_unique_keys,
    melt,
    pivot_value_counts,
    recode,
    salted_join,
    stratified_sample_exact,
    strip_qualifiers_to_double,
)
from chemharmony_spark.operators.dedup import (  # noqa: F401
    exact_dedup_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash16,
)
from chemharmony_spark.operators.multimodal import (  # noqa: F401
    attach_binary_payload,
    extract_features,
    extract_image_meta,
    resize_images,
    sample_frames,
)
from chemharmony_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_bucket_topk,
)
from chemharmony_spark.operators.temporal import (  # noqa: F401
    asof_join,
    range_join,
)
from chemharmony_spark.operators.text import (  # noqa: F401
    alnum_ratio,
    bpe_ish_token_count,
    fingerprint,
    langid_scores,
    normalize_text,
    quality_features,
    token_count,
    tokens,
    winnowing_fingerprints,
)
from chemharmony_spark.operators.ml import grouped_isotonic  # noqa: E402,F401
