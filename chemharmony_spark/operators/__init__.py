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
    stratified_sample_exact,
    strip_qualifiers_to_double,
)
