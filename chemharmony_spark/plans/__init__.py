from chemharmony_spark.plans.harmonize import (  # noqa: F401
    harmonize,
    harmonize_bucket2_gc,
)
from chemharmony_spark.plans.labeler import magentic_labels  # noqa: F401
