from chemharmony_spark.plans.harmonize import harmonize  # noqa: F401
