from chemharmony_spark.sources.readers import (  # noqa: F401
    read_jdbc_table,
    read_literal,
    read_parquet,
    read_staging_glob,
    read_tsv,
)
from chemharmony_spark.sources.writers import write_parquet  # noqa: F401
