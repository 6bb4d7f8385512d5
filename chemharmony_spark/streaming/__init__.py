from chemharmony_spark.streaming.windows import (  # noqa: F401
    run_stream_to_memory,
    stream_tumbling_counts,
)
