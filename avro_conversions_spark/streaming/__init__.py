from avro_conversions_spark.streaming.validate import (  # noqa: F401
    streaming_violations,
    windowed_violation_counts,
)
