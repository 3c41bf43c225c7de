from avro_conversions_spark.streaming.stateful import (  # noqa: F401
    stateful_sequence_violations,
)
from avro_conversions_spark.streaming.validate import (  # noqa: F401
    streaming_violations,
    windowed_violation_counts,
)
