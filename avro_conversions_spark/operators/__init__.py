from avro_conversions_spark.operators.queries import ORACLES, QUERIES  # noqa: F401
