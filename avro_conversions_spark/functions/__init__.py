from avro_conversions_spark.functions import text, vectors  # noqa: F401
