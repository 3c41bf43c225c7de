"""avro_conversions_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the semantics of the reference library opwvhk/avro-conversions
(Avro-style schema resolution, typed conversions, validation) as vectorized
Spark DataFrame operations over large tables of multi-turn conversation
transcripts, and layers on the table-level checks a 100 TB training-data
pipeline needs: column stats, uniqueness, referential integrity, drift,
deduplication, similarity search and text analysis.

Design (Spark-first, NOT a port):
- plan-time schema resolution on the driver (mirrors the reference's
  ``createResolver`` compile step, src/main/java/opwvhk/avro/io/
  AsAvroParserBase.java:369-398) producing Column expressions;
- all data-path work is pyspark.sql built-ins or Arrow-vectorized pandas
  UDFs — never per-row Python;
- violations are rows with reason codes, never exceptions (the reference
  throws per document; an engine scanning 10^12 turns must not).
"""

__version__ = "0.1.0"

from avro_conversions_spark.session import get_spark  # noqa: F401
