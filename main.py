"""spark-submit entry point. See avro_conversions_spark/cli.py."""

from avro_conversions_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
