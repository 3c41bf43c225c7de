from avro_conversions_spark.sources.documents import (  # noqa: F401
    parse_json_column,
    parse_xml_column,
    read_json_documents,
)
