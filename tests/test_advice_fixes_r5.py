"""Regression tests for the round-4 ADVICE items fixed in round 5.

1. multimodal.extract_features no longer mutates the session-wide
   ``arrow.maxRecordsPerBatch`` (previously a permanent lower-only leak
   that degraded every later pandas/Arrow exchange); chunking now happens
   inside the worker and the output is invariant to ``batch_records``.
2. XsdAnalyzer resolves relative xs:include/xs:import schemaLocations
   against the including document's directory (not the process CWD), and
   a resolver value naming a missing file raises the documented
   ValueError, not a bare FileNotFoundError.
3. The memory-sink driver queries drop their temp views after
   materializing, so repeated runs in one session don't accumulate
   catalog entries.

(The trailing-whitespace timestamp item — the round-4 medium — is pinned
in tests/test_year_zero_poison_r5.py and the hypothesis property suite.)
"""

from __future__ import annotations

import os
import textwrap

import pytest


# ------------------------------------------------------- 1. arrow conf leak


def test_extract_features_does_not_touch_session_conf(spark):
    from avro_conversions_spark.multimodal import extract_features, synthetic_media

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key, "10000")
    media = synthetic_media(spark, n=50)
    out = extract_features(media, fake=True, batch_records=7)
    rows = out.collect()
    assert len(rows) == 50
    assert spark.conf.get(key, "10000") == before, "session conf mutated"


def test_extract_features_output_invariant_to_batch_records(spark):
    from avro_conversions_spark.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, n=40)
    a = {
        r.media_id: (r.n_bytes, tuple(r.feature))
        for r in extract_features(media, fake=True, batch_records=3).collect()
    }
    b = {
        r.media_id: (r.n_bytes, tuple(r.feature))
        for r in extract_features(media, fake=True, batch_records=1000).collect()
    }
    assert a == b


# ------------------------------------- 2. XSD schemaLocation path resolution

_CHILD = textwrap.dedent(
    """
    <xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:simpleType name="StatusType">
        <xs:restriction base="xs:string">
          <xs:enumeration value="ok"/>
          <xs:enumeration value="bad"/>
        </xs:restriction>
      </xs:simpleType>
    </xs:schema>
    """
)

_PARENT = textwrap.dedent(
    """
    <xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:include schemaLocation="common.xsd"/>
      <xs:element name="doc">
        <xs:complexType>
          <xs:sequence>
            <xs:element name="status" type="StatusType"/>
          </xs:sequence>
        </xs:complexType>
      </xs:element>
    </xs:schema>
    """
)


def test_xsd_relative_include_resolves_against_parent_dir(tmp_path, monkeypatch):
    """The include lives next to the parent document; the process CWD is
    somewhere else entirely — resolution must still succeed (round-4
    ADVICE: it used to resolve against the CWD)."""
    from avro_conversions_spark.schema.xsd import XsdAnalyzer

    nested = tmp_path / "schemas"
    nested.mkdir()
    (nested / "common.xsd").write_text(_CHILD, encoding="utf-8")
    main = nested / "main.xsd"
    main.write_text(_PARENT, encoding="utf-8")

    elsewhere = tmp_path / "elsewhere"
    elsewhere.mkdir()
    monkeypatch.chdir(elsewhere)
    assert not os.path.exists("common.xsd")  # CWD fallback must not fire

    an = XsdAnalyzer(str(main))
    assert "StatusType" in an.simple_types
    assert "doc" in an.elements


def test_xsd_nested_include_uses_each_files_own_dir(tmp_path, monkeypatch):
    """a/ includes b via '../b/mid.xsd'; mid includes leaf by bare name —
    each relative location resolves against ITS document's directory."""
    from avro_conversions_spark.schema.xsd import XsdAnalyzer

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    (b / "leaf.xsd").write_text(_CHILD, encoding="utf-8")
    (b / "mid.xsd").write_text(
        _PARENT.replace('schemaLocation="common.xsd"', 'schemaLocation="leaf.xsd"'),
        encoding="utf-8",
    )
    root = a / "root.xsd"
    root.write_text(
        _PARENT.replace(
            'schemaLocation="common.xsd"', 'schemaLocation="../b/mid.xsd"'
        ),
        encoding="utf-8",
    )
    monkeypatch.chdir(tmp_path)
    an = XsdAnalyzer(str(root))
    assert "StatusType" in an.simple_types


def test_xsd_resolver_missing_file_raises_value_error(tmp_path):
    from avro_conversions_spark.schema.xsd import XsdAnalyzer

    with pytest.raises(ValueError, match="unreadable file"):
        XsdAnalyzer(
            _PARENT, resolver={"common.xsd": str(tmp_path / "does_not_exist.xsd")}
        )


def test_xsd_unresolvable_location_still_value_error():
    from avro_conversions_spark.schema.xsd import XsdAnalyzer

    with pytest.raises(ValueError, match="cannot resolve"):
        XsdAnalyzer(_PARENT)


# ----------------------------------------------- 3. memory-sink view cleanup


def test_stream_queries_drop_memory_sink_views(spark):
    from avro_conversions_spark.operators.queries import (
        q_stream_dedup_documents,
        q_stream_windowed_violations,
    )

    sf_dir = "/root/testdata/sf0.001"
    before = {t.name for t in spark.catalog.listTables()}
    out1 = q_stream_dedup_documents(spark, sf_dir)
    out2 = q_stream_windowed_violations(spark, sf_dir)
    assert out1.count() > 0 and out2.count() >= 0
    after = {t.name for t in spark.catalog.listTables()}
    leaked = {n for n in after - before if n.startswith(("stream_", "stateful_"))}
    assert not leaked, f"memory-sink views leaked: {leaked}"
