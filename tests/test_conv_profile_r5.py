"""Round-5: per-conversation verdict card (transcripts.conversation_profile).
Hand-planted corruption tests — oracle value parity at sf0.01 is covered
by the driver crosscheck (conv_profile_transcripts)."""

from __future__ import annotations

import datetime as dt

from avro_conversions_spark.transcripts import conversation_profile


def _ts(i):
    return dt.datetime(2026, 1, 1, 0, 0, i)


def _profile(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    cat = spark.createDataFrame([("search",), ("browser",)], "tool_name string")
    out = conversation_profile(df, cat).collect()
    return {r["conv_id"]: r for r in out}


def test_clean_conversation_passes(spark):
    rows = [
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c1", 1, "assistant", "hello", "search", _ts(1)),
        ("c1", 2, "user", "thanks", None, _ts(2)),
    ]
    got = _profile(spark, rows)["c1"]
    assert got["passed"] is True
    assert got["n_turns"] == 3 and got["n_tool_turns"] == 1
    assert all(
        got[k] == 0
        for k in (
            "n_invalid_role",
            "n_dangling_tool",
            "n_dup_keys",
            "n_gaps",
            "n_ts_regressions",
        )
    )


def test_each_corruption_counted_in_its_own_conversation(spark):
    rows = [
        # bad role
        ("r", 0, "user", "a", None, _ts(0)),
        ("r", 1, "robot", "b", None, _ts(1)),
        # dangling tool (catalog = search/browser only)
        ("d", 0, "assistant", "a", "calculator", _ts(0)),
        ("d", 1, "user", "b", None, _ts(1)),
        # duplicate key: two rows for turn 0 -> also a gap (ranks 0,1 vs idx 0,0,1)
        ("k", 0, "user", "a", None, _ts(0)),
        ("k", 0, "user", "a", None, _ts(0)),
        ("k", 1, "user", "b", None, _ts(1)),
        # ts regression at turn 2
        ("t", 0, "user", "a", None, _ts(5)),
        ("t", 1, "user", "b", None, _ts(6)),
        ("t", 2, "user", "c", None, _ts(3)),
    ]
    got = _profile(spark, rows)
    assert got["r"]["n_invalid_role"] == 1 and not got["r"]["passed"]
    assert got["d"]["n_dangling_tool"] == 1 and not got["d"]["passed"]
    assert got["k"]["n_dup_keys"] == 1 and got["k"]["n_gaps"] >= 1
    assert not got["k"]["passed"]
    assert got["t"]["n_ts_regressions"] == 1 and not got["t"]["passed"]
    # corruption in one conversation never bleeds into another's verdict
    assert got["r"]["n_dangling_tool"] == 0 and got["t"]["n_dup_keys"] == 0


def test_gap_detection_is_order_deterministic(spark):
    # turn_idx 0,2,3: ranks 0,1,2 -> turns 2 and 3 mismatch their rank
    rows = [
        ("g", 0, "user", "a", None, _ts(0)),
        ("g", 2, "user", "b", None, _ts(1)),
        ("g", 3, "user", "c", None, _ts(2)),
    ]
    got = _profile(spark, rows)["g"]
    assert got["n_gaps"] == 2 and got["n_ts_regressions"] == 0


def test_null_fields_never_crash_or_false_flag(spark):
    # NULL role/tool/ts flow through: NULL role is not an invalid enum
    # (not_null is a different constraint), NULL tool is not dangling
    rows = [
        ("n", 0, None, "a", None, _ts(0)),
        ("n", 1, "user", None, None, None),
    ]
    got = _profile(spark, rows)["n"]
    assert got["n_invalid_role"] == 0 and got["n_dangling_tool"] == 0
    assert got["n_turns"] == 2 and got["passed"] is True


def test_profile_reuses_one_exchange(spark):
    # scale shape: window (conv_id) and rollup (conv_id) must share one
    # hash partitioning — exactly one corpus exchange in the plan
    # (catalog side is broadcast, not exchanged)
    rows = [
        (f"c{i % 7}", j, "user", "x", None, _ts(j)) for i in range(20) for j in range(3)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    cat = spark.createDataFrame([("search",)], "tool_name string")
    plan = (
        conversation_profile(df, cat)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    # exactly one corpus shuffle, on conv_id; anything else must be the
    # catalog's pre-broadcast distinct (tiny side)
    assert keys.count("conv_id") == 1, plan
    assert all(k in ("conv_id", "_cat_tool") for k in keys), keys
