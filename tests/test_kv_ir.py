"""kv-pair (structured) IR stream: wire format + Spark source/sink.

Mirrors the reference's kv serde test shapes
(tests/test-ir_encoding_methods.cpp ffi_ir_stream_kv_pair_log_events_serde):
all int widths, float bit patterns, bools, null, empty object/array, plain
vs CLP strings, recursive nesting, auto-gen vs user-gen trees.
"""

from __future__ import annotations

import copy
import json

import pytest
from pyspark.sql import functions as F

from clpspark.ref import ir_format as IR
from clpspark.ref import kv_ir_format as KV

CLP_STR = 'uid=0, CPU usage: 99.99%, "user_name"=YScope'

BASIC = {
    "int8_max": 127, "int8_min": -128,
    "int16_max": 32767, "int16_min": -32768,
    "int32_max": 2147483647, "int32_min": -2147483648,
    "int64_max": (1 << 63) - 1, "int64_min": -(1 << 63),
    "float_zero": 0.0, "float_pos": 1.01, "float_neg": -1.01,
    "true": True, "false": False,
    "string": "short_string", "clp_string": CLP_STR,
    "null": None, "empty_object": {}, "empty_array": [],
}


def _reference_case_pairs():
    """The reference test's event list: basic + recursive depth-6 objects."""
    cases = [({}, {}), (BASIC, BASIC)]
    rec = dict(BASIC)
    arr = [1, 1.0, True, "short_string", CLP_STR, None, [], {}]
    for i in range(3):  # depth 3 is plenty for the wire paths
        orig = copy.deepcopy(rec)
        arr.append(copy.deepcopy(rec))
        rec[f"obj_{i}"] = orig
        rec[f"array_{i}"] = copy.deepcopy(arr)
        cases.append((copy.deepcopy(orig), copy.deepcopy(rec)))
        cases.append(({}, copy.deepcopy(rec)))
    return cases


@pytest.mark.parametrize("four_byte", [True, False])
def test_kv_wire_roundtrip_reference_shapes(four_byte):
    cases = _reference_case_pairs()
    meta = {"map": {"int": 0, "str": "STRING"}, "array": [0, 0.0, True, "S"]}
    payload = KV.serialize_kv_ir_stream(
        cases, four_byte=four_byte, user_defined_metadata=meta,
        utc_offset_ms=8 * 3600 * 1000,
    )
    s = KV.deserialize_kv_ir_stream(payload)
    assert s.four_byte == four_byte
    assert s.metadata[KV.USER_DEFINED_METADATA_KEY] == meta
    assert s.metadata[IR.VERSION_KEY] == KV.KV_VERSION
    assert len(s.events) == len(cases)
    for ev, (auto, user) in zip(s.events, cases):
        assert ev.auto_gen == auto
        assert ev.user_gen == user
        assert ev.utc_offset_ms == 8 * 3600 * 1000


def test_node_id_ones_complement_widths():
    """Auto-gen ids are one's complement at every width boundary
    (utils.hpp:198-234 + the boundary set in the reference's
    ffi_ir_stream_serialize_schema_tree_node_id test)."""
    for node_id in (0, 1, 126, 127, 128, 32766, 32767, 32768, 2**31 - 1):
        for is_auto in (True, False):
            buf = bytearray()
            KV._ser_node_id(node_id, is_auto, KV._NODE_ID_BYTE, buf)
            r = KV._Reader(bytes(buf), 0)
            got_auto, got_id = KV._de_node_id(r, r.tag(), KV._NODE_ID_BYTE)
            assert (got_auto, got_id) == (is_auto, node_id)
            # width selection: by id value, not by the complement
            want_len = 2 if node_id <= 127 else 3 if node_id <= 32767 else 5
            assert len(buf) == want_len


def test_kv_refuses_legacy_and_vice_versa():
    legacy = IR.serialize_ir_stream([(1000, "hello world 42")], four_byte=True)
    with pytest.raises(KV.KvIrFormatError):
        KV.deserialize_kv_ir_stream(legacy)
    kv = KV.serialize_kv_ir_stream([({}, {"a": 1})])
    with pytest.raises(IR.IrFormatError):
        IR.deserialize_ir_stream(kv)


def test_schema_tree_type_identity():
    """Same key with a different value type is a DIFFERENT schema node
    (SchemaTree (parent, key, type) identity) — both values survive."""
    events = [({}, {"x": 1}), ({}, {"x": "one two"}), ({}, {"x": 2.5})]
    s = KV.deserialize_kv_ir_stream(KV.serialize_kv_ir_stream(events))
    assert [e.user_gen for e in s.events] == [u for _, u in events]


def test_empty_and_null_semantics():
    events = [
        ({}, {}),                      # empty log event
        ({"timestamp": 5}, {}),        # auto-only event
        ({}, {"a": None}),             # null leaf
        ({}, {"a": {}}),               # empty-map leaf
        ({}, {"a": {"b": {"c": []}}}),  # nested empty array
    ]
    s = KV.deserialize_kv_ir_stream(KV.serialize_kv_ir_stream(events))
    assert [(e.auto_gen, e.user_gen) for e in s.events] == events


# ---------------------------------------------------------------- spark layer


@pytest.fixture(scope="module")
def kv_dir(spark, tmp_path_factory):
    from clpspark.sources.kv_ir_stream import write_kv_ir_files

    out = str(tmp_path_factory.mktemp("kvir"))
    rows = []
    for i in range(200):
        rec = {
            "level": "ERROR" if i % 5 == 0 else "INFO",
            "latency_ms": i * 3 + 0.5,
            "attempt": i % 4,
            "msg": f"request {i} took {i * 3}.5 ms on host{i % 7}",
            "ctx": {"job": i // 10, "ok": i % 2 == 0},
        }
        if i % 3 == 0:
            rec["extra"] = {"tag": f"t{i % 2}"}
        rows.append((f"d{i:04d}", 1_700_000_000_000 + i * 1000,
                     json.dumps(rec, separators=(",", ":"))))
    df = spark.createDataFrame(rows, "doc_id string, ts long, json string")
    write_kv_ir_files(df.repartition(4), out)
    return out, rows


def test_kv_spark_roundtrip(spark, kv_dir):
    from clpspark.sources.kv_ir_stream import read_kv_ir_files

    out, rows = kv_dir
    got = read_kv_ir_files(spark, out).collect()
    assert len(got) == len(rows)
    want = {(ts, json.dumps(json.loads(js), separators=(",", ":")))
            for _, ts, js in rows}
    assert {(r["ts"], r["json"]) for r in got} == want


def test_kv_ingest_schema_route(spark, kv_dir, tmp_path):
    """kv_ir_search.cpp analog: kv-IR -> typed records -> per-schema route;
    partition pruning + filters run over the deserialized values."""
    from clpspark.sources.json_logs import route_by_schema
    from clpspark.sources.kv_ir_stream import kv_ir_ingest

    out, rows = kv_dir
    typed = kv_ir_ingest(spark, out)
    # two schemas: with and without the optional "extra" subtree
    n_schemas = typed.select("schema_id").distinct().count()
    assert n_schemas == 2
    routed_dir = str(tmp_path / "kv_routed")
    route_by_schema(typed, routed_dir)
    routed = spark.read.parquet(routed_dir)
    assert routed.count() == len(rows)
    # KQL-ish filter over deserialized values matches recomputation from rows
    got = routed.where(
        (F.col("level") == "ERROR") & (F.col("ctx.ok"))
    ).count()
    want = sum(
        1 for _, _, js in rows
        if (r := json.loads(js))["level"] == "ERROR" and r["ctx"]["ok"]
    )
    assert got == want


def test_kv_stream_ingestion(spark, kv_dir, tmp_path):
    from clpspark.sources.kv_ir_stream import stream_kv_ir_files

    out, rows = kv_dir
    stream = stream_kv_ir_files(spark, out)
    q = (
        stream.writeStream.outputMode("append").format("memory")
        .queryName("kv_stream_test").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM kv_stream_test").first()["n"]
    assert got == len(rows)


def test_kv_ingest_kql(spark, kv_dir):
    """kv_ir_search.cpp end to end: KQL filters evaluate over the typed
    records deserialized from kv-pair IR."""
    from clpspark.plans.kql import kql_filter
    from clpspark.sources.kv_ir_stream import kv_ir_ingest

    out, rows = kv_dir
    typed = kv_ir_ingest(spark, out)
    got = {
        r["doc_id"]
        for r in kql_filter(
            typed, 'level: "ERROR" AND ctx: {ok: true}'
        ).select("doc_id").collect()
    }
    want = set()
    for doc_id, _, js in rows:
        rec = json.loads(js)
        if rec["level"] == "ERROR" and rec["ctx"]["ok"]:
            want.add(f"{doc_id}")
    # doc ids are re-minted from file offsets; compare counts + payloads
    assert len(got) == len(want) and len(got) > 0
    vals = {
        (r["attempt"], r["latency_ms"])
        for r in kql_filter(typed, 'level: "ERROR" AND ctx: {ok: true}')
        .select("attempt", "latency_ms").collect()
    }
    want_vals = {
        (rec["attempt"], rec["latency_ms"])
        for _, _, js in rows
        if (rec := json.loads(js))["level"] == "ERROR" and rec["ctx"]["ok"]
    }
    assert vals == want_vals


def test_kv_ingest_reserved_key_collision(spark, tmp_path):
    """A user-gen record key named like a transport column (ts) must stay
    reachable (as ts_rec) instead of crashing or shadowing — and schema_id
    is computed over the RECORD leaves, including the colliding one."""
    from clpspark.sources.kv_ir_stream import kv_ir_ingest, write_kv_ir_files

    out = str(tmp_path / "kv")
    rows = [
        ("d0", 1_462_690_000_000, '{"ts": 5, "ok": true}'),
        ("d1", 1_462_690_001_000, '{"ok": false}'),
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts long, json string")
    write_kv_ir_files(df.repartition(1), out)
    typed = kv_ir_ingest(spark, out)
    assert "ts_rec" in typed.columns and "ts" in typed.columns
    got = {r["ts_rec"]: r for r in typed.collect()}
    assert got[5]["ok"] is True and got[None]["ok"] is False
    # transport ts survives independently of the user key
    assert {r["ts"] for r in typed.collect()} == {
        1_462_690_000_000, 1_462_690_001_000
    }
    # the colliding leaf participates in the record schema -> 2 schemas
    assert typed.select("schema_id").distinct().count() == 2
