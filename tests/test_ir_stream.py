"""CLP IR stream format: wire-level round trips, 4->8-byte upgrade parity
with the batch parse, and the Spark batch/streaming ingestion paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clpspark.ref import encoder as E
from clpspark.ref import ir_format as IR

MESSAGES = [
    "static text",
    " INFO Task task_123 completed in 1353 ms",
    "big int 12345678901 small int -42 zero 0",
    "float 12.45 long float -25.5196868642755 tiny .1",
    "over-long float 12345678901234567.8 stays dict",
    "dict vars node-9.dc2.example.com and 0xDEADbeef12",
    "esc\x11const back\\slash pass",
    "unicode snowman ☃ stays constant",
    "",
    "a=b equals-var rule",
]
TS0 = 1_462_692_845_251
EVENTS = [(TS0 + i * 7_001, m) for i, m in enumerate(MESSAGES)]
# force every delta width: byte, short, int, long
EVENTS += [
    (TS0 + 70_010 + 1, "delta byte"),
    (TS0 + 70_010 + 30_000, "delta short"),
    (TS0 + 70_010 + 2_000_000_000, "delta int"),
    (TS0 + 70_010 + 2_000_000_000 + (1 << 40), "delta long"),
]


@pytest.mark.parametrize("four_byte", [True, False])
def test_wire_roundtrip(four_byte):
    buf = IR.serialize_ir_stream(EVENTS, four_byte=four_byte)
    stream = IR.deserialize_ir_stream(buf)
    assert stream.four_byte is four_byte
    assert stream.metadata["VERSION"] == "0.0.2"
    assert len(stream.events) == len(EVENTS)
    for (ts, msg), ev in zip(EVENTS, stream.events):
        assert ev.ts == ts
        assert IR.decode_event_message(ev, four_byte) == msg


def test_unsupported_version_rejected():
    buf = bytearray(IR.serialize_ir_stream(EVENTS[:1], four_byte=True,
                                           extra_meta={"VERSION": "0.1.0"}))
    with pytest.raises(IR.IrFormatError, match="version"):
        IR.deserialize_ir_stream(bytes(buf))


def test_magic_numbers():
    assert IR.serialize_ir_stream(EVENTS, four_byte=True)[:4] == bytes(
        [0xFD, 0x2F, 0xB5, 0x29]
    )
    assert IR.serialize_ir_stream(EVENTS, four_byte=False)[:4] == bytes(
        [0xFD, 0x2F, 0xB5, 0x30]
    )
    with pytest.raises(IR.IrFormatError):
        IR.deserialize_ir_stream(b"\x00\x01\x02\x03rest")


def test_four_byte_upgrade_matches_batch_parse():
    """After the 4->8 upgrade, every event's (logtype, vars) must equal the
    archive encoding the batch parser produces for the same message — incl.
    values the 4-byte wire had to ship as dictionary vars."""
    buf = IR.serialize_ir_stream(EVENTS, four_byte=True)
    stream = IR.deserialize_ir_stream(buf)
    for (_, msg), ev in zip(EVENTS, stream.events):
        lt, evars, dvars, dslots = IR.upgrade_event(ev, True)
        em = E.encode_message(msg)
        assert lt == em.logtype, msg
        assert dvars == em.dict_vars, msg
        got = [None if i in set(dslots) else v for i, v in enumerate(evars)]
        assert got == em.encoded_vars, msg


def test_four_byte_wire_downgrades_big_values_to_dict():
    """An int that exceeds int32 (and an over-8-digit float) must travel as a
    dictionary string on the 4-byte wire (EncodedVariableInterpreter 4-byte
    representability), then upgrade back to an encoded var."""
    msg = "v 12345678901 f 123.4567891"
    buf = IR.serialize_ir_stream([(0, msg)], four_byte=True)
    stream = IR.deserialize_ir_stream(buf)
    kinds = [k for k, _ in stream.events[0].raw_vars]
    assert kinds == ["d", "d"]  # both dict on the wire
    lt, evars, dvars, dslots = IR.upgrade_event(stream.events[0], True)
    assert dslots == [] and dvars == []  # both re-classified to encoded
    assert evars[0] == 12345678901
    assert E.decode_float(evars[1]) == "123.4567891"


# Golden matrices ported from tests/test-encoding_methods.cpp (the
# four_byte_encoded_variable_t template instantiations)
INT4_OK = ["0", "-1", "1", "-2147483648", "2147483647"]
INT4_BAD = ["2147483648", "-2147483649", "", "a", "-", "+", "-a", "+a", "--",
            "++", " 1", "- 1", "1 ", "01", "+1", "1u", "1U", "1l", "1L",
            "1ll", "1LL", "0.0", "-0"]
FLOAT4_OK = ["0.0", "-1.0", "1.0", ".1", "-00.00", "-3355443.1", "3355443.1",
             "-.33554431", ".33554431"]
FLOAT4_BAD = ["0.33554431", "-0.33554431", "3.3554432", "-3.3554432",
              "60.000004", "-60.000004", "", "a", "-", "+", "-a", "+a", "--",
              "++", ".", "1.", " 1.0", "1.0 ", "- 1.0", "+1.0", "1.0f",
              "1.0L", "1.0.0"]


@pytest.mark.parametrize("value", INT4_OK)
def test_int4_golden_ok(value):
    enc = IR.encode_int4(value)
    assert enc is not None and str(enc) == value  # decode == to_string


@pytest.mark.parametrize("value", INT4_BAD)
def test_int4_golden_bad(value):
    assert IR.encode_int4(value) is None


@pytest.mark.parametrize("value", FLOAT4_OK)
def test_float4_golden_roundtrip(value):
    enc = IR.encode_float4(value)
    assert enc is not None
    assert IR.decode_float4(enc) == value


@pytest.mark.parametrize("value", FLOAT4_BAD)
def test_float4_golden_bad(value):
    assert IR.encode_float4(value) is None


def test_four_byte_float_encoding_bounds():
    assert IR.encode_float4("12.45") is not None
    assert IR.encode_float4("12345678.9") is None  # 9 digits > 4-byte max
    assert IR.encode_float4("-1234567.8") is not None
    assert IR.decode_float4(IR.encode_float4("-0.00001")) == "-0.00001"
    assert IR.encode_int4("2147483647") == 2**31 - 1
    assert IR.encode_int4("2147483648") is None
    assert IR.encode_int4("-2147483648") == -(2**31)


def test_spark_ir_roundtrip(spark, tmp_path):
    """write_ir_files -> read_ir_files -> decode == original messages."""
    from clpspark.operators.decode import decode_messages
    from clpspark.operators.enrich import build_logtype_dict, build_var_dict
    from clpspark.sources.ir_stream import read_ir_files, write_ir_files

    rows = [(f"d{i:04d}", TS0 + i * 13, f"req {i} took {i}.{i % 10} ms on node-{i % 5}.example.com")
            for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, ts long, message string")
    out = str(tmp_path / "ir")
    write_ir_files(df.repartition(4), out, four_byte=True)

    parsed = read_ir_files(spark, out)
    lt, vd = build_logtype_dict(parsed), build_var_dict(parsed)
    from clpspark.operators.enrich import enrich

    enriched = enrich(parsed, lt, vd)
    decoded = decode_messages(enriched, vd)
    got = sorted(
        (r["ts"], r["message"]) for r in decoded.select("ts", "message").collect()
    )
    expected = sorted((ts, m) for _, ts, m in rows)
    assert got == expected


def test_ir_stream_to_archive_fanout(spark, tmp_path):
    """The reference's real-time path end to end: IR chunk files ->
    readStream -> enrich -> per-logtype archive fan-out; the streamed archive
    equals the batch-built one."""
    from clpspark.operators.enrich import build_logtype_dict, build_var_dict, enrich
    from clpspark.sources.ir_stream import read_ir_files, stream_ir_files, write_ir_files
    from clpspark.streaming.ingest import read_stream_routed, stream_route

    rows = [(f"d{i:04d}", TS0 + i * 11,
             f"job {i} took {i}.{i % 10} ms on node-{i % 3}.example.com")
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, ts long, message string")
    ir_dir = str(tmp_path / "ir_in")
    write_ir_files(df.repartition(3), ir_dir, four_byte=True)

    batch_parsed = read_ir_files(spark, ir_dir)
    lt, vd = build_logtype_dict(batch_parsed), build_var_dict(batch_parsed)

    out = str(tmp_path / "routed")
    ckpt = str(tmp_path / "ckpt")
    q = stream_route(stream_ir_files(spark, ir_dir), out, ckpt, lt, vd).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = read_stream_routed(spark, out)
    got = {r["logtype_id"]: r["n"] for r in
           streamed.groupBy("logtype_id").agg(F.count("*").alias("n")).collect()}
    expected = {r["logtype_id"]: r["n"] for r in
                enrich(batch_parsed, lt, vd)
                .groupBy("logtype_id").agg(F.count("*").alias("n")).collect()}
    assert got == expected and sum(got.values()) == 300


def test_extract_ir_chunks_from_archive(spark, tmp_path, vocab_meta,
                                        small_corpus):
    """Archive -> IR extraction round trip: routed events re-serialized as
    IR chunks decode back to the original (ts-stripped) messages."""
    from clpspark.corpus import detokenize
    from clpspark.operators.decode import decode_messages
    from clpspark.operators.enrich import build_logtype_dict, build_var_dict, enrich
    from clpspark.operators.parse import parse_sequences
    from clpspark.ref.timestamps import strip_timestamp
    from clpspark.sources.ir_stream import extract_ir_chunks, read_ir_files

    seqs = spark.read.parquet(small_corpus)
    parsed = parse_sequences(seqs, vocab_meta.vocab)
    lt, vd = build_logtype_dict(parsed), build_var_dict(parsed)
    routed_like = enrich(parsed, lt, vd).drop("logtype", "dict_vars")
    out = str(tmp_path / "ir_out")
    extract_ir_chunks(routed_like, vd, out, logtype_dict=lt)

    back = read_ir_files(spark, out)
    lt2, vd2 = build_logtype_dict(back), build_var_dict(back)
    decoded = decode_messages(enrich(back, lt2, vd2), vd2)
    got = sorted(r["message"] for r in decoded.select("message").collect())
    expected = sorted(
        strip_timestamp(detokenize(r["tokens"], vocab_meta.vocab))[2]
        for r in seqs.collect()
    )
    assert got == expected


def test_spark_ir_streaming(spark, tmp_path):
    """Real-time path: readStream over IR files == batch read."""
    from clpspark.sources.ir_stream import (
        read_ir_files,
        stream_ir_files,
        write_ir_files,
    )

    rows = [(f"d{i:04d}", TS0 + i, f"evt {i} ok") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, ts long, message string")
    out = str(tmp_path / "ir_stream")
    write_ir_files(df.repartition(3), out, four_byte=True)

    parsed = stream_ir_files(spark, out)
    assert parsed.isStreaming
    q = (
        parsed.groupBy("logtype")
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ir_counts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["logtype"]: r["count"]
           for r in spark.sql("SELECT * FROM ir_counts").collect()}
    batch = read_ir_files(spark, out)
    expected = {r["logtype"]: r["count"]
                for r in batch.groupBy("logtype").count().collect()}
    assert got == expected and sum(got.values()) == 200


def test_malformed_utf8_rejected():
    """UTF-8 validation parity: the reference validates string fields on
    ingest; here every IR string decodes strict UTF-8, so malformed bytes
    raise a clean error instead of corrupting the archive."""
    import pytest

    from clpspark.ref import ir_format as IR

    payload = IR.serialize_ir_stream([(1_462_690_000_000, "ok alpha 1")])
    # corrupt a byte inside the message region with an invalid UTF-8 lead
    bad = bytearray(payload)
    ix = bytes(bad).find(b"alpha")
    assert ix > 0
    bad[ix] = 0xFF
    with pytest.raises(UnicodeDecodeError):
        IR.deserialize_ir_stream(bytes(bad))
