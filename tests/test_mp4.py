"""MP4 (ISO BMFF) container demux tests.

The file under test is hand-assembled here box-by-box (ftyp/mdat/moov
with two tracks), independently of the parser in multimodal.py, with
known sample sizes, chunk layouts, decode/composition timestamps, and a
sample-to-chunk table that actually varies per chunk — so stts, ctts,
stsc, stsz, and stco are each load-bearing.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

import clpspark.operators.multimodal as M


def _box(btype: bytes, *bodies: bytes) -> bytes:
    body = b"".join(bodies)
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, ver: int, body: bytes) -> bytes:
    return _box(btype, bytes([ver]) + b"\x00\x00\x00" + body)


def _u32(*vals: int) -> bytes:
    return b"".join(struct.pack(">I", v) for v in vals)


VID_FRAMES = [b"FRAME0", b"FRAME11", b"FRAME222"]
AUD_FRAMES = [b"AUD0", b"AUD11"]


def _build_mp4() -> tuple[bytes, list[int]]:
    """Returns (payload, absolute offsets of the 3 video frames)."""
    ftyp = _box(b"ftyp", b"isom", _u32(512), b"isomiso2")
    # mdat layout: vf0 vf1 | af0 | vf2 | af1
    mdat_body = (VID_FRAMES[0] + VID_FRAMES[1] + AUD_FRAMES[0]
                 + VID_FRAMES[2] + AUD_FRAMES[1])
    mdat = _box(b"mdat", mdat_body)
    base = len(ftyp) + 8  # first mdat payload byte
    v_off = [base,
             base + len(VID_FRAMES[0]),
             base + len(VID_FRAMES[0]) + len(VID_FRAMES[1])
             + len(AUD_FRAMES[0])]
    a_off = [base + len(VID_FRAMES[0]) + len(VID_FRAMES[1]),
             v_off[2] + len(VID_FRAMES[2])]

    def trak(track_id: int, handler: bytes, codec: bytes, timescale: int,
             stts_rows, ctts_rows, stsc_rows, sizes, chunk_offs) -> bytes:
        tkhd = _full(b"tkhd", 0, _u32(0, 0, track_id, 0) + b"\x00" * 60)
        mdhd = _full(b"mdhd", 0, _u32(0, 0, timescale, 1000)
                     + b"\x00\x00\x00\x00")
        hdlr = _full(b"hdlr", 0, _u32(0) + handler + b"\x00" * 12 + b"x\x00")
        stsd = _full(b"stsd", 0, _u32(1)
                     + _box(codec, b"\x00" * 8))  # minimal sample entry
        stts = _full(b"stts", 0, _u32(len(stts_rows))
                     + b"".join(_u32(c, d) for c, d in stts_rows))
        ctts = b""
        if ctts_rows:
            ctts = _full(b"ctts", 0, _u32(len(ctts_rows))
                         + b"".join(_u32(c, o) for c, o in ctts_rows))
        stsc = _full(b"stsc", 0, _u32(len(stsc_rows))
                     + b"".join(_u32(*r) for r in stsc_rows))
        stsz = _full(b"stsz", 0, _u32(0, len(sizes)) + _u32(*sizes))
        stco = _full(b"stco", 0, _u32(len(chunk_offs)) + _u32(*chunk_offs))
        stbl = _box(b"stbl", stsd, stts, ctts, stsc, stsz, stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd, hdlr, minf)
        return _box(b"trak", tkhd, mdia)

    vtrak = trak(
        1, b"vide", b"avc1", 1000,
        stts_rows=[(2, 100), (1, 150)],            # dts: 0, 100, 200
        ctts_rows=[(3, 50)],                       # pts = dts + 50
        stsc_rows=[(1, 2, 1), (2, 1, 1)],          # chunk1: 2, chunk2: 1
        sizes=[len(f) for f in VID_FRAMES],
        chunk_offs=[v_off[0], v_off[2]],
    )
    atrak = trak(
        2, b"soun", b"mp4a", 8000,
        stts_rows=[(2, 1024)],
        ctts_rows=[],
        stsc_rows=[(1, 1, 1)],
        sizes=[len(f) for f in AUD_FRAMES],
        chunk_offs=a_off,
    )
    mvhd = _full(b"mvhd", 0, _u32(0, 0, 1000, 1000) + b"\x00" * 80)
    moov = _box(b"moov", mvhd, vtrak, atrak)
    return ftyp + mdat + moov, v_off


def test_mp4_sample_table():
    payload, v_off = _build_mp4()
    samples = M.mp4_sample_table(payload)
    vid = [s for s in samples if s["handler"] == "vide"]
    aud = [s for s in samples if s["handler"] == "soun"]
    assert len(vid) == 3 and len(aud) == 2
    assert [s["codec"] for s in vid] == ["avc1"] * 3
    assert aud[0]["codec"] == "mp4a"
    assert [s["offset"] for s in vid] == v_off
    assert [s["size"] for s in vid] == [6, 7, 8]
    # timestamps: stts deltas + ctts composition offset over timescale 1000
    assert [s["dts"] for s in vid] == [0, 100, 200]
    assert [s["pts_ms"] for s in vid] == [50.0, 150.0, 250.0]
    # the byte ranges really address the mdat frame payloads
    for s, want in zip(vid, VID_FRAMES):
        assert payload[s["offset"]:s["offset"] + s["size"]] == want
    # audio: timescale 8000, no ctts
    assert aud[1]["pts_ms"] == pytest.approx(1024 * 1000.0 / 8000)

    with pytest.raises(ValueError):
        M.mp4_sample_table(b"\x00\x00\x00\x08free")  # no moov
    with pytest.raises(ValueError):
        M.mp4_sample_table(payload[:40])  # truncated box


def test_mp4_corrupt_tables_are_value_errors():
    """Corrupt entry counts and out-of-range sample offsets must fail as
    ValueError (the module's malformed-input contract), never read
    neighboring boxes or return silently-truncated frame bytes."""
    payload, _ = _build_mp4()

    # stsz sample_count inflated: entries would overrun the box
    at = payload.index(b"stsz") + 4  # box body (ver/flags)
    bad = payload[:at + 8] + struct.pack(">I", 10 ** 6) + payload[at + 12:]
    with pytest.raises(ValueError, match="entry count"):
        M.mp4_sample_table(bad)

    # stco chunk offset pointing far past the payload end
    at = payload.index(b"stco") + 4
    bad = (payload[:at + 8] + struct.pack(">I", 1 << 24)
           + payload[at + 12:])
    with pytest.raises(ValueError, match="byte range"):
        M.mp4_sample_table(bad)

    # output ordering is by (track_id, sample_ix) even though the builder
    # emits the video trak first — verified explicitly here
    samples = M.mp4_sample_table(payload)
    keys = [(s["track_id"], s["sample_ix"]) for s in samples]
    assert keys == sorted(keys)


def test_mp4_frame_sampling_in_spark(spark):
    payload, _ = _build_mp4()
    fake = M.synth_media(spark, 3).where("kind = 'video'").collect()[0]
    rows = [("mp4_0", "video", payload, 0, 0, 3, 0),
            (fake["media_id"], "video", bytes(fake["payload"]), 16, 16,
             int(fake["n_frames"]), 16000)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = M.sample_mp4_frames(df, every_n=2).collect()
    by_id: dict[str, list] = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    mp4_rows = sorted(by_id["mp4_0"], key=lambda r: r["frame_ix"])
    # every_n=2 over 3 samples keeps sample_ix 0 and 2, real bytes + pts
    assert [r["frame_ix"] for r in mp4_rows] == [0, 2]
    assert bytes(mp4_rows[0]["frame"]) == VID_FRAMES[0]
    assert bytes(mp4_rows[1]["frame"]) == VID_FRAMES[2]
    assert [r["pts_ms"] for r in mp4_rows] == [50.0, 250.0]
    assert mp4_rows[0]["codec"] == "avc1"
    # non-MP4 video rows keep the metadata fallback: indices, null bytes
    fb = sorted(by_id[fake["media_id"]], key=lambda r: r["frame_ix"])
    assert [r["frame_ix"] for r in fb] == list(
        range(0, int(fake["n_frames"]), 2))
    assert all(r["frame"] is None and r["pts_ms"] is None for r in fb)
