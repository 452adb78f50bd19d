"""Baseline-JPEG decoder tests.

The encoder here is written independently from the decoder in
clpspark/operators/multimodal.py: it uses its own trivial-but-valid
canonical Huffman tables (all DC symbols at 4 bits, all AC symbols at
9 bits), its own explicit double-loop IDCT for the expected
reconstruction, and emits real T.81 marker streams (DQT 8/16-bit, SOF0,
DHT, DRI/RSTn, SOS, byte stuffing). JPEG is lossy, so the assertion
target is the encoder's own dequantize+IDCT reconstruction — bit
discrepancies beyond float-rounding ulps mean a real decode bug.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

import clpspark.operators.multimodal as M

ZZ = M._JPEG_ZIGZAG  # the zigzag permutation is spec data, not logic


# ------------------------------------------------------------- bit writer
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


# Trivial-but-valid canonical tables, intentionally unlike Annex K so the
# decoder's generic canonical build is what's under test: 12 DC symbols at
# length 4 (codes 0..11); 255 AC symbols at length 9 (codes 0..254) plus
# symbol 0xFF at length 10 (code 510) — DHT counts stay single bytes and
# no code is all ones.
_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_SYMBOLS = bytes(range(12))
_AC_COUNTS = bytes([0] * 8 + [255, 1] + [0] * 6)
_AC_SYMBOLS = bytes(range(256))


def _ac_code(sym: int) -> tuple[int, int]:
    """Canonical code for the AC table above: symbols 0..254 get 9-bit
    codes 0..254; symbol 255 gets the 10-bit code 510."""
    if sym < 255:
        return sym, 9
    return 510, 10


def _dc_code(sym: int) -> tuple[int, int]:
    return sym, 4


def _magnitude(v: int) -> tuple[int, int]:
    """(size category s, s-bit value field) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _fdct_ref(block: np.ndarray) -> np.ndarray:
    """Explicit double-loop forward DCT (independent of the decoder's
    matrix formulation)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[u, v] = 0.25 * cu * cv * s
    return out


def _idct_ref(coef: np.ndarray) -> np.ndarray:
    """Explicit double-loop inverse DCT for the expected reconstruction."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += cu * cv * coef[u, v] \
                        * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[x, y] = 0.25 * s
    return out


def _plane_blocks(plane: np.ndarray) -> tuple[int, int, np.ndarray]:
    """Pad a plane to the 8x8 grid with edge replication; return padded."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _enc_block(src: np.ndarray, qt: np.ndarray, pred: int,
               writer: _BitWriter) -> tuple[np.ndarray, int]:
    """FDCT+quantize+entropy-encode one 8x8 block; returns (the expected
    reconstruction of what was written, the new DC predictor)."""
    coef = _fdct_ref(src.astype(np.float64) - 128.0)
    q = np.round(coef / qt).astype(np.int64)
    rec = np.clip(
        np.round(_idct_ref(q.astype(np.float64) * qt) + 128.0), 0, 255)
    zz = q.flatten()[ZZ]
    s, bitsval = _magnitude(int(zz[0]) - pred)
    code, nlen = _dc_code(s)
    writer.put(code, nlen)
    if s:
        writer.put(bitsval, s)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, nlen = _ac_code(0xF0)  # ZRL
            writer.put(code, nlen)
            run -= 16
        s, bitsval = _magnitude(int(zz[k]))
        code, nlen = _ac_code((run << 4) | s)
        writer.put(code, nlen)
        writer.put(bitsval, s)
        run = 0
    if run:
        code, nlen = _ac_code(0x00)  # EOB
        writer.put(code, nlen)
    return rec, int(zz[0])


def _emit_rst(writer: _BitWriter, rst: int) -> None:
    writer.flush()
    writer.out += bytes([0xFF, 0xD0 + (rst % 8)])


def _encode_plane_mcus(planes, comps, mcux, mcuy, qts, writer,
                       restart, recon):
    """Encode MCUs interleaved across components; fill recon with the
    dequantized+IDCT expected pixels."""
    preds = {cid: 0 for cid, _, _, _ in comps}
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                _emit_rst(writer, rst)
                rst += 1
                preds = {cid: 0 for cid in preds}
            mcu_count += 1
            for cid, ch, cv, tq in comps:
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        rec, preds[cid] = _enc_block(
                            planes[cid][y0:y0 + 8, x0:x0 + 8],
                            qts[tq], preds[cid], writer)
                        recon[cid][y0:y0 + 8, x0:x0 + 8] = rec


def _encode_blocks_noninterleaved(plane, comp, hs, vs, w, h, qts, writer,
                                  restart, recon):
    """Non-interleaved (Ns=1) scan: MCU = one data unit, block grid from
    the component's own dimensions (T.81 A.2.2)."""
    cid, ch, cv, tq = comp
    comp_w = -(-(w * ch) // hs)
    comp_h = -(-(h * cv) // vs)
    bw, bh = -(-comp_w // 8), -(-comp_h // 8)
    pred = 0
    rst = 0
    for u in range(bw * bh):
        if restart and u and u % restart == 0:
            _emit_rst(writer, rst)
            rst += 1
            pred = 0
        by, bx = divmod(u, bw)
        rec, pred = _enc_block(
            plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
            qts[tq], pred, writer)
        recon[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = rec


def _encode_jpeg(px: np.ndarray, subsample: tuple[int, int] = (1, 1),
                 restart: int = 0, q16: bool = False,
                 sof: int = 0xC0, gray_hv: tuple[int, int] | None = None,
                 separate_scans: bool = False) -> tuple[bytes, np.ndarray]:
    """Encode uint8 gray (h,w) or RGB (h,w,3) as baseline JPEG. Returns
    (jpeg bytes, expected decoder output in the mean-luminance domain).
    ``gray_hv`` declares H/V sampling factors on a single-component frame
    (forcing the Ns=1 non-interleaved scan geometry); ``separate_scans``
    writes one SOS per component (the sequential multi-scan layout)."""
    h, w = px.shape[:2]
    gray = px.ndim == 2
    qt_luma = np.full(64, 8.0)
    qt_chroma = np.full(64, 13.0)
    qts = {0: qt_luma.reshape(8, 8), 1: qt_chroma.reshape(8, 8)}

    if gray:
        gh, gv = gray_hv or (1, 1)
        comps = [(1, gh, gv, 0)]
        hs, vs = gh, gv
        y_plane = px.astype(np.float64)
        plane_map = {1: y_plane}
    else:
        hs, vs = subsample
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y_plane = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [(1, hs, vs, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        plane_map = {1: y_plane, 2: cb, 3: cr}

    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * vs))
    padded = {}
    for cid, ch, cv, _ in comps:
        p = plane_map[cid]
        if ch < hs or cv < vs:  # downsample chroma by block average
            fy, fx = vs // cv, hs // ch
            ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
            p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * cv * 8, mcux * ch * 8
        p = np.clip(np.round(p), 0, 255)
        padded[cid] = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")

    recon = {cid: np.zeros_like(padded[cid]) for cid in padded}
    noninter = gray_hv is not None or separate_scans
    scan_payloads: list[tuple[int | None, bytes]] = []
    if noninter:  # one Ns=1 scan per component, block-grid geometry
        for comp in comps:
            wtr = _BitWriter()
            _encode_blocks_noninterleaved(
                padded[comp[0]], comp, hs, vs, w, h, qts, wtr, restart,
                recon[comp[0]])
            wtr.flush()
            scan_payloads.append((comp[0], bytes(wtr.out)))
    else:
        writer = _BitWriter()
        _encode_plane_mcus(padded, comps, mcux, mcuy, qts, writer,
                           restart, recon)
        writer.flush()
        scan_payloads.append((None, bytes(writer.out)))

    # expected decoder output
    full = {}
    for cid, ch, cv, _ in comps:
        p = recon[cid]
        if ch < hs or cv < vs:
            p = np.repeat(np.repeat(p, vs // cv, axis=0), hs // ch, axis=1)
        full[cid] = p[:h, :w]
    if gray:
        expected = full[1].astype(np.uint8)
    else:
        y2, cb2, cr2 = full[1], full[2], full[3]
        r2 = np.clip(np.round(y2 + 1.402 * (cr2 - 128.0)), 0, 255)
        g2 = np.clip(np.round(y2 - 0.344136 * (cb2 - 128.0)
                              - 0.714136 * (cr2 - 128.0)), 0, 255)
        b2 = np.clip(np.round(y2 + 1.772 * (cb2 - 128.0)), 0, 255)
        expected = ((r2.astype(np.uint32) + g2.astype(np.uint32)
                     + b2.astype(np.uint32)) // 3).astype(np.uint8)

    # ---- marker stream
    out = bytearray(b"\xff\xd8")
    if q16:
        body = bytes([0x10]) + b"".join(
            struct.pack(">H", int(v)) for v in qt_luma.flatten()[ZZ])
    else:
        body = bytes([0x00]) + bytes(
            int(v) for v in qt_luma.flatten()[ZZ])
    out += _seg(0xDB, body)
    out += _seg(0xDB, bytes([0x01]) + bytes(
        int(v) for v in qt_chroma.flatten()[ZZ]))
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        sof_body += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(sof, sof_body)
    out += _seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + _AC_COUNTS + _AC_SYMBOLS)
    out += _seg(0xC4, bytes([0x01]) + _DC_COUNTS + _DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x11]) + _AC_COUNTS + _AC_SYMBOLS)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    for scan_cid, data in scan_payloads:
        if scan_cid is None:  # interleaved: all components in one scan
            sos_body = bytes([len(comps)])
            for cid, _, _, _ in comps:
                dc_id = 0 if cid == 1 else 1
                sos_body += bytes([cid, (dc_id << 4) | dc_id])
        else:  # Ns=1 per-component scan
            dc_id = 0 if scan_cid == 1 else 1
            sos_body = bytes([1, scan_cid, (dc_id << 4) | dc_id])
        sos_body += bytes([0, 63, 0])
        out += _seg(0xDA, sos_body)
        out += data
    out += b"\xff\xd9"
    return bytes(out), expected


def _assert_close(got: np.ndarray, expected: np.ndarray) -> None:
    """Lossy-format equality: identical up to the ±1 float-rounding ulp
    between the two independent IDCT formulations."""
    assert got.shape == expected.shape
    diff = np.abs(got.astype(np.int32) - expected.astype(np.int32))
    assert diff.max() <= 1, f"max pixel diff {diff.max()}"
    assert (diff == 0).mean() > 0.9


def test_jpeg_grayscale_roundtrip():
    rng = np.random.default_rng(7)
    # smooth gradient + noise: exercises both DC-dominated and AC blocks
    base = np.add.outer(np.arange(24) * 5, np.arange(21) * 3) % 256
    px = ((base + rng.integers(0, 32, (24, 21))) % 256).astype(np.uint8)
    data, expected = _encode_jpeg(px)
    got = M._decode_payload(data)
    _assert_close(got, expected)


def test_jpeg_color_444_and_420():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (19, 26, 3), dtype=np.uint8)
    for sub in [(1, 1), (2, 2), (2, 1)]:
        data, expected = _encode_jpeg(px, subsample=sub)
        got = M._decode_payload(data)
        _assert_close(got, expected)


def test_jpeg_restart_intervals_and_16bit_dqt():
    rng = np.random.default_rng(29)
    px = rng.integers(0, 256, (33, 40), dtype=np.uint8)
    data, expected = _encode_jpeg(px, restart=3, q16=True)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data  # RSTn really emitted
    got = M._decode_payload(data)
    _assert_close(got, expected)


def test_jpeg_noninterleaved_single_component_scan():
    """A single-component frame with H=V=2 is legal and its Ns=1 scan is
    NON-interleaved (T.81 A.2.2): block grid = ceil(w/8) x ceil(h/8),
    not the MCU grid — w=24 means 3 blocks/row, not 4."""
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    data, expected = _encode_jpeg(px, gray_hv=(2, 2))
    got = M._decode_payload(data)
    _assert_close(got, expected)
    # with restart intervals counted in data units, not MCUs
    data, expected = _encode_jpeg(px, gray_hv=(2, 2), restart=4)
    _assert_close(M._decode_payload(data), expected)


def test_jpeg_separate_scans_per_component():
    """Sequential baseline with one SOS per component (legal multi-scan
    layout): each scan decodes non-interleaved into its own plane."""
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (17, 22, 3), dtype=np.uint8)
    for sub in [(1, 1), (2, 2)]:
        data, expected = _encode_jpeg(px, subsample=sub,
                                      separate_scans=True)
        assert data.count(b"\xff\xda") >= 3  # really three scans
        got = M._decode_payload(data)
        _assert_close(got, expected)


def test_jpeg_fill_bytes_before_markers():
    """0xFF fill bytes before a marker are legal padding (T.81 B.1.1.2)."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data, expected = _encode_jpeg(px)
    # insert fill bytes before the first DQT and before EOI
    padded = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    assert padded != data
    padded = padded[:-2] + b"\xff" + padded[-2:]
    _assert_close(M._decode_payload(padded), expected)


def test_jpeg_nonintegral_sampling_ratio_declared():
    """Hmax % Hi != 0 (e.g. 3:2) is legal JPEG but not decodable here —
    must be the declared NotImplementedError, not garbage output."""
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    data, _ = _encode_jpeg(px, subsample=(2, 2))
    # patch SOF: set Y to H=V=3 while chroma stays 2 -> ratio 3/2
    sof_at = data.index(b"\xff\xc0")
    comp0_hv = sof_at + 2 + 2 + 6 + 1  # marker+len+P/Y/X/Nf, comp id
    assert data[comp0_hv] == 0x22
    patched = data[:comp0_hv] + b"\x33" + data[comp0_hv + 1:]
    # (chroma H=V=1 still divides 3; give chroma 2 to force the error)
    comp1_hv = comp0_hv + 3
    patched = patched[:comp1_hv] + b"\x22" + patched[comp1_hv + 1:]
    with pytest.raises(NotImplementedError):
        M._decode_payload(patched)


def test_jpeg_progressive_and_truncated_are_declared():
    px = np.zeros((8, 8), dtype=np.uint8)
    data, _ = _encode_jpeg(px, sof=0xC2)  # progressive SOF marker
    with pytest.raises(NotImplementedError):
        M._decode_payload(data)
    good, _ = _encode_jpeg(px)
    with pytest.raises(ValueError):
        M._decode_payload(good[:20])  # truncated before SOS
    with pytest.raises(ValueError):
        M._decode_payload(good[:-24])  # truncated entropy data


def test_jpeg_through_spark_pipeline(spark):
    rng = np.random.default_rng(41)
    gray = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rgb = rng.integers(0, 256, (12, 18, 3), dtype=np.uint8)
    jg, eg = _encode_jpeg(gray)
    jc, ec = _encode_jpeg(rgb, subsample=(2, 2))
    rows = [("jpg_g", "image", jg, 16, 16, 1, 0),
            ("jpg_c", "image", jc, 18, 12, 1, 0)]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: np.array(r["features"], dtype=np.float32)
           for r in M.extract_features(df, n_features=8).collect()}

    def hist(px):
        hh, _ = np.histogram(px.astype(np.float64), bins=8, range=(0, 256))
        return (hh / (hh.sum() or 1)).astype(np.float32)

    # features come from the decoder's pixels; ±1-ulp pixel differences vs
    # the reference recon can move a pixel across a bin edge, so compare
    # against the DECODED pixels (plumbing check) and assert the decoded
    # pixels match the independent recon (value check).
    _assert_close(M._decode_payload(jg), eg)
    _assert_close(M._decode_payload(jc), ec)
    assert got["jpg_g"] == pytest.approx(hist(M._decode_payload(jg)))
    assert got["jpg_c"] == pytest.approx(hist(M._decode_payload(jc)))


def test_jpeg_png_cross_decoder_consistency():
    """The same pixels encoded losslessly as PNG and near-losslessly as
    JPEG (all-ones quant tables) must decode to images within the JPEG
    IDCT rounding band — the two independent decoders cross-validate."""
    from tests.test_dataops import _encode_png

    rng = np.random.default_rng(53)
    # smooth image: all-ones quant keeps JPEG error to IDCT rounding only
    px = ((np.add.outer(np.arange(16) * 7, np.arange(24) * 3) // 2) % 256
          ).astype(np.uint8)
    png = _encode_png(px, 0, filters=[0, 1, 2, 3, 4])
    from_png = M._decode_payload(png)
    assert (from_png == px).all()  # PNG is exact

    # JPEG path (fixed quant tables; recon = the encoder's own expectation)
    data, expected = _encode_jpeg(px)
    from_jpeg = M._decode_payload(data)
    _assert_close(from_jpeg, expected)
    # and the JPEG recon itself stays within quantization distance of the
    # PNG (exact) pixels: quant step 8 bounds per-coefficient error; the
    # spatial error for this smooth ramp stays small
    diff = np.abs(from_jpeg.astype(int) - from_png.astype(int))
    assert diff.mean() < 6 and diff.max() <= 32
