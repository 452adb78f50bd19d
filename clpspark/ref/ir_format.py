"""CLP IR stream wire format — pure-Python serializer/deserializer.

Re-expresses the reference's unstructured IR stream (the format logging
libraries emit and `clp` ingests in real time):

  - protocol bytes / magic numbers .... clp/ffi/ir_stream/protocol_constants.hpp
  - preamble + JSON metadata .......... clp/ffi/ir_stream/utils.cpp:16-35,
                                        encoding_methods.cpp:96-199
  - log-event serialization ........... clp/ffi/ir_stream/encoding_methods.cpp
                                        (vars -> logtype -> timestamp[delta])
  - 4-byte variable encoding .......... clp/ffi/encoding_methods.inc:13-165
                                        (int32 ints; 25-bit-digit floats)
  - 4-byte -> 8-byte upgrade .......... clp/ffi/encoding_methods.cpp:13-40 +
                                        clp/EncodedVariableInterpreter.hpp:288-360
                                        (dict vars re-classified with the
                                        8-byte rules at archive ingest)

All integers are big-endian (utils.hpp:136-150). Behavior is matched against
the reference's tests; no code is copied.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

from clpspark.ref import encoder as E

# -- protocol constants (protocol_constants.hpp) ------------------------------

MAGIC_FOUR_BYTE = bytes([0xFD, 0x2F, 0xB5, 0x29])
MAGIC_EIGHT_BYTE = bytes([0xFD, 0x2F, 0xB5, 0x30])

_META_ENCODING_JSON = 0x01
_META_LEN_UBYTE = 0x11
_META_LEN_USHORT = 0x12

_VAR_FOUR_BYTE = 0x18
_VAR_EIGHT_BYTE = 0x19
_VAR_STR_LEN_UBYTE = 0x11
_VAR_STR_LEN_USHORT = 0x12
_VAR_STR_LEN_INT = 0x13
_LOGTYPE_LEN_UBYTE = 0x21
_LOGTYPE_LEN_USHORT = 0x22
_LOGTYPE_LEN_INT = 0x23
_TS_VAL = 0x30
_TS_DELTA_BYTE = 0x31
_TS_DELTA_SHORT = 0x32
_TS_DELTA_INT = 0x33
_TS_DELTA_LONG = 0x34
_UTC_OFFSET_CHANGE = 0x3F
_EOF = 0x00

VERSION_KEY = "VERSION"
BACKWARD_COMPATIBLE_VERSION = "0.0.2"

_INT32_MIN, _INT32_MAX = -(1 << 31), (1 << 31) - 1
_FOUR_BYTE_FLOAT_DIGITS_MASK = (1 << 25) - 1

# -- 4-byte variable encoding (ffi/encoding_methods.inc) -----------------------


def encode_int4(value: str) -> int | None:
    """String -> representable int32, or None (same prefix rules as the
    8-byte encoder; only the range differs)."""
    v = E.encode_int(value)
    if v is None or v < _INT32_MIN or v > _INT32_MAX:
        return None
    return v


def encode_float4(value: str) -> int | None:
    """String -> 4-byte packed decimal float (1 sign + 25 digit bits +
    3 num_digits + 3 decimal_pos), or None."""
    if not value:
        return None
    pos = 0
    max_length = 9  # 8 digits + decimal point
    is_negative = False
    if value[0] == "-":
        is_negative = True
        pos = 1
        max_length = 10
    if len(value) > max_length:
        return None
    num_digits = 0
    decimal_point_pos = None
    digits = 0
    for i in range(pos, len(value)):
        c = value[i]
        if "0" <= c <= "9":
            digits = digits * 10 + (ord(c) - 48)
            num_digits += 1
        elif decimal_point_pos is None and c == ".":
            decimal_point_pos = len(value) - 1 - i
        else:
            return None
    if decimal_point_pos is None or decimal_point_pos == 0 or num_digits == 0:
        return None
    if digits > _FOUR_BYTE_FLOAT_DIGITS_MASK:
        return None
    enc = 1 if is_negative else 0
    enc <<= 25
    enc |= digits & _FOUR_BYTE_FLOAT_DIGITS_MASK
    enc <<= 3
    enc |= (num_digits - 1) & 0x07
    enc <<= 3
    enc |= (decimal_point_pos - 1) & 0x07
    if enc > _INT32_MAX:  # bit_cast uint32 -> int32
        enc -= 1 << 32
    return enc


def decode_float4_properties(enc4: int) -> tuple[bool, int, int, int]:
    """(is_negative, digits, num_digits, decimal_point_pos) of a 4-byte float."""
    enc = enc4 & 0xFFFFFFFF
    decimal_pos = (enc & 0x07) + 1
    enc >>= 3
    num_digits = (enc & 0x07) + 1
    enc >>= 3
    digits = enc & _FOUR_BYTE_FLOAT_DIGITS_MASK
    enc >>= 25
    return enc > 0, digits, num_digits, decimal_pos


def upgrade_float_4to8(enc4: int) -> int:
    """encode_four_byte_float_as_eight_byte (ffi/encoding_methods.cpp:13-34):
    re-pack the same decimal properties into the 8-byte layout."""
    is_negative, digits, num_digits, decimal_pos = decode_float4_properties(enc4)
    enc = 1 if is_negative else 0
    enc <<= 55
    enc |= digits & ((1 << 54) - 1)
    enc <<= 4
    enc |= (num_digits - 1) & 0x0F
    enc <<= 4
    enc |= (decimal_pos - 1) & 0x0F
    if enc > (1 << 63) - 1:
        enc -= 1 << 64
    return enc


def decode_float4(enc4: int) -> str:
    """4-byte float back to its original string (via the shared 8-byte path)."""
    return E.decode_float(upgrade_float_4to8(enc4))


# -- serialization -------------------------------------------------------------


def _serialize_metadata(meta: dict, buf: bytearray) -> None:
    payload = json.dumps(meta, separators=(",", ":")).encode("utf-8")
    buf.append(_META_ENCODING_JSON)
    if len(payload) <= 0xFF:
        buf.append(_META_LEN_UBYTE)
        buf.append(len(payload))
    elif len(payload) <= 0xFFFF:
        buf.append(_META_LEN_USHORT)
        buf += struct.pack(">H", len(payload))
    else:
        raise ValueError("metadata longer than 64 KiB")
    buf += payload


def _serialize_str(s: str, buf: bytearray, tags: tuple[int, int, int]) -> None:
    b = s.encode("utf-8")
    ub, ush, i32 = tags
    if len(b) <= 0xFF:
        buf.append(ub)
        buf.append(len(b))
    elif len(b) <= 0xFFFF:
        buf.append(ush)
        buf += struct.pack(">H", len(b))
    else:
        buf.append(i32)
        buf += struct.pack(">i", len(b))
    buf += b


def serialize_preamble(
    four_byte: bool = True,
    ts_pattern: str = "",
    ts_pattern_syntax: str = "",
    tz_id: str = "UTC",
    reference_ts: int = 0,
    extra_meta: dict | None = None,
) -> bytes:
    buf = bytearray(MAGIC_FOUR_BYTE if four_byte else MAGIC_EIGHT_BYTE)
    meta = {
        VERSION_KEY: BACKWARD_COMPATIBLE_VERSION,
        "VARIABLES_SCHEMA_ID": "com.yscope.clp.VariablesSchemaV2",
        "VARIABLE_ENCODING_METHODS_ID": "com.yscope.clp.VariableEncodingMethodsV1",
        "TIMESTAMP_PATTERN": ts_pattern,
        "TIMESTAMP_PATTERN_SYNTAX": ts_pattern_syntax,
        "TZ_ID": tz_id,
    }
    if four_byte:
        meta["REFERENCE_TIMESTAMP"] = str(reference_ts)
    if extra_meta:
        meta.update(extra_meta)
    _serialize_metadata(meta, buf)
    return bytes(buf)


def _encode_message(message: str, four_byte: bool, buf: bytearray) -> None:
    """Vars (wire order) then logtype, per serialize_message."""
    parts: list[str] = []
    last = 0
    end = 0
    while (bounds := E.get_bounds_of_next_var(message, end)) is not None:
        begin, end = bounds
        parts.append(E.escape_constant(message[last:begin]))
        last = end
        tok = message[begin:end]
        iv = encode_int4(tok) if four_byte else E.encode_int(tok)
        if iv is not None:
            parts.append(E.PLACEHOLDER_INT)
            if four_byte:
                buf.append(_VAR_FOUR_BYTE)
                buf += struct.pack(">i", iv)
            else:
                buf.append(_VAR_EIGHT_BYTE)
                buf += struct.pack(">q", iv)
            continue
        fv = encode_float4(tok) if four_byte else E.encode_float(tok)
        if fv is not None:
            parts.append(E.PLACEHOLDER_FLOAT)
            if four_byte:
                buf.append(_VAR_FOUR_BYTE)
                buf += struct.pack(">i", fv)
            else:
                buf.append(_VAR_EIGHT_BYTE)
                buf += struct.pack(">q", fv)
            continue
        parts.append(E.PLACEHOLDER_DICT)
        _serialize_str(
            tok, buf,
            (_VAR_STR_LEN_UBYTE, _VAR_STR_LEN_USHORT, _VAR_STR_LEN_INT),
        )
    parts.append(E.escape_constant(message[last:]))
    _serialize_str(
        "".join(parts), buf,
        (_LOGTYPE_LEN_UBYTE, _LOGTYPE_LEN_USHORT, _LOGTYPE_LEN_INT),
    )


def serialize_log_event(
    message: str,
    ts_or_delta: int,
    four_byte: bool = True,
) -> bytes:
    """One IR unit: vars, logtype, then timestamp (delta for 4-byte streams,
    absolute for 8-byte streams)."""
    buf = bytearray()
    _encode_message(message, four_byte, buf)
    if four_byte:
        d = ts_or_delta
        if -(1 << 7) <= d < (1 << 7):
            buf.append(_TS_DELTA_BYTE)
            buf += struct.pack(">b", d)
        elif -(1 << 15) <= d < (1 << 15):
            buf.append(_TS_DELTA_SHORT)
            buf += struct.pack(">h", d)
        elif -(1 << 31) <= d < (1 << 31):
            buf.append(_TS_DELTA_INT)
            buf += struct.pack(">i", d)
        else:
            buf.append(_TS_DELTA_LONG)
            buf += struct.pack(">q", d)
    else:
        buf.append(_TS_VAL)
        buf += struct.pack(">q", ts_or_delta)
    return bytes(buf)


def serialize_ir_stream(
    events: list[tuple[int, str]],
    four_byte: bool = True,
    extra_meta: dict | None = None,
    tz_id: str = "UTC",
) -> bytes:
    """Full stream: preamble + (ts_ms, message) events + EOF byte."""
    ref_ts = events[0][0] if (four_byte and events) else 0
    buf = bytearray(
        serialize_preamble(
            four_byte=four_byte, reference_ts=ref_ts, tz_id=tz_id,
            extra_meta=extra_meta,
        )
    )
    prev = ref_ts
    for ts, msg in events:
        if four_byte:
            buf += serialize_log_event(msg, ts - prev, four_byte=True)
            prev = ts
        else:
            buf += serialize_log_event(msg, ts, four_byte=False)
    buf.append(_EOF)
    return bytes(buf)


# -- deserialization ------------------------------------------------------------


@dataclass
class IrLogEvent:
    ts: int
    logtype: str
    # wire-order var payloads: ('e', int) encoded, ('d', str) dictionary
    raw_vars: list[tuple[str, int | str]] = field(default_factory=list)


@dataclass
class IrStream:
    four_byte: bool
    metadata: dict
    events: list[IrLogEvent]


class IrFormatError(ValueError):
    pass


def _read_len(buf: bytes, pos: int, tags: tuple[int, int, int]) -> tuple[int, int]:
    tag = buf[pos]
    ub, ush, i32 = tags
    if tag == ub:
        return buf[pos + 1], pos + 2
    if tag == ush:
        return struct.unpack_from(">H", buf, pos + 1)[0], pos + 3
    if tag == i32:
        return struct.unpack_from(">i", buf, pos + 1)[0], pos + 5
    raise IrFormatError(f"bad length tag 0x{tag:02x} at {pos}")


def deserialize_ir_stream(buf: bytes) -> IrStream:
    """Parse a complete IR stream buffer (magic + metadata + units + EOF)."""
    magic = buf[:4]
    if magic == MAGIC_FOUR_BYTE:
        four_byte = True
    elif magic == MAGIC_EIGHT_BYTE:
        four_byte = False
    else:
        raise IrFormatError(f"bad magic {magic!r}")
    pos = 4
    if buf[pos] != _META_ENCODING_JSON:
        raise IrFormatError("expected JSON metadata")
    mlen, pos = _read_len(buf, pos + 1, (_META_LEN_UBYTE, _META_LEN_USHORT, -1))
    metadata = json.loads(buf[pos:pos + mlen].decode("utf-8"))
    pos += mlen
    version = str(metadata.get(VERSION_KEY, BACKWARD_COMPATIBLE_VERSION))
    # this reader implements the pre-kv-pair stream (VERSION 0.0.x); refuse
    # newer majors/minors instead of misparsing (ir_stream validate_version)
    if not version.startswith("0.0."):
        raise IrFormatError(f"unsupported IR stream version: {version}")

    events: list[IrLogEvent] = []
    prev_ts = int(metadata.get("REFERENCE_TIMESTAMP", "0")) if four_byte else 0
    raw_vars: list[tuple[str, int | str]] = []
    logtype: str | None = None
    n = len(buf)
    while pos < n:
        tag = buf[pos]
        if tag == _EOF:
            break
        if tag == _VAR_FOUR_BYTE:
            raw_vars.append(("e", struct.unpack_from(">i", buf, pos + 1)[0]))
            pos += 5
        elif tag == _VAR_EIGHT_BYTE:
            raw_vars.append(("e", struct.unpack_from(">q", buf, pos + 1)[0]))
            pos += 9
        elif tag in (_VAR_STR_LEN_UBYTE, _VAR_STR_LEN_USHORT, _VAR_STR_LEN_INT):
            slen, pos = _read_len(
                buf, pos,
                (_VAR_STR_LEN_UBYTE, _VAR_STR_LEN_USHORT, _VAR_STR_LEN_INT),
            )
            raw_vars.append(("d", buf[pos:pos + slen].decode("utf-8")))
            pos += slen
        elif tag in (_LOGTYPE_LEN_UBYTE, _LOGTYPE_LEN_USHORT, _LOGTYPE_LEN_INT):
            slen, pos = _read_len(
                buf, pos,
                (_LOGTYPE_LEN_UBYTE, _LOGTYPE_LEN_USHORT, _LOGTYPE_LEN_INT),
            )
            logtype = buf[pos:pos + slen].decode("utf-8")
            pos += slen
        elif tag == _TS_VAL:
            ts = struct.unpack_from(">q", buf, pos + 1)[0]
            pos += 9
            if logtype is None:
                raise IrFormatError("timestamp before logtype")
            events.append(IrLogEvent(ts, logtype, raw_vars))
            raw_vars, logtype = [], None
        elif tag in (_TS_DELTA_BYTE, _TS_DELTA_SHORT, _TS_DELTA_INT,
                     _TS_DELTA_LONG):
            fmt, width = {
                _TS_DELTA_BYTE: (">b", 1),
                _TS_DELTA_SHORT: (">h", 2),
                _TS_DELTA_INT: (">i", 4),
                _TS_DELTA_LONG: (">q", 8),
            }[tag]
            delta = struct.unpack_from(fmt, buf, pos + 1)[0]
            pos += 1 + width
            if logtype is None:
                raise IrFormatError("timestamp before logtype")
            prev_ts += delta
            events.append(IrLogEvent(prev_ts, logtype, raw_vars))
            raw_vars, logtype = [], None
        elif tag == _UTC_OFFSET_CHANGE:
            pos += 9  # offset value unused here (TZ math is downstream)
        else:
            raise IrFormatError(f"unknown tag 0x{tag:02x} at {pos}")
    return IrStream(four_byte=four_byte, metadata=metadata, events=events)


# -- 4 -> 8 byte upgrade at ingest ----------------------------------------------


def upgrade_event(
    ev: IrLogEvent, four_byte: bool
) -> tuple[str, list[int], list[str], list[int]]:
    """IR unit -> archive encoding: (logtype, encoded_vars, dict_vars,
    dict_slots) with 8-byte variables.

    Walks the logtype placeholders (generic_decode_message order):
      - int vars sign-extend (encode_four_byte_integer_as_eight_byte)
      - float vars re-pack (encode_four_byte_float_as_eight_byte)
      - dictionary vars are RE-CLASSIFIED with the 8-byte rules — a value
        too large for the 4-byte wire encoding becomes a proper int/float
        variable in the archive (EncodedVariableInterpreter.hpp:288-360
        dict_var_handler), which rewrites its placeholder in the logtype.
    """
    parts: list[str] = []
    evars: list[int] = []
    dvars: list[str] = []
    dslots: list[int] = []
    vx = 0
    lt = ev.logtype
    i = 0
    n = len(lt)
    while i < n:
        c = lt[i]
        if c == E.PLACEHOLDER_ESCAPE:
            parts.append(lt[i:i + 2])
            i += 2
            continue
        if c == E.PLACEHOLDER_INT:
            kind, val = ev.raw_vars[vx]
            vx += 1
            assert kind == "e"
            parts.append(c)
            evars.append(int(val))  # sign-extension is implicit in python
        elif c == E.PLACEHOLDER_FLOAT:
            kind, val = ev.raw_vars[vx]
            vx += 1
            assert kind == "e"
            parts.append(c)
            evars.append(upgrade_float_4to8(int(val)) if four_byte else int(val))
        elif c == E.PLACEHOLDER_DICT:
            kind, s = ev.raw_vars[vx]
            vx += 1
            assert kind == "d"
            iv = E.encode_int(str(s))
            if iv is not None:
                parts.append(E.PLACEHOLDER_INT)
                evars.append(iv)
                i += 1
                continue
            fv = E.encode_float(str(s))
            if fv is not None:
                parts.append(E.PLACEHOLDER_FLOAT)
                evars.append(fv)
                i += 1
                continue
            parts.append(E.PLACEHOLDER_DICT)
            dslots.append(len(evars))
            evars.append(0)  # dict sentinel; enrich assigns the id
            dvars.append(str(s))
        else:
            parts.append(c)
        i += 1
    return "".join(parts), evars, dvars, dslots


def decode_event_message(ev: IrLogEvent, four_byte: bool) -> str:
    """IR unit -> original message text (round-trip check / extraction)."""
    lt, evars, dvars, dslots = upgrade_event(ev, four_byte)
    slots = set(dslots)
    evs = [None if i in slots else v for i, v in enumerate(evars)]
    return E.decode_message(lt, evs, dvars)
