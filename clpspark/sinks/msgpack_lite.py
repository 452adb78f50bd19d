"""Minimal msgpack serializer (public spec: github.com/msgpack/msgpack).

The reference streams each search result as one msgpack-packed 5-tuple
(clp/clo/OutputHandler.cpp:34-43, clp_s/OutputHandlerImpl.cpp:39-54).
The ``msgpack`` package isn't in this environment, so the subset needed
for those tuples (and mongo-style result documents) is implemented here:
nil / bool / int / float64 / str / bin / array / map.
"""

from __future__ import annotations

import struct


def packb(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += struct.pack(">BB", 0xD9, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n < 0x100:
            out += struct.pack(">BB", 0xC4, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for v in obj:
            _pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 0x80:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 0x100:
        out += struct.pack(">BB", 0xCC, v)
    elif 0 <= v < 0x10000:
        out += struct.pack(">BH", 0xCD, v)
    elif 0 <= v < 0x100000000:
        out += struct.pack(">BI", 0xCE, v)
    elif 0 <= v < 0x10000000000000000:
        out += struct.pack(">BQ", 0xCF, v)
    elif -0x80 <= v < 0x80:
        out += struct.pack(">Bb", 0xD0, v)
    elif -0x8000 <= v < 0x8000:
        out += struct.pack(">Bh", 0xD1, v)
    elif -0x80000000 <= v < 0x80000000:
        out += struct.pack(">Bi", 0xD2, v)
    elif -0x8000000000000000 <= v < 0x8000000000000000:
        out += struct.pack(">Bq", 0xD3, v)
    else:
        raise OverflowError(f"int out of msgpack range: {v}")


class Unpacker:
    """Streaming decoder for a concatenation of packed objects (the wire
    carries one packed tuple per result, back to back)."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def __iter__(self):
        while self.pos < len(self.buf):
            yield self._next()

    def _take(self, fmt: str, width: int):
        v = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += width
        return v

    def _next(self):
        t = self.buf[self.pos]
        self.pos += 1
        if t < 0x80:
            return t
        if t >= 0xE0:
            return t - 0x100
        if 0xA0 <= t < 0xC0:
            return self._str(t & 0x1F)
        if 0x90 <= t < 0xA0:
            return [self._next() for _ in range(t & 0x0F)]
        if 0x80 <= t < 0x90:
            return {self._next(): self._next() for _ in range(t & 0x0F)}
        if t == 0xC0:
            return None
        if t == 0xC2:
            return False
        if t == 0xC3:
            return True
        if t == 0xCB:
            return self._take(">d", 8)
        if t == 0xCA:
            return self._take(">f", 4)
        if t in (0xCC, 0xCD, 0xCE, 0xCF):
            return self._take(">" + "BHIQ"[t - 0xCC], (1, 2, 4, 8)[t - 0xCC])
        if t in (0xD0, 0xD1, 0xD2, 0xD3):
            return self._take(">" + "bhiq"[t - 0xD0], (1, 2, 4, 8)[t - 0xD0])
        if t in (0xD9, 0xDA, 0xDB):
            return self._str(
                self._take(">" + "BHI"[t - 0xD9], (1, 2, 4)[t - 0xD9]))
        if t in (0xC4, 0xC5, 0xC6):
            n = self._take(">" + "BHI"[t - 0xC4], (1, 2, 4)[t - 0xC4])
            b = self.buf[self.pos:self.pos + n]
            self.pos += n
            return bytes(b)
        if t in (0xDC, 0xDD):
            n = self._take(">" + "HI"[t - 0xDC], (2, 4)[t - 0xDC])
            return [self._next() for _ in range(n)]
        if t in (0xDE, 0xDF):
            n = self._take(">" + "HI"[t - 0xDE], (2, 4)[t - 0xDE])
            return {self._next(): self._next() for _ in range(n)}
        raise ValueError(f"unsupported msgpack tag 0x{t:02x}")

    def _str(self, n: int) -> str:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b.decode("utf-8")


def unpackb(buf: bytes):
    u = Unpacker(buf)
    obj = u._next()
    if u.pos != len(buf):
        raise ValueError("trailing bytes after packed object")
    return obj
