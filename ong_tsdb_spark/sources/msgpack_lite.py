"""Minimal MessagePack codec (pure Python, zero dependencies).

The reference's binary ingest route decodes a msgpack array of
``(db, sensor, metrics, values, ts_ns)`` tuples (reference
``src/ong_tsdb/server.py:317-327``, client ``client.py:357-366``).
The container has no ``msgpack`` wheel, so this module implements the
needed subset of the public MessagePack spec
(https://github.com/msgpack/msgpack/blob/master/spec.md): nil, bool,
all int/uint widths, float32/64, str, bin, array, map.  ``packb``
exists so tests (and the compat client) can produce byte-identical
payloads to the reference client; ``unpackb`` is what the server
route uses.  Ext types are not needed by the wire shape and raise.

If a real ``msgpack`` wheel is importable it is preferred by callers
(see service/server.py) — this is the fallback, not a fork.
"""

from __future__ import annotations

import struct
from typing import Any


class MsgpackError(ValueError):
    pass


# ----------------------------------------------------------------------
# encode
# ----------------------------------------------------------------------
def packb(obj: Any) -> bytes:
    out = bytearray()
    try:
        _pack(obj, out)
    except struct.error as ex:
        # length/width overflow (str/bin/array >= 2**32, int past
        # uint64) — same consistent MsgpackError contract as decode
        raise MsgpackError(f"value too large to encode: {ex}") from ex
    return bytes(out)


def _pack(obj: Any, out: bytearray) -> None:
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
        elif n < 2**8:
            out += struct.pack(">BB", 0xD9, n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n < 2**8:
            out += struct.pack(">BB", 0xC4, n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for item in obj:
            _pack(item, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        # numpy scalars and the like: try the numeric protocols
        try:
            import numbers

            if isinstance(obj, numbers.Integral):
                _pack_int(int(obj), out)
                return
            if isinstance(obj, numbers.Real):
                out.append(0xCB)
                out += struct.pack(">d", float(obj))
                return
        except Exception:
            pass
        raise MsgpackError(f"cannot pack type {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 0x80:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 2**8:
        out += struct.pack(">BB", 0xCC, v)
    elif 0 <= v < 2**16:
        out += struct.pack(">BH", 0xCD, v)
    elif 0 <= v < 2**32:
        out += struct.pack(">BI", 0xCE, v)
    elif 0 <= v < 2**64:
        out += struct.pack(">BQ", 0xCF, v)
    elif -(2**7) <= v < 0:
        out += struct.pack(">Bb", 0xD0, v)
    elif -(2**15) <= v < 0:
        out += struct.pack(">Bh", 0xD1, v)
    elif -(2**31) <= v < 0:
        out += struct.pack(">Bi", 0xD2, v)
    elif -(2**63) <= v < 0:
        out += struct.pack(">Bq", 0xD3, v)
    else:
        raise MsgpackError(f"int out of 64-bit range: {v}")


# ----------------------------------------------------------------------
# decode
# ----------------------------------------------------------------------
def unpackb(data: bytes) -> Any:
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise MsgpackError(f"trailing bytes after msgpack object ({len(data) - pos})")
    return obj


def _scalar(fmt: str, size: int, mv: memoryview, pos: int):
    """unpack_from with an explicit bounds check: truncated untrusted
    input raises MsgpackError (never a bare struct.error / short slice),
    so the /influx_binary route reports a consistent 400."""
    if pos + size > len(mv):
        raise MsgpackError("truncated msgpack data")
    return struct.unpack_from(fmt, mv, pos)[0]


def _unpack(mv: memoryview, pos: int) -> tuple[Any, int]:
    if pos >= len(mv):
        raise MsgpackError("truncated msgpack data")
    b = mv[pos]
    pos += 1
    if b < 0x80:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(mv, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_array(mv, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        return _unpack_str(mv, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        n = _scalar(">B", 1, mv, pos)
        return _unpack_bin(mv, pos + 1, n)
    if b == 0xC5:
        n = _scalar(">H", 2, mv, pos)
        return _unpack_bin(mv, pos + 2, n)
    if b == 0xC6:
        n = _scalar(">I", 4, mv, pos)
        return _unpack_bin(mv, pos + 4, n)
    if b == 0xCA:
        return _scalar(">f", 4, mv, pos), pos + 4
    if b == 0xCB:
        return _scalar(">d", 8, mv, pos), pos + 8
    if b == 0xCC:
        return _scalar(">B", 1, mv, pos), pos + 1
    if b == 0xCD:
        return _scalar(">H", 2, mv, pos), pos + 2
    if b == 0xCE:
        return _scalar(">I", 4, mv, pos), pos + 4
    if b == 0xCF:
        return _scalar(">Q", 8, mv, pos), pos + 8
    if b == 0xD0:
        return _scalar(">b", 1, mv, pos), pos + 1
    if b == 0xD1:
        return _scalar(">h", 2, mv, pos), pos + 2
    if b == 0xD2:
        return _scalar(">i", 4, mv, pos), pos + 4
    if b == 0xD3:
        return _scalar(">q", 8, mv, pos), pos + 8
    if b == 0xD9:
        n = _scalar(">B", 1, mv, pos)
        return _unpack_str(mv, pos + 1, n)
    if b == 0xDA:
        n = _scalar(">H", 2, mv, pos)
        return _unpack_str(mv, pos + 2, n)
    if b == 0xDB:
        n = _scalar(">I", 4, mv, pos)
        return _unpack_str(mv, pos + 4, n)
    if b == 0xDC:
        n = _scalar(">H", 2, mv, pos)
        return _unpack_array(mv, pos + 2, n)
    if b == 0xDD:
        n = _scalar(">I", 4, mv, pos)
        return _unpack_array(mv, pos + 4, n)
    if b == 0xDE:
        n = _scalar(">H", 2, mv, pos)
        return _unpack_map(mv, pos + 2, n)
    if b == 0xDF:
        n = _scalar(">I", 4, mv, pos)
        return _unpack_map(mv, pos + 4, n)
    raise MsgpackError(f"unsupported msgpack type byte 0x{b:02x}")


def _unpack_str(mv: memoryview, pos: int, n: int) -> tuple[str, int]:
    if pos + n > len(mv):
        raise MsgpackError("truncated string")
    try:
        return bytes(mv[pos : pos + n]).decode("utf-8"), pos + n
    except UnicodeDecodeError as ex:
        # keep the consistent-error contract: every decode failure is
        # a MsgpackError callers can map to a 400
        raise MsgpackError(f"invalid utf-8 in str: {ex}") from ex


def _unpack_bin(mv: memoryview, pos: int, n: int) -> tuple[bytes, int]:
    if pos + n > len(mv):
        raise MsgpackError("truncated binary")
    return bytes(mv[pos : pos + n]), pos + n


def _unpack_array(mv: memoryview, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        item, pos = _unpack(mv, pos)
        out.append(item)
    return out, pos


def _unpack_map(mv: memoryview, pos: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _unpack(mv, pos)
        v, pos = _unpack(mv, pos)
        try:
            out[k] = v
        except TypeError as ex:  # unhashable key (array/map) — same contract
            raise MsgpackError(f"unhashable map key of type {type(k).__name__}") from ex
    return out, pos
