"""CLP key-value pair (structured) IR stream — pure-Python serde.

The kv-pair IR format is the reference's CURRENT serializer — what modern
logging libraries emit and what `clp_s` searches directly
(clp_s/kv_ir_search.cpp). Re-expressed from:

  - protocol bytes ................... clp/ffi/ir_stream/protocol_constants.hpp
                                       (Payload 0x41..0x76, VERSION "0.1.0")
  - preamble / metadata .............. clp/ffi/ir_stream/Serializer.cpp:524-567
  - schema-tree node insertion ....... Serializer.cpp:750-793 (type tag,
                                       parent id, key name), two trees
                                       (auto-gen keys vs user-gen keys)
  - node-id encoding ................. clp/ffi/ir_stream/utils.hpp:198-271
                                       (width by id; auto-gen ids are the
                                       ONE'S COMPLEMENT -> negative on wire)
  - log-event layout ................. Serializer.cpp:577-748: new schema
                                       nodes first, then [auto-gen id+value
                                       pairs...], then user-gen key ids, then
                                       user-gen values in key order; an empty
                                       user map is a single ValueEmpty
  - value encodings .................. Serializer.cpp:280-391 (sized ints,
                                       bit-cast double, bool/null/empty;
                                       strings WITHOUT spaces are plain,
                                       strings WITH spaces + all arrays are
                                       CLP-encoded text ASTs)
  - deserialization .................. ir_unit_deserialization_methods.cpp
  - schema tree semantics ............ clp/ffi/SchemaTree.hpp (root id 0,
                                       insertion-order ids, (parent, key,
                                       type) identity)

Wire-format constants ARE the spec; behavior is matched against the
reference's tests (test-ir_encoding_methods.cpp kv_pair_log_events_serde).
No code is copied. All integers are big-endian.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

from clpspark.ref import encoder as E
from clpspark.ref import ir_format as IR

# -- protocol constants (protocol_constants.hpp Payload) ----------------------

KV_VERSION = "0.1.0"
VARIABLES_SCHEMA_ID = "com.yscope.clp.VariablesSchemaV2"
VARIABLE_ENCODING_METHODS_ID = "com.yscope.clp.VariableEncodingMethodsV1"
USER_DEFINED_METADATA_KEY = "USER_DEFINED_METADATA"

_STR_LEN_UBYTE = 0x41
_STR_LEN_USHORT = 0x42
_STR_LEN_UINT = 0x43

_VALUE_INT8 = 0x51
_VALUE_INT16 = 0x52
_VALUE_INT32 = 0x53
_VALUE_INT64 = 0x54
_VALUE_FLOAT = 0x56
_VALUE_TRUE = 0x57
_VALUE_FALSE = 0x58
_VALUE_FOUR_BYTE_CLP_STR = 0x59
_VALUE_EIGHT_BYTE_CLP_STR = 0x5A
_VALUE_EMPTY = 0x5E
_VALUE_NULL = 0x5F

_PARENT_ID_BYTE = 0x60
_PARENT_ID_SHORT = 0x61
_PARENT_ID_INT = 0x62
_NODE_ID_BYTE = 0x65
_NODE_ID_SHORT = 0x66
_NODE_ID_INT = 0x67

SCHEMA_TREE_NODE_MASK = 0x70
_NODE_INT = 0x71
_NODE_FLOAT = 0x72
_NODE_BOOL = 0x73
_NODE_STR = 0x74
_NODE_ARRAY = 0x75
_NODE_OBJ = 0x76

_UTC_OFFSET_CHANGE = 0x3F
_EOF = 0x00

ROOT_ID = 0  # SchemaTree.hpp cRootId

_NODE_TAG_BY_TYPE = {
    "int": _NODE_INT,
    "float": _NODE_FLOAT,
    "bool": _NODE_BOOL,
    "str": _NODE_STR,
    "array": _NODE_ARRAY,
    "obj": _NODE_OBJ,
}
_NODE_TYPE_BY_TAG = {v: k for k, v in _NODE_TAG_BY_TYPE.items()}


class KvIrFormatError(ValueError):
    pass


# -- schema tree ---------------------------------------------------------------


class SchemaTree:
    """(parent_id, key, type)-identified nodes; insertion-order dense ids with
    the implicit Obj root at id 0 (SchemaTree.hpp:237-294)."""

    def __init__(self) -> None:
        # id -> (parent_id, key, type); root omitted
        self.nodes: dict[int, tuple[int, str, str]] = {}
        self._lookup: dict[tuple[int, str, str], int] = {}

    def get(self, parent_id: int, key: str, node_type: str) -> int | None:
        return self._lookup.get((parent_id, key, node_type))

    def insert(self, parent_id: int, key: str, node_type: str) -> int:
        node_id = len(self.nodes) + 1  # root occupies id 0
        self.nodes[node_id] = (parent_id, key, node_type)
        self._lookup[(parent_id, key, node_type)] = node_id
        return node_id

    def path(self, node_id: int) -> list[str]:
        keys: list[str] = []
        while node_id != ROOT_ID:
            parent_id, key, _ = self.nodes[node_id]
            keys.append(key)
            node_id = parent_id
        keys.reverse()
        return keys

    def node_type(self, node_id: int) -> str:
        return self.nodes[node_id][2]


def _value_node_type(val) -> str:
    """Python value -> schema-tree node type (the msgpack mapping,
    Serializer.cpp:249-278; None and nested maps are both Obj)."""
    if isinstance(val, bool):  # bool before int: Python bool is an int
        return "bool"
    if isinstance(val, int):
        return "int"
    if isinstance(val, float):
        return "float"
    if isinstance(val, str):
        return "str"
    if val is None or isinstance(val, dict):
        return "obj"
    if isinstance(val, (list, tuple)):
        return "array"
    raise KvIrFormatError(f"unserializable value type: {type(val).__name__}")


# -- low-level writers -----------------------------------------------------------


def _ser_string(s: str, buf: bytearray) -> None:
    b = s.encode("utf-8")
    if len(b) <= 0xFF:
        buf.append(_STR_LEN_UBYTE)
        buf.append(len(b))
    elif len(b) <= 0xFFFF:
        buf.append(_STR_LEN_USHORT)
        buf += struct.pack(">H", len(b))
    else:
        buf.append(_STR_LEN_UINT)
        buf += struct.pack(">I", len(b))
    buf += b


def _ser_node_id(node_id: int, is_auto: bool, byte_tag: int, buf: bytearray) -> None:
    """Width picked by the id value; auto-gen ids write the one's complement
    of the id cast to that width (utils.hpp:198-234). byte_tag is the
    one-byte tag of the group (parent-id 0x60.. vs key-id 0x65..)."""
    if node_id <= 0x7F:
        tag, fmt = byte_tag, ">b"
    elif node_id <= 0x7FFF:
        tag, fmt = byte_tag + 1, ">h"
    elif node_id <= 0x7FFFFFFF:
        tag, fmt = byte_tag + 2, ">i"
    else:
        raise KvIrFormatError(f"schema tree node id out of range: {node_id}")
    buf.append(tag)
    buf += struct.pack(fmt, -(node_id + 1) if is_auto else node_id)


def _ser_value(val, node_type: str, four_byte: bool, buf: bytearray) -> None:
    if node_type == "int":
        if -(1 << 7) <= val < (1 << 7):
            buf.append(_VALUE_INT8)
            buf += struct.pack(">b", val)
        elif -(1 << 15) <= val < (1 << 15):
            buf.append(_VALUE_INT16)
            buf += struct.pack(">h", val)
        elif -(1 << 31) <= val < (1 << 31):
            buf.append(_VALUE_INT32)
            buf += struct.pack(">i", val)
        elif -(1 << 63) <= val < (1 << 63):
            buf.append(_VALUE_INT64)
            buf += struct.pack(">q", val)
        else:
            raise KvIrFormatError(f"int out of int64 range: {val}")
    elif node_type == "float":
        buf.append(_VALUE_FLOAT)
        buf += struct.pack(">d", val)  # bit-cast double, big-endian
    elif node_type == "bool":
        buf.append(_VALUE_TRUE if val else _VALUE_FALSE)
    elif node_type == "str":
        if " " not in val:
            _ser_string(val, buf)
        else:
            _ser_clp_string(val, four_byte, buf)
    elif node_type == "obj":
        if val is None:
            buf.append(_VALUE_NULL)
        else:  # empty map
            buf.append(_VALUE_EMPTY)
    elif node_type == "array":
        # arrays serialize as CLP-encoded JSON text (Serializer.cpp:323-334)
        _ser_clp_string(json.dumps(val, separators=(",", ":")), four_byte, buf)
    else:
        raise KvIrFormatError(f"unknown node type: {node_type}")


def _ser_clp_string(text: str, four_byte: bool, buf: bytearray) -> None:
    buf.append(_VALUE_FOUR_BYTE_CLP_STR if four_byte else _VALUE_EIGHT_BYTE_CLP_STR)
    IR._encode_message(text, four_byte, buf)  # vars then logtype, no timestamp


# -- serializer -------------------------------------------------------------------


class KvIrSerializer:
    """Streaming kv-pair IR serializer (Serializer.hpp:34-124 shape): create
    writes the preamble; serialize_event appends one log-event unit (schema
    tree inserts included); the caller terminates with `eof()`."""

    def __init__(self, four_byte: bool = True,
                 user_defined_metadata: dict | None = None) -> None:
        self.four_byte = four_byte
        self.auto_tree = SchemaTree()
        self.user_tree = SchemaTree()
        self._buf = bytearray(
            IR.MAGIC_FOUR_BYTE if four_byte else IR.MAGIC_EIGHT_BYTE
        )
        meta = {
            IR.VERSION_KEY: KV_VERSION,
            "VARIABLES_SCHEMA_ID": VARIABLES_SCHEMA_ID,
            "VARIABLE_ENCODING_METHODS_ID": VARIABLE_ENCODING_METHODS_ID,
        }
        if user_defined_metadata is not None:
            if not isinstance(user_defined_metadata, dict):
                raise KvIrFormatError("user-defined metadata must be an object")
            meta[USER_DEFINED_METADATA_KEY] = user_defined_metadata
        IR._serialize_metadata(meta, self._buf)

    def change_utc_offset(self, utc_offset_ms: int) -> None:
        self._buf.append(_UTC_OFFSET_CHANGE)
        self._buf += struct.pack(">q", utc_offset_ms)

    def _ser_map_dfs(self, obj: dict, tree: SchemaTree, is_auto: bool,
                     node_buf: bytearray, id_buf: bytearray,
                     val_buf: bytearray) -> None:
        """DFS over one event map (Serializer.cpp:439-521): new schema nodes
        -> node_buf; key ids -> id_buf; values -> val_buf (for auto-gen maps
        the caller passes the same buffer for ids and values, interleaving)."""
        stack: list[tuple[int, list]] = [(ROOT_ID, list(obj.items()))]
        while stack:
            parent_id, items = stack[-1]
            if not items:
                stack.pop()
                continue
            key, val = items.pop(0)
            if not isinstance(key, str):
                raise KvIrFormatError("map keys must be strings")
            node_type = _value_node_type(val)
            node_id = tree.get(parent_id, key, node_type)
            if node_id is None:
                node_id = tree.insert(parent_id, key, node_type)
                node_buf.append(_NODE_TAG_BY_TYPE[node_type])
                _ser_node_id(parent_id, is_auto, _PARENT_ID_BYTE, node_buf)
                _ser_string(key, node_buf)
            if isinstance(val, dict) and val:
                stack.append((node_id, list(val.items())))
                continue
            _ser_node_id(node_id, is_auto, _NODE_ID_BYTE, id_buf)
            _ser_value(val, node_type, self.four_byte, val_buf)

    def serialize_event(self, auto_gen: dict | None, user_gen: dict) -> None:
        node_buf = bytearray()
        seq_buf = bytearray()
        user_val_buf = bytearray()
        if auto_gen:
            # auto-gen pairs interleave id+value in the sequential buffer
            self._ser_map_dfs(auto_gen, self.auto_tree, True,
                              node_buf, seq_buf, seq_buf)
        if not user_gen:
            seq_buf.append(_VALUE_EMPTY)
        else:
            self._ser_map_dfs(user_gen, self.user_tree, False,
                              node_buf, seq_buf, user_val_buf)
        self._buf += node_buf
        self._buf += seq_buf
        self._buf += user_val_buf

    def eof(self) -> None:
        self._buf.append(_EOF)

    def take(self) -> bytes:
        out = bytes(self._buf)
        self._buf = bytearray()
        return out


def serialize_kv_ir_stream(
    events: list[tuple[dict | None, dict]],
    four_byte: bool = True,
    user_defined_metadata: dict | None = None,
    utc_offset_ms: int | None = None,
) -> bytes:
    """Full stream: preamble + (auto_gen, user_gen) events + EOF."""
    ser = KvIrSerializer(four_byte, user_defined_metadata)
    if utc_offset_ms is not None:
        ser.change_utc_offset(utc_offset_ms)
    for auto_gen, user_gen in events:
        ser.serialize_event(auto_gen, user_gen)
    ser.eof()
    return ser.take()


# -- deserializer ------------------------------------------------------------------


@dataclass
class KvLogEvent:
    auto_gen: dict = field(default_factory=dict)
    user_gen: dict = field(default_factory=dict)
    utc_offset_ms: int = 0


@dataclass
class KvIrStream:
    four_byte: bool
    metadata: dict
    events: list[KvLogEvent]


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos

    def tag(self) -> int:
        t = self.buf[self.pos]
        self.pos += 1
        return t

    def unpack(self, fmt: str, width: int):
        v = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += width
        return v

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b


def _de_string(r: _Reader, tag: int) -> str:
    if tag == _STR_LEN_UBYTE:
        n = r.unpack(">B", 1)
    elif tag == _STR_LEN_USHORT:
        n = r.unpack(">H", 2)
    elif tag == _STR_LEN_UINT:
        n = r.unpack(">I", 4)
    else:
        raise KvIrFormatError(f"bad string tag 0x{tag:02x}")
    return r.read(n).decode("utf-8")


def _de_node_id(r: _Reader, tag: int, byte_tag: int) -> tuple[bool, int]:
    """-> (is_auto_generated, node_id); negative wire value = auto tree."""
    if tag == byte_tag:
        v = r.unpack(">b", 1)
    elif tag == byte_tag + 1:
        v = r.unpack(">h", 2)
    elif tag == byte_tag + 2:
        v = r.unpack(">i", 4)
    else:
        raise KvIrFormatError(f"bad node-id tag 0x{tag:02x}")
    if v < 0:
        return True, -(v + 1)  # one's complement
    return False, v


def _de_clp_string(r: _Reader, four_byte: bool) -> str:
    """Parse a CLP-encoded text AST (vars then logtype) and decode it back to
    text via the shared legacy-IR decode path."""
    raw_vars: list[tuple[str, int | str]] = []
    while True:
        tag = r.tag()
        if tag == IR._VAR_FOUR_BYTE:
            raw_vars.append(("e", r.unpack(">i", 4)))
        elif tag == IR._VAR_EIGHT_BYTE:
            raw_vars.append(("e", r.unpack(">q", 8)))
        elif tag == IR._VAR_STR_LEN_UBYTE:
            raw_vars.append(("d", r.read(r.unpack(">B", 1)).decode("utf-8")))
        elif tag == IR._VAR_STR_LEN_USHORT:
            raw_vars.append(("d", r.read(r.unpack(">H", 2)).decode("utf-8")))
        elif tag == IR._VAR_STR_LEN_INT:
            raw_vars.append(("d", r.read(r.unpack(">i", 4)).decode("utf-8")))
        elif tag == IR._LOGTYPE_LEN_UBYTE:
            logtype = r.read(r.unpack(">B", 1)).decode("utf-8")
            break
        elif tag == IR._LOGTYPE_LEN_USHORT:
            logtype = r.read(r.unpack(">H", 2)).decode("utf-8")
            break
        elif tag == IR._LOGTYPE_LEN_INT:
            logtype = r.read(r.unpack(">i", 4)).decode("utf-8")
            break
        else:
            raise KvIrFormatError(f"bad text-AST tag 0x{tag:02x}")
    ev = IR.IrLogEvent(0, logtype, raw_vars)
    return IR.decode_event_message(ev, four_byte)


def _de_value(r: _Reader, tag: int, node_type: str, four_byte: bool):
    if tag == _VALUE_INT8:
        return r.unpack(">b", 1)
    if tag == _VALUE_INT16:
        return r.unpack(">h", 2)
    if tag == _VALUE_INT32:
        return r.unpack(">i", 4)
    if tag == _VALUE_INT64:
        return r.unpack(">q", 8)
    if tag == _VALUE_FLOAT:
        return r.unpack(">d", 8)
    if tag == _VALUE_TRUE:
        return True
    if tag == _VALUE_FALSE:
        return False
    if tag in (_STR_LEN_UBYTE, _STR_LEN_USHORT, _STR_LEN_UINT):
        return _de_string(r, tag)
    if tag in (_VALUE_FOUR_BYTE_CLP_STR, _VALUE_EIGHT_BYTE_CLP_STR):
        text = _de_clp_string(r, tag == _VALUE_FOUR_BYTE_CLP_STR)
        # arrays travel as CLP-encoded JSON text (Serializer.cpp:323-334)
        return json.loads(text) if node_type == "array" else text
    if tag == _VALUE_NULL:
        return None
    if tag == _VALUE_EMPTY:
        return {}
    raise KvIrFormatError(f"bad value tag 0x{tag:02x}")


def _insert_path(root: dict, keys: list[str], value) -> None:
    cur = root
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def _is_key_id_tag(tag: int) -> bool:
    return tag in (_NODE_ID_BYTE, _NODE_ID_SHORT, _NODE_ID_INT)


def deserialize_kv_ir_stream(buf: bytes) -> KvIrStream:
    """Parse a complete kv-pair IR stream (magic + metadata + units + EOF)
    back into Python objects (the serialize_to_json analog:
    KeyValuePairLogEvent + ir_unit_deserialization_methods.cpp)."""
    magic = buf[:4]
    if magic == IR.MAGIC_FOUR_BYTE:
        four_byte = True
    elif magic == IR.MAGIC_EIGHT_BYTE:
        four_byte = False
    else:
        raise KvIrFormatError(f"bad magic {magic!r}")
    r = _Reader(buf, 4)
    if r.tag() != IR._META_ENCODING_JSON:
        raise KvIrFormatError("expected JSON metadata")
    mtag = r.tag()
    if mtag == IR._META_LEN_UBYTE:
        mlen = r.unpack(">B", 1)
    elif mtag == IR._META_LEN_USHORT:
        mlen = r.unpack(">H", 2)
    else:
        raise KvIrFormatError("bad metadata length tag")
    metadata = json.loads(r.read(mlen).decode("utf-8"))
    version = str(metadata.get(IR.VERSION_KEY, ""))
    if version.startswith("0.0."):
        raise KvIrFormatError(
            "legacy unstructured IR stream; use ir_format.deserialize_ir_stream"
        )

    auto_tree = SchemaTree()
    user_tree = SchemaTree()
    events: list[KvLogEvent] = []
    utc_offset = 0
    n = len(buf)
    while r.pos < n:
        tag = r.tag()
        if tag == _EOF:
            break
        if tag == _UTC_OFFSET_CHANGE:
            utc_offset = r.unpack(">q", 8)
            continue
        if (tag & SCHEMA_TREE_NODE_MASK) == SCHEMA_TREE_NODE_MASK:
            node_type = _NODE_TYPE_BY_TAG.get(tag)
            if node_type is None:
                raise KvIrFormatError(f"bad schema-node tag 0x{tag:02x}")
            is_auto, parent_id = _de_node_id(r, r.tag(), _PARENT_ID_BYTE)
            key = _de_string(r, r.tag())
            (auto_tree if is_auto else user_tree).insert(parent_id, key,
                                                         node_type)
            continue
        # log event: auto-gen (id, value) pairs, then user-gen ids, then values
        ev = KvLogEvent(utc_offset_ms=utc_offset)
        user_schema: list[int] = []
        if tag == _VALUE_EMPTY and not _is_key_id_tag(tag):
            events.append(ev)  # {} event: both maps empty
            continue
        while _is_key_id_tag(tag):
            is_auto, node_id = _de_node_id(r, tag, _NODE_ID_BYTE)
            tag = r.tag()
            if not is_auto:
                user_schema.append(node_id)
                break
            val = _de_value(r, tag, auto_tree.node_type(node_id), four_byte)
            _insert_path(ev.auto_gen, auto_tree.path(node_id), val)
            tag = r.tag()
        while _is_key_id_tag(tag):
            is_auto, node_id = _de_node_id(r, tag, _NODE_ID_BYTE)
            if is_auto:
                raise KvIrFormatError("auto-gen key id after user-gen key id")
            user_schema.append(node_id)
            tag = r.tag()
        if not user_schema:
            if tag != _VALUE_EMPTY:
                raise KvIrFormatError("empty user map must be ValueEmpty")
        else:
            for i, node_id in enumerate(user_schema):
                if i > 0:
                    tag = r.tag()
                val = _de_value(r, tag, user_tree.node_type(node_id), four_byte)
                _insert_path(ev.user_gen, user_tree.path(node_id), val)
        events.append(ev)
    return KvIrStream(four_byte=four_byte, metadata=metadata, events=events)
