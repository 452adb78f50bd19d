"""Parse stage: pre-tokenized sequences -> CLP-encoded log events.

Spark-first design: one ``mapInPandas`` pass (Arrow-batched; no row-at-a-time
Spark UDFs) that detokenizes each sequence against the broadcast vocabulary,
strips the timestamp (clp/TimestampPattern.cpp semantics), tokenizes per
clp/ir/parsing.cpp:37-88, and encodes variables per
clp/EncodedVariableInterpreter.cpp:24-142 — bit-exact with
``clpspark.ref.encoder`` (tested row-by-row).

Hot-path notes for scale:
  - Token classification is memoized per executor (log tokens repeat heavily;
    this is the same observation CLP's dictionaries exploit), so the
    int/float/dict decision and the bit-exact encoding run once per distinct
    token, not once per occurrence.
  - Dictionary-variable IDs are NOT assigned here: parse emits the dict-var
    strings and leaves nulls in ``encoded_vars``. Deterministic global IDs
    need a global view; the enrich stage fills them (two-phase, like CLP's
    VariableDictionaryWriter split from archive layout).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from clpspark.ref import encoder as ref_encoder
from clpspark.ref.timestamps import strip_timestamp_pos_cached

PARSED_SCHEMA = (
    "doc_id string, source string, n_tok int, ts bigint, ts_pattern int, "
    "ts_pos int, logtype string, encoded_vars array<bigint>, "
    "dict_vars array<string>, dict_slots array<int>"
)

# Dict slots hold 0 until enrich fills the dictionary id. IMPORTANT: they are
# NOT nulls — Arrow->pandas converts list<int64>-with-nulls to float64 and
# silently corrupts int64 payloads beyond 2^53 (packed floats, large ints).
# ``dict_slots`` records which positions the enrich stage must fill.
_DICT_SENTINEL = 0

# Maximal runs of non-delimiter chars (clp/ir/parsing.cpp:20-24).
_TOKEN_RX = re.compile(r"[+\-.0-9A-Za-z\\_]+")
_DIGIT_RX = re.compile(r"[0-9]")

# Escape placeholder bytes / backslash when appending constants to the logtype
# (clp/ir/parsing.inc:12-33).
_ESC_MAP = str.maketrans(
    {"\x11": "\\\x11", "\x12": "\\\x12", "\x13": "\\\x13", "\\": "\\\\"}
)


def _needs_escape(seg: str) -> bool:
    return (
        "\\" in seg or "\x11" in seg or "\x12" in seg or "\x13" in seg
    )

# kind codes for the memoized classifier
_K_INT = 0      # representable int64 -> \x11
_K_FLOAT = 1    # representable packed float -> \x13
_K_DICT = 2     # always a dictionary variable -> \x12
_K_EQ = 3       # variable only when directly preceded by '='
_K_CONST = 4    # never a variable

_MAX_CACHE = 1 << 20


def _classify(tok: str) -> tuple[int, int | None]:
    iv = ref_encoder.encode_int(tok)
    if iv is not None:
        return _K_INT, iv
    fv = ref_encoder.encode_float(tok)
    if fv is not None:
        return _K_FLOAT, fv
    if _DIGIT_RX.search(tok) or ref_encoder.could_be_multi_digit_hex_value(tok):
        return _K_DICT, None
    if any(c.isascii() and c.isalpha() for c in tok):
        return _K_EQ, None
    return _K_CONST, None


def parse_message(
    msg: str, cache: dict[str, tuple[int, int | None]]
) -> tuple[str, list[int], list[str], list[int]]:
    """(logtype, encoded_vars, dict_vars, dict_slots) for one message."""
    parts: list[str] = []
    evars: list[int] = []
    dvars: list[str] = []
    dslots: list[int] = []
    last = 0
    for m in _TOKEN_RX.finditer(msg):
        tok = m.group(0)
        c = cache.get(tok)
        if c is None:
            c = _classify(tok)
            if len(cache) < _MAX_CACHE:
                cache[tok] = c
        kind = c[0]
        if kind == _K_CONST:
            continue
        b = m.start()
        if kind == _K_EQ and (b == 0 or msg[b - 1] != "="):
            continue
        seg = msg[last:b]
        parts.append(seg.translate(_ESC_MAP) if _needs_escape(seg) else seg)
        last = m.end()
        if kind == _K_INT:
            parts.append("\x11")
            evars.append(c[1])
        elif kind == _K_FLOAT:
            parts.append("\x13")
            evars.append(c[1])
        else:
            parts.append("\x12")
            dslots.append(len(evars))
            evars.append(_DICT_SENTINEL)
            dvars.append(tok)
    seg = msg[last:]
    parts.append(seg.translate(_ESC_MAP) if _needs_escape(seg) else seg)
    return "".join(parts), evars, dvars, dslots


def _parse_batch(
    doc_id: pd.Series,
    source: pd.Series,
    n_tok: pd.Series,
    messages: list[str],
    cache: dict,
    ts_cache: dict,
) -> pd.DataFrame:
    n = len(messages)
    ts_out = np.empty(n, dtype=object)
    pat_out = np.empty(n, dtype=np.int32)
    pos_out = np.empty(n, dtype=np.int32)
    lt_out: list[str] = []
    ev_out: list[list[int]] = []
    dv_out: list[list[str]] = []
    ds_out: list[list[int]] = []
    for i, msg in enumerate(messages):
        ts, pat_ix, pos, rest = strip_timestamp_pos_cached(msg, ts_cache)
        ts_out[i] = ts
        pat_out[i] = pat_ix
        pos_out[i] = pos
        lt, ev, dv, ds = parse_message(rest, cache)
        lt_out.append(lt)
        ev_out.append(ev)
        dv_out.append(dv)
        ds_out.append(ds)
    return pd.DataFrame(
        {
            "doc_id": doc_id.to_numpy(),
            "source": source.to_numpy(),
            "n_tok": n_tok.to_numpy(),
            "ts": ts_out,
            "ts_pattern": pat_out,
            "ts_pos": pos_out,
            "logtype": lt_out,
            "encoded_vars": ev_out,
            "dict_vars": dv_out,
            "dict_slots": ds_out,
        }
    )


def parse_sequences(df: DataFrame, vocab: list[str]) -> DataFrame:
    """sequences(doc_id, tokens, n_tok, source) -> parsed events.

    Implemented with ``mapInArrow``: the untouched columns (doc_id, source,
    n_tok) pass through as raw Arrow buffers (zero conversion), the tokens
    list-array is detokenized via its flat values+offsets buffers, and the
    outputs are built as Arrow arrays directly — the pandas round trip costs
    ~2x the parse itself for this schema. The vocabulary rides in the task
    closure (small by construction — it's a token vocabulary, not data).
    """
    import pyarrow as pa

    vocab_arr = np.asarray(vocab, dtype=object)
    out_fields = pa.schema(
        [
            ("doc_id", pa.string()),
            ("source", pa.string()),
            ("n_tok", pa.int32()),
            ("ts", pa.int64()),
            ("ts_pattern", pa.int32()),
            ("ts_pos", pa.int32()),
            ("logtype", pa.string()),
            ("encoded_vars", pa.list_(pa.int64())),
            ("dict_vars", pa.list_(pa.string())),
            ("dict_slots", pa.list_(pa.int32())),
        ]
    )

    def run(batches):
        cache: dict[str, tuple[int, int | None]] = {}
        ts_cache: dict = {}
        join = "".join
        for batch in batches:
            cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
            tok = cols["tokens"]
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            flat = tok.values.to_numpy(zero_copy_only=False)
            offs = tok.offsets.to_numpy(zero_copy_only=False)
            pieces = vocab_arr[flat]
            n = len(tok)
            ts_out: list[int | None] = []
            pat_out = np.empty(n, dtype=np.int32)
            pos_out = np.empty(n, dtype=np.int32)
            lt_out: list[str] = []
            ev_out: list[list[int]] = []
            dv_out: list[list[str]] = []
            ds_out: list[list[int]] = []
            for i in range(n):
                msg = join(pieces[offs[i]:offs[i + 1]].tolist())
                ts, pat_ix, pos, rest = strip_timestamp_pos_cached(msg, ts_cache)
                ts_out.append(ts)
                pat_out[i] = pat_ix
                pos_out[i] = pos
                lt, ev, dv, ds = parse_message(rest, cache)
                lt_out.append(lt)
                ev_out.append(ev)
                dv_out.append(dv)
                ds_out.append(ds)
            yield pa.RecordBatch.from_arrays(
                [
                    cols["doc_id"],
                    cols["source"],
                    cols["n_tok"],
                    pa.array(ts_out, type=pa.int64()),
                    pa.array(pat_out, type=pa.int32()),
                    pa.array(pos_out, type=pa.int32()),
                    pa.array(lt_out, type=pa.string()),
                    pa.array(ev_out, type=pa.list_(pa.int64())),
                    pa.array(dv_out, type=pa.list_(pa.string())),
                    pa.array(ds_out, type=pa.list_(pa.int32())),
                ],
                schema=out_fields,
            )

    return df.mapInArrow(run, schema=PARSED_SCHEMA)


def parse_text(df: DataFrame, msg_col: str = "message",
               id_col: str = "doc_id", source_col: str = "source") -> DataFrame:
    """Same parse stage over a plain string column (generic log ingestion)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[int, int | None]] = {}
        ts_cache: dict = {}
        for pdf in batches:
            msgs = pdf[msg_col].tolist()
            n_tok = pd.Series(np.zeros(len(pdf), dtype=np.int32))
            yield _parse_batch(pdf[id_col], pdf[source_col], n_tok, msgs,
                               cache, ts_cache)

    return df.mapInPandas(run, schema=PARSED_SCHEMA)
