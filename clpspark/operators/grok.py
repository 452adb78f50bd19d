"""Schema-based (user-defined) tokenizer — the log-surgeon parse path.

The reference supports user-provided schema files declaring custom variable
regexes, delimiters, and a timestamp pattern (consumed via log-surgeon in
clp/clp/FileCompressor.cpp:162-196; fixtures in
tests/test_schema_files/easy_schema.txt):

    // Delimiters
    delimiters: \\t\\r\\n:,!;%
    // Keywords
    timestamp:\\d{4}\\-\\d{2}\\-\\d{2} \\d{2}:\\d{2}:\\d{2}
    int:\\-{0,1}[0-9]+
    double:\\-{0,1}[0-9]+\\.[0-9]+
    hex:[a-fA-F]+
    equals:.*=.*[a-zA-Z0-9].*

Spark-first re-creation: a ParseSchema config compiles the variable rules
into one alternation regex (rule priority = declaration order, as in
log-surgeon's DFA which prefers earlier schema rules). The parse stage is the
same Arrow-batched pass as the heuristic tokenizer, emitting the same parsed
schema — variables named by their rule, with int/double rules encoded via the
CLP encoding when representable so all downstream stages (enrich/route/
search) work unchanged.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from clpspark.ref import encoder as ref_encoder

GROK_PARSED_SCHEMA = (
    "doc_id string, source string, ts bigint, logtype string, "
    "encoded_vars array<bigint>, dict_vars array<string>, "
    "dict_slots array<int>, var_rules array<string>"
)


@dataclass
class ParseSchema:
    """User-defined variable schema (easy_schema.txt shape)."""

    rules: list[tuple[str, str]]  # (name, regex) in priority order
    timestamp: str | None = None  # timestamp regex (stripped, epoch not parsed
    #                               unless ``timestamp_format`` given)
    timestamp_format: str | None = None  # strptime-ish format for epoch ms
    delimiters: str = " \t\r\n:,!;%"

    _tok_rx: re.Pattern = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self._compiled = [(name, re.compile(rx)) for name, rx in self.rules]
        self._tok_rx = re.compile(f"[^{re.escape(self.delimiters)}]+")
        self._ts_rx = re.compile(self.timestamp) if self.timestamp else None

    def classify(self, tok: str) -> str | None:
        """First (priority-ordered) rule that fully matches, else None."""
        for name, crx in self._compiled:
            if crx.fullmatch(tok):
                return name
        return None

    @classmethod
    def from_schema_text(cls, text: str) -> "ParseSchema":
        """Parse the reference's schema-file syntax (name:regex lines)."""
        rules: list[tuple[str, str]] = []
        ts = None
        delims = " \t\r\n:,!;%"
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            name, _, rx = line.partition(":")
            name = name.strip()
            if name == "delimiters":
                # space is always a delimiter; the rest comes from the file
                delims = " " + rx.strip().encode().decode("unicode_escape")
                continue
            rx = rx.strip()
            if name == "timestamp":
                ts = rx
            else:
                rules.append((name, rx))
        return cls(rules=rules, timestamp=ts, delimiters=delims)


def parse_with_schema(msg: str, schema: ParseSchema):
    """(ts_text, logtype, encoded_vars, dict_vars, dict_slots, var_rules)."""
    ts_text = None
    if schema._ts_rx is not None:
        m = schema._ts_rx.search(msg)
        if m is not None:
            ts_text = m.group(0)
            msg = msg[: m.start()] + msg[m.end():]
    parts: list[str] = []
    evars: list[int] = []
    dvars: list[str] = []
    dslots: list[int] = []
    rules: list[str] = []
    last = 0
    # log-surgeon tokenizes between delimiters, then classifies each token
    # against the schema rules in priority order (full match)
    for m in schema._tok_rx.finditer(msg):
        tok = m.group(0)
        name = schema.classify(tok)
        if name is None:
            continue  # constant token -> stays in the logtype
        b, e = m.start(), m.end()
        parts.append(msg[last:b].translate(_ESC_MAP))
        last = e
        rules.append(name)
        iv = ref_encoder.encode_int(tok) if name == "int" else None
        fv = ref_encoder.encode_float(tok) if name == "double" else None
        if iv is not None:
            parts.append("\x11")
            evars.append(iv)
        elif fv is not None:
            parts.append("\x13")
            evars.append(fv)
        else:
            parts.append("\x12")
            dslots.append(len(evars))
            evars.append(0)
            dvars.append(tok)
    parts.append(msg[last:].translate(_ESC_MAP))
    return ts_text, "".join(parts), evars, dvars, dslots, rules


_ESC_MAP = str.maketrans(
    {"\x11": "\\\x11", "\x12": "\\\x12", "\x13": "\\\x13", "\\": "\\\\"}
)


def parse_text_with_schema(
    df: DataFrame,
    schema: ParseSchema,
    msg_col: str = "message",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Schema-driven parse stage (same downstream contract as parse_text)."""
    from clpspark.ref.timestamps import search_known_ts_patterns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, src, msg in zip(pdf[id_col], pdf[source_col], pdf[msg_col]):
                ts_text, lt, ev, dv, ds, rules = parse_with_schema(
                    msg or "", schema
                )
                ts_ms = None
                if ts_text is not None:
                    hit = search_known_ts_patterns(ts_text)
                    if hit is not None:
                        ts_ms = hit[0]
                rows.append((did, src, ts_ms, lt, ev, dv, ds, rules))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "source", "ts", "logtype", "encoded_vars",
                         "dict_vars", "dict_slots", "var_rules"],
            )

    return df.mapInPandas(run, schema=GROK_PARSED_SCHEMA)


# The reference's easy_schema.txt, reusable as a default
EASY_SCHEMA_TEXT = r"""
// Delimiters
delimiters: \t\r\n:,!;%
// Keywords
timestamp:\d{4}\-\d{2}\-\d{2} \d{2}:\d{2}:\d{2}
int:\-{0,1}[0-9]+
double:\-{0,1}[0-9]+\.[0-9]+
hex:[a-fA-F]+
"""
