"""Pin the template-oracle SQL predicates (__spark_entry__._ic_sql /
_fc_sql / the d-slot rules) against ref/encoder + the tokenizer for EVERY
vocab piece, so the clp_sink_counts / clp_dict_stats DuckDB oracles cannot
silently drift from the pipeline's actual classification. No Spark needed."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod
from clpspark.corpus import TEMPLATES, build_vocab, detokenize, generate_pdf
from clpspark.operators.parse import parse_message
from clpspark.ref.encoder import encode_float, encode_int

META = build_vocab(42)


def _sql_classes(pieces: list[str], expr_fn) -> list[str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE p(v VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?)", [(x,) for x in pieces])
    return [r[0] for r in con.execute(
        f"SELECT {expr_fn('v')} FROM p"
    ).fetchall()]


def test_int_predicate_matches_encoder_for_all_int_and_hex_pieces():
    pieces = [
        META.vocab[META.off_int + i] for i in range(META.n_int)
    ] + [META.vocab[META.off_hex + i] for i in range(META.n_hex)]
    got = _sql_classes(pieces, entrymod._ic_sql)
    want = ["I" if encode_int(p) is not None else "D" for p in pieces]
    assert got == want


def test_float_predicate_matches_encoder_for_all_float_pieces():
    pieces = [META.vocab[META.off_float + i] for i in range(META.n_float)]
    got = _sql_classes(pieces, entrymod._fc_sql)
    want = ["F" if encode_float(p) is not None else "D" for p in pieces]
    assert got == want


def test_dict_pool_slot_rules():
    """Every d-pool piece: digit-less -> 0 vars (logtype literal);
    ':'-containing -> splits into dict + int; else one dict var."""
    cache: dict = {}
    for i in range(META.n_dict):
        p = META.vocab[META.off_dict + i]
        _lt, ev, _dv, ds = parse_message(f" x {p} y", cache)
        if not any(c.isdigit() for c in p):
            assert (len(ev), len(ds)) == (0, 0), p
        elif ":" in p:
            assert (len(ev), len(ds)) == (2, 1), p
        else:
            assert (len(ev), len(ds)) == (1, 1), p


def test_word_and_login_constants_force_dict_vars():
    """Template 5's 'user=<w> action=login' produces exactly two dict vars
    regardless of the word piece (the oracle hard-codes 'D' + 'D')."""
    cache: dict = {}
    for i in range(META.n_word):
        w = META.vocab[META.off_word + i]
        _lt, ev, _dv, ds = parse_message(
            f" INFO user={w} action=login latency 1.5 ms", cache
        )
        assert (len(ev), len(ds)) == (3, 2), w


@pytest.mark.parametrize("chunk", range(4))
def test_per_row_var_counts_match_rules(chunk):
    """End-to-end pin over real corpus rows: the oracle's per-row (nv, nd)
    rules reproduce the tokenizer's actual variable counts for every
    template (includes the ts strip, slot layout, and c13 extra var)."""
    ids = np.arange(chunk * 500, (chunk + 1) * 500)
    pdf = generate_pdf(ids, META, seed=42)
    cache: dict = {}
    for _, row in pdf.iterrows():
        toks = list(row["tokens"])
        tpl_ix = 11 if toks[0] == 26 else _tpl_of(toks[1])
        t = TEMPLATES[tpl_ix]
        nv = nd = 0
        for pos0, item in enumerate(t):
            if isinstance(item, tuple):
                if item[1] == 13:
                    nv += 1
                    nd += 1
                continue
            if item == "t":
                continue
            p = META.vocab[toks[pos0]]
            if item == "i" or item == "h":
                nv += 1
                nd += 0 if encode_int(p) is not None else 1
            elif item == "f":
                nv += 1
                nd += 0 if encode_float(p) is not None else 1
            elif item == "w":
                nv += 1
                nd += 1
            elif item == "d":
                if not any(c.isdigit() for c in p):
                    pass
                elif ":" in p:
                    nv += 2
                    nd += 1
                else:
                    nv += 1
                    nd += 1
        line = detokenize(toks, META.vocab)
        # strip the leading timestamp the pipeline strips
        msg = line[23:] if tpl_ix != 11 else line
        _lt, ev, _dv, ds = parse_message(msg, cache)
        assert (len(ev), len(ds)) == (nv, nd), (tpl_ix, line)


def _tpl_of(second_tok: int) -> int:
    for ix, t in enumerate(TEMPLATES):
        if ix == 11:
            continue
        if t[1][1] == second_tok:
            return ix
    raise AssertionError(second_tok)
