"""Spark parse stage vs pure-Python oracle: per-row token-array equality."""

from __future__ import annotations

from clpspark.corpus import detokenize
from clpspark.operators.parse import parse_sequences
from clpspark.ref import encoder as E
from clpspark.ref.timestamps import strip_timestamp


def _oracle_row(tokens, vocab):
    line = detokenize(tokens, vocab)
    ts, pat_ix, rest = strip_timestamp(line)
    em = E.encode_message(rest)
    return ts, pat_ix, em


def test_parse_matches_oracle_rowwise(spark, vocab_meta, small_corpus,
                                      small_corpus_pdf):
    df = spark.read.parquet(small_corpus)
    parsed = parse_sequences(df, vocab_meta.vocab)
    got = {r["doc_id"]: r for r in parsed.collect()}
    assert len(got) == len(small_corpus_pdf)

    for _, row in small_corpus_pdf.iterrows():
        ts, pat_ix, em = _oracle_row(row.tokens, vocab_meta.vocab)
        g = got[row.doc_id]
        assert g["ts"] == ts, row.doc_id
        assert g["ts_pattern"] == pat_ix, row.doc_id
        assert g["logtype"] == em.logtype, row.doc_id
        # token-array equality: int/float slots match the bit-exact encoding,
        # dict slots hold the 0 sentinel pre-enrich (+ positions in dict_slots)
        expected_ev = [0 if v is None else v for v in em.encoded_vars]
        expected_slots = [i for i, v in enumerate(em.encoded_vars) if v is None]
        assert list(g["encoded_vars"]) == expected_ev, row.doc_id
        assert list(g["dict_slots"]) == expected_slots, row.doc_id
        assert list(g["dict_vars"]) == em.dict_vars, row.doc_id


def test_parse_decode_roundtrip(spark, vocab_meta, small_corpus):
    """decode(parse(x)) == detokenize(x) for every row (pre-enrich)."""
    df = spark.read.parquet(small_corpus)
    parsed = parse_sequences(df, vocab_meta.vocab).collect()
    seqs = {r["doc_id"]: r["tokens"] for r in df.collect()}
    for r in parsed:
        line = detokenize(seqs[r["doc_id"]], vocab_meta.vocab)
        _, _, rest = strip_timestamp(line)
        ev = [None if i in set(r["dict_slots"]) else v
              for i, v in enumerate(r["encoded_vars"])]
        dec = E.decode_message(r["logtype"], ev, list(r["dict_vars"]))
        assert dec == rest, r["doc_id"]


def test_corpus_is_partitioning_invariant(spark, vocab_meta, tmp_path):
    """Same (seed, row id) -> same row, regardless of generation parallelism."""
    from clpspark.corpus import write_corpus

    p1, p2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    write_corpus(spark, p1, 200, seed=42, partitions=1)
    write_corpus(spark, p2, 200, seed=42, partitions=7)
    a = {r["doc_id"]: (list(r["tokens"]), r["source"])
         for r in spark.read.parquet(p1).collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["source"])
         for r in spark.read.parquet(p2).collect()}
    assert a == b
