"""Property tests for the curation operators (the driver oracles check
value-equality vs DuckDB; these pin the semantic invariants directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clpspark.operators.curate import (
    decontaminate,
    dedup_lines,
    pack_sequences,
    sample_fraction,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def _grams(text: str, n: int) -> set[str]:
    w = text.split()
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def test_decontaminate_exact(spark, docs):
    bench = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)
    got = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in decontaminate(train, bench, n=8).collect()
    }
    bench_grams = set()
    for r in bench.collect():
        bench_grams |= _grams(r["text"], 8)
    want = {}
    for r in train.collect():
        k = len(_grams(r["text"], 8) & bench_grams)
        if k:
            want[r["doc_id"]] = k
    assert got == want and want  # non-trivial: the corpus has near-dups


def test_dedup_lines_keeps_first_only(spark):
    rows = [
        (1, "dup\nunique-a\ndup"),
        (2, "dup\nunique-b"),
        (3, "rare\nrare"),  # 2 occurrences, max_occurrences=2 -> untouched
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(df, max_occurrences=2).collect()
    }
    # 'dup' occurs 3x -> only the (doc 1, pos 0) instance survives
    assert got == {
        1: "dup\nunique-a",
        2: "unique-b",
        3: "rare\nrare",
    }


def test_dedup_lines_drops_fully_deduped_doc(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], "doc_id int, text string"
    )
    got = dedup_lines(df).collect()
    assert [(r["doc_id"], r["text"]) for r in got] == [(1, "x")]


def test_pack_sequences_invariants(spark, docs):
    budget = 512
    packs = pack_sequences(docs, budget=budget).collect()
    # (1) every doc's contributions sum to its token count
    per_doc: dict[int, int] = {}
    n_tok: dict[int, int] = {}
    per_pack: dict[tuple, int] = {}
    for r in packs:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["pack_tokens"]
        n_tok[r["doc_id"]] = r["n_tokens"]
        key = (r["source"], r["pack_id"])
        per_pack[key] = per_pack.get(key, 0) + r["pack_tokens"]
    assert per_doc == n_tok
    # (2) every pack holds exactly `budget` tokens except each shard's last
    last = {}
    for (src, pid) in per_pack:
        last[src] = max(last.get(src, -1), pid)
    for (src, pid), tot in per_pack.items():
        if pid == last[src]:
            assert 0 < tot <= budget
        else:
            assert tot == budget, (src, pid, tot)
    # (3) pack ids are dense per shard
    by_src: dict[str, set] = {}
    for (src, pid) in per_pack:
        by_src.setdefault(src, set()).add(pid)
    for src, pids in by_src.items():
        assert pids == set(range(last[src] + 1))


def test_sample_fraction_deterministic_across_parallelism(spark, docs):
    a = {r["doc_id"] for r in sample_fraction(docs, 0.3).collect()}
    b = {
        r["doc_id"]
        for r in sample_fraction(docs.repartition(13), 0.3).collect()
    }
    assert a == b and 0 < len(a) < 500


def test_dedup_spans_vs_python_replay(spark):
    """Lee et al. exact-substring dedup: cross-doc shared span removed
    from the later doc only, internal repetition collapses, clean docs
    untouched — replicated against a pure-python replay."""
    from collections import defaultdict

    from clpspark.operators.curate import dedup_spans

    shared = "one two three four five"
    rows = [
        (1, f"intro words here {shared} tail a"),
        (2, f"{shared} and unique content follows"),
        (3, "totally different text with no duplicate spans at all"),
        (4, "x " * 12),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
           for r in dedup_spans(df, k=5).collect()}

    k = 5
    groups: dict[tuple, list] = defaultdict(list)
    for did, t in rows:
        ws = t.split()
        for p in range(len(ws) - k + 1):
            groups[tuple(ws[p:p + k])].append((did, p))
    cov: dict[int, set] = defaultdict(set)
    for lst in groups.values():
        if len(lst) >= 2:
            for d, p in sorted(lst)[1:]:
                cov[d].update(range(p, p + k))
    for did, t in rows:
        ws = t.split()
        keptw = [w for i, w in enumerate(ws) if i not in cov[did]]
        assert out[did] == (" ".join(keptw), len(ws), len(ws) - len(keptw))

    # spot semantics: doc 1 holds the first occurrence (kept), doc 2
    # loses the shared span; 12x'x' collapses to the single uncovered word
    assert shared in out[1][0] and shared not in out[2][0]
    assert out[4] == ("x", 12, 11)


@pytest.mark.parametrize("seed", [11, 42, 99])
def test_dedup_spans_randomized_replay(spark, seed):
    """Randomized corpora over a tiny vocabulary (forces heavy window
    collisions, overlaps, and within-doc repeats) must match the pure
    python replay exactly."""
    import random
    from collections import defaultdict

    from clpspark.operators.curate import dedup_spans

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d"]
    k = 4
    rows = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(0, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
           for r in dedup_spans(df, k=k).collect()}

    groups: dict[tuple, list] = defaultdict(list)
    for did, t in rows:
        ws = t.split()
        for p in range(len(ws) - k + 1):
            groups[tuple(ws[p:p + k])].append((did, p))
    cov: dict[int, set] = defaultdict(set)
    for lst in groups.values():
        if len(lst) >= 2:
            for d, p in sorted(lst)[1:]:
                cov[d].update(range(p, p + k))
    for did, t in rows:
        ws = t.split()
        keptw = [w for i, w in enumerate(ws) if i not in cov[did]]
        assert out[did] == (" ".join(keptw), len(ws), len(ws) - len(keptw)), did


def test_select_token_budget_greedy_prefix(spark):
    """Strict greedy prefix: best quality first, a doc that overshoots
    the budget ends the selection — a later smaller doc is NOT packed in
    (deterministic prefix, no bin-packing)."""
    from clpspark.operators.curate import select_token_budget

    rows = [  # (doc_id, text, quality) — tokens = word count
        (1, "a b c d e f", 0.9),   # 6 tokens, best
        (2, "a b c d e", 0.8),     # 5 tokens -> cum 11 > 10: cut
        (3, "a", 0.7),             # 1 token, would fit but after the cut
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q double")
    got = {r["doc_id"]: r.asDict() for r in
           select_token_budget(df, 10, quality_col="q").collect()}
    assert set(got) == {1}
    assert got[1]["n_tokens"] == 6 and got[1]["cum_tokens"] == 6


def test_select_token_budget_vs_python_replay(spark):
    """Random corpus: selection == a pure-python greedy replay, across a
    budget sweep; ties on quality break by doc_id; token_col override
    and no-quality (corpus-prefix) modes behave."""
    import random

    from clpspark.operators.curate import select_token_budget

    rng = random.Random(7)
    rows = []
    for i in range(200):
        n = rng.randrange(0, 30)
        rows.append((i, " ".join(f"w{j}" for j in range(n)),
                     round(rng.choice([0.2, 0.5, 0.8]), 1)))
    df = spark.createDataFrame(rows, "doc_id long, text string, q double")
    df = df.repartition(16)  # scrambled physical order

    def replay(budget):
        order = sorted(rows, key=lambda r: (-r[2], r[0]))
        out, cum = [], 0
        for i, text, _q in order:
            n = len(text.split())
            if cum + n > budget:
                break
            cum += n
            out.append((i, n, cum))
        return out

    for budget in (0, 37, 500, 10 ** 6):
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in select_token_budget(df, budget,
                                         quality_col="q").collect()
        )
        assert got == sorted(replay(budget)), budget

    # precomputed token column + id-order mode
    tk = df.select("doc_id", F.size(F.split("text", " ")).alias("nt"),
                   "text")
    got = select_token_budget(tk, 50, token_col="nt").orderBy(
        "doc_id").collect()
    cum = 0
    for r in got:
        cum += r["n_tokens"]
        assert r["cum_tokens"] == cum
    assert cum <= 50
