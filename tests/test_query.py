"""Query-layer goldens: KQL subset (port of tests/test-clp_s-search.cpp
golden table) and wildcard grep with dictionary pre-filter."""

from __future__ import annotations

import pytest

from clpspark.operators.enrich import build_logtype_dict, build_var_dict, enrich
from clpspark.operators.parse import parse_sequences
from clpspark.plans.grep import GrepEngine, _logtype_like_pattern, _query_tokens
from clpspark.plans.kql import kql_filter
from clpspark.corpus import detokenize
from clpspark.ref.timestamps import strip_timestamp
from clpspark.ref.wildcard import wildcard_match


# ---------------------------------------------------------------- KQL corpus
@pytest.fixture(scope="module")
def search_df(spark):
    """Port of tests/test_log_files/test_search.jsonl (13 rows, idx 0-12).

    Adaptation: rows 7 (array of structs) and 8 (plain struct) share one
    column in the reference's dynamic schema; Spark needs one type per
    column, so row 8's object is represented as a single-element array —
    same ANY-element match semantics (QueryRunner.cpp:302-307).
    """
    rows = [
        {"idx": 0, "a": "clp string"},
        {"idx": 1, "msg": 'Msg 1: "Abc123"'},
        {"idx": 2, "msg": "Msg 2: 'Abc123'"},
        {"idx": 3, "msg": "Msg 3: \nAbc123"},
        {"idx": 4, "skip_msg": "Msg 4: \\Abc123"},
        {"idx": 5, "msg": "Msg 5: \rAbc123"},
        {"idx": 6, "msg": "Msg 6: \tAbc123"},
        {"idx": 7, "arr": [{"a": 999, "b": None}, {"a": None, "b": 1001}]},
        {"idx": 8, "arr": [{"a": 999, "b": 1001}]},
        {"idx": 9, "var_string": "a", "clp_string": "a b", "float": 1.1,
         "int": 1, "bool": True, "obj": ("x", 5),
         "a.b": ("y",), "tsm": 1462692785251},
        {"idx": 10, "ambiguous_varstring": "abcde", "obj": ("x", 99),
         "tsm": 1462692785000},
        {"idx": 11, "ambiguous_varstring": "ae", "tsm": 1462692786000},
        {"idx": 12, "ambiguous_varstring": "a*e"},
    ]
    schema = (
        "idx long, a string, msg string, skip_msg string, "
        "arr array<struct<a: long, b: long>>, var_string string, "
        "clp_string string, float double, int long, bool boolean, "
        "ambiguous_varstring string, obj struct<c: string, d: long>, "
        "`a.b` struct<c: string>, tsm long"
    )
    return spark.createDataFrame(
        [tuple(r.get(k) for k in
               ["idx", "a", "msg", "skip_msg", "arr", "var_string",
                "clp_string", "float", "int", "bool", "ambiguous_varstring",
                "obj", "a.b", "tsm"])
         for r in rows],
        schema,
    ).cache()


GOLDENS = [
    ("NOT a: b", {0}),
    (r'msg: "Msg 1: \"Abc123\""', {1}),
    ("msg: \"Msg 2: 'Abc123'\"", {2}),
    (r'msg: "Msg 3: \nAbc123"', {3}),
    (r'msg: "Msg 5: \rAbc123"', {5}),
    (r'msg: "Msg 6: \tAbc123"', {6}),
    ('msg: "*Abc123*"', {1, 2, 3, 5, 6}),
    ("arr.b > 1000", {7, 8}),
    ("var_string: *", {9}),
    ("clp_string: *", {9}),
    ('ambiguous_varstring: "a*e"', {10, 11, 12}),
    (r'ambiguous_varstring: "a\*e"', {12}),
    # literal backslash in the value: must not hit Spark LIKE's escape-char
    # pitfalls (the reference skips this case due to its own Grep bug; see
    # test-clp_s-search.cpp "Msg 4")
    (r'skip_msg: "Msg 4: \\Abc123"', {4}),
    (r'skip_msg: "*\\Abc123*"', {4}),
    # nested object queries (Kql.g4 NestedQuery; kql.cpp prepend_column)
    ("obj: {c: x AND d: 5}", {9}),
    ("obj: {c: x}", {9, 10}),
    ("obj: {c: x AND NOT d: 99}", {9}),
    # value lists (Kql.g4 list_of_values): bare = OR, NOT = AND of negations
    ("idx: (0 OR 1)", {0, 1}),
    ("idx: (OR 0 1)", {0, 1}),  # the reference grammar's prefix condition
    ("idx: (10 11 12)", {10, 11, 12}),
    ("obj.d: (NOT 99)", {9}),
    ("obj.d: (AND 5)", {9}),
    # date() literals (DateLiteral.cpp known-ts-pattern parse) vs epoch ms
    ('tsm >= date("2016-05-08 07:33:05.251")', {9, 11}),
    ('tsm < date("2016-05-08 07:33:05.251")', {10}),
    ('tsm: date("2016-05-08 07:33:05.251")', {9}),
    # escaped dots in column descriptors (test-kql.cpp escaped columns)
    (r"a\.b: {c: y}", {9}),
    (r"a\.b.c: y", {9}),
    # extra coverage beyond the reference table
    ("int: 1 AND float > 1.0", {9}),
    ("idx: 0 OR idx: 1", {0, 1}),
    ("bool: true", {9}),
    ("(idx: 7 OR idx: 8) AND arr.a: 999", {7, 8}),
    ("idx >= 10 AND NOT ambiguous_varstring: ae", {10, 12}),
]


@pytest.mark.parametrize("query,expected", GOLDENS)
def test_kql_goldens(search_df, query, expected):
    got = {r["idx"] for r in kql_filter(search_df, query).select("idx").collect()}
    assert got == expected, query


@pytest.mark.parametrize("query,expected", [
    ('msg: "MSG 1*"', {1}),
    ('ambiguous_varstring: "ABCDE"', {10}),
    ('obj: {c: X}', {9, 10}),
])
def test_kql_case_insensitive(search_df, query, expected):
    assert not {r["idx"] for r in
                kql_filter(search_df, query).select("idx").collect()}
    got = {r["idx"] for r in
           kql_filter(search_df, query, case_sensitive=False)
           .select("idx").collect()}
    assert got == expected, query


# ------------------------------------------------------------------ grep
@pytest.fixture(scope="module")
def grep_setup(spark, vocab_meta, small_corpus):
    df = spark.read.parquet(small_corpus)
    parsed = parse_sequences(df, vocab_meta.vocab).persist()
    lt = build_logtype_dict(parsed)
    vd = build_var_dict(parsed)
    events = enrich(parsed, lt, vd, mode="map").persist()
    engine = GrepEngine(events, lt, vd)
    # oracle message list
    msgs = {}
    for r in df.collect():
        line = detokenize(r["tokens"], vocab_meta.vocab)
        ts, _, rest = strip_timestamp(line)
        msgs[r["doc_id"]] = (ts, rest)
    return engine, msgs


def _oracle_matches(msgs, query, ignore_case=False, tge=None, tle=None):
    from clpspark.ref.wildcard import clean_up_wildcard_search_string

    q = clean_up_wildcard_search_string(query)
    out = set()
    for doc_id, (ts, rest) in msgs.items():
        if tge is not None and (ts is None or ts < tge):
            continue
        if tle is not None and (ts is None or ts > tle):
            continue
        if q == "*" or wildcard_match(rest, q, case_sensitive=not ignore_case):
            out.add(doc_id)
    return out


GREP_QUERIES = [
    ("*heartbeat*", {}),
    ("* INFO Task * completed in * ms", {}),
    ("*connection*", {"ignore_case": True}),
    ("*Connection*", {}),
    ("* user=* latency * ms", {}),
    ("*cache hit ratio *.*", {}),
    ("*nonexistent_token_xyz*", {}),
    ("*", {}),
    ("* checksum * verified*", {}),
    ("*esc\x11const*", {}),
    # literal backslash in a logtype constant and in a dict var: the LIKE
    # translation must bail to rlike instead of emitting a lone '\'
    (r"*back\\slash pass*", {}),
    (r"*APet4123\\test.txt*", {}),
]


@pytest.mark.parametrize("query,kw", GREP_QUERIES)
def test_grep_matches_oracle(grep_setup, query, kw):
    engine, msgs = grep_setup
    got = {r["doc_id"] for r in engine.search(query, **kw).collect()}
    expected = _oracle_matches(msgs, query, **kw)
    assert got == expected, query


def test_grep_prefilter_equals_postfilter(grep_setup):
    engine, _ = grep_setup
    for query in ["*heartbeat*", "* INFO Task * completed in * ms",
                  "*cache hit ratio *"]:
        a = {r["doc_id"] for r in engine.search(query, prefilter=True).collect()}
        b = {r["doc_id"] for r in engine.search(query, prefilter=False).collect()}
        assert a == b, query


def test_grep_time_range(grep_setup):
    engine, msgs = grep_setup
    tss = sorted(ts for ts, _ in msgs.values() if ts is not None)
    tge, tle = tss[len(tss) // 4], tss[3 * len(tss) // 4]
    got = {r["doc_id"] for r in engine.search("*", tge=tge, tle=tle).collect()}
    expected = _oracle_matches(msgs, "*", tge=tge, tle=tle)
    assert got == expected


def test_grep_exact_int_var_prefilter(grep_setup):
    """Query containing a specific int value uses the encoded-var pre-filter."""
    engine, msgs = grep_setup
    # pick an int var that actually occurs
    import re

    for _, (ts, rest) in sorted(msgs.items()):
        m = re.search(r" (\d{3,}) ms$", rest)
        if m:
            val = m.group(1)
            break
    else:
        pytest.skip("no int token found")
    q = f"* {val} ms"
    got = {r["doc_id"] for r in engine.search(q).collect()}
    assert got == _oracle_matches(msgs, q)
    assert got  # at least the row we found


def test_query_token_extraction():
    toks = _query_tokens("* 4938 ms")
    assert ("4938", True) in toks
    toks = _query_tokens("*partial*")
    assert toks == [("partial", False)]


def test_logtype_pattern_keeps_constants():
    pat = _logtype_like_pattern("* INFO Task * completed in * ms")
    assert "INFO" in pat and "Task" in pat and "completed" in pat


def test_grep_float_var_prefilter(grep_setup):
    """A float token in the query pre-filters via its bit-exact encoding."""
    import re

    engine, msgs = grep_setup
    for _, (ts, rest) in sorted(msgs.items()):
        m = re.search(r"ratio (\d+\.\d+) ", rest)
        if m:
            val = m.group(1)
            break
    else:
        pytest.skip("no float token found")
    q = f"*cache hit ratio {val} for shard *"
    got = {r["doc_id"] for r in engine.search(q).collect()}
    assert got == _oracle_matches(msgs, q)
    assert got


def test_grep_dict_var_prefilter(grep_setup):
    """A dictionary token in the query pre-filters via its var-dict id."""
    import re

    engine, msgs = grep_setup
    for _, (ts, rest) in sorted(msgs.items()):
        m = re.search(r"container (\S+) with", rest)
        # avoid tokens containing wildcard/escape metachars: they change
        # meaning inside a query string (separate escaping tests cover that path)
        if m and not any(c in m.group(1) for c in "*?\\"):
            tok = m.group(1)
            break
    else:
        pytest.skip("no container token found")
    q = f"* container {tok} with image *"
    got = {r["doc_id"] for r in engine.search(q).collect()}
    assert got == _oracle_matches(msgs, q)
    assert got


def test_grep_join_decode_matches_map(grep_setup, spark, vocab_meta,
                                      small_corpus):
    """Huge-dict regime: ids-only events + forced join decode (no var-dict
    collect anywhere) return the same matches as the broadcast-map engine."""
    engine, msgs = grep_setup
    df = spark.read.parquet(small_corpus)
    parsed = parse_sequences(df, vocab_meta.vocab)
    lt = build_logtype_dict(parsed)
    vd = build_var_dict(parsed)
    events = enrich(parsed, lt, vd).drop("logtype", "dict_vars")
    engine_join = GrepEngine(events, lt, vd, decode_mode="join")
    for q in ["*heartbeat*", "* INFO Task * completed in * ms",
              r"*back\\slash pass*"]:
        got = {(r["doc_id"], r["message"])
               for r in engine_join.search(q).collect()}
        expected = {(r["doc_id"], r["message"])
                    for r in engine.search(q).collect()}
        assert got == expected, q
        assert got


def test_ordered_subsequence_prefilter(spark):
    """Query vars must match as an in-order subsequence (Query.cpp
    matches_vars), not unordered membership."""
    from clpspark.plans.grep import _ordered_subsequence_pred

    df = spark.createDataFrame(
        [("inorder", [12, 99, 34]), ("reversed", [34, 99, 12]),
         ("gap-ok", [5, 12, 7, 34, 9]), ("missing", [12, 12]),
         ("dup", [12, 12, 34])],
        "name string, encoded_vars array<bigint>",
    )
    pred = _ordered_subsequence_pred([[12], [34]])
    got = {r["name"] for r in df.where(pred).collect()}
    assert got == {"inorder", "gap-ok", "dup"}
    # duplicates consume distinct positions
    pred2 = _ordered_subsequence_pred([[12], [12]])
    got2 = {r["name"] for r in df.where(pred2).collect()}
    assert got2 == {"missing", "dup"}
    # multi-value requirement (case-insensitive dict ids)
    pred3 = _ordered_subsequence_pred([[11, 12], [33, 34]])
    got3 = {r["name"] for r in df.where(pred3).collect()}
    assert got3 == {"inorder", "gap-ok", "dup"}


def test_grep_limit(grep_setup):
    engine, msgs = grep_setup
    total = len(_oracle_matches(msgs, "*heartbeat*"))
    assert total > 5
    limited = engine.search("*heartbeat*", limit=5).collect()
    assert len(limited) == 5
    assert {r["doc_id"] for r in limited} <= _oracle_matches(msgs, "*heartbeat*")


def test_grep_count_and_count_by_time(grep_setup):
    engine, msgs = grep_setup
    q = "*heartbeat*"
    expected_ids = _oracle_matches(msgs, q)
    assert engine.count(q).first()["n_rows"] == len(expected_ids)
    buckets = {}
    for did in expected_ids:
        ts, _ = msgs[did]
        if ts is not None:
            b = ts // 3_600_000 * 3_600_000
            buckets[b] = buckets.get(b, 0) + 1
    got = {r["bucket"]: r["n_rows"]
           for r in engine.count_by_time(q, 3_600_000).collect()}
    assert got == buckets


def test_topk_latest_windowed_equals_plain(grep_setup):
    """Early-exit windowed top-k returns exactly the plain top-k (both
    orderings deterministic), for small windows (multiple widenings) and
    for k beyond the match count (full-range fallback)."""
    engine, _ = grep_setup
    for q, k, win in [("*heartbeat*", 10, 60_000), ("*heartbeat*", 10**6, 60_000),
                      ("*", 25, 1)]:
        a = [(r["doc_id"], r["ts"])
             for r in engine.topk_latest(q, k).collect()]
        b = [(r["doc_id"], r["ts"])
             for r in engine.topk_latest_windowed(q, k, window_ms=win).collect()]
        assert a == b, (q, k, win)


def test_grep_source_filter(grep_setup):
    engine, msgs = grep_setup
    all_rows = engine.search("*").select("doc_id", "source").collect()
    some_source = all_rows[0]["source"]
    got = {r["doc_id"] for r in
           engine.search("*", source=some_source).collect()}
    expected = {r["doc_id"] for r in all_rows if r["source"] == some_source}
    assert got == expected and got


def test_kql_garbage_queries_fail_cleanly(spark):
    """Full-parser robustness: 300 seeded garbage queries either compile
    or raise a clean error (ValueError for syntax, KeyError for unknown
    columns) — no other exception class reaches the user."""
    import random
    import string

    from clpspark.plans.kql import kql_filter

    df = spark.createDataFrame(
        [(1, "a", True)], "num long, s string, b boolean"
    )
    rng = random.Random(77)
    alphabet = string.printable
    for _ in range(300):
        q = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(1, 25))
        )
        try:
            kql_filter(df, q)
        except (ValueError, KeyError):
            pass
