"""Port of tests/test-regex_utils.cpp golden tables + the grep regex
front-end."""

from __future__ import annotations

import pytest

from clpspark.ref.regex_translate import (
    RegexTranslationError,
    regex_to_wildcard,
)

VALUES = [
    ("", ""),
    ("xyz", "xyz"),
    (". xyz .* zyx .", "? xyz * zyx ?"),
    (". xyz .+ zyx .*", "? xyz ?* zyx *"),
    ("<>-_/=!", "<>-_/=!"),
    (r"\<\>\-\_\/\=\!", "<>-_/=!"),
    (r"\*\+\?\|\^\$\.\{\}\[\]\(\)\<\>\-\_\/\=\!\\",
     r"\*+\?|^$.{}[]()<>-_/=!\\"),
    ("x[y]z", "xyz"),
    ("x[\\^]z", "x^z"),
    ("x[\\]]z", "x]z"),
    ("x[-]z", "x-z"),
    ("x[\\-]z", "x-z"),
    ("x[\\\\]z", "x\\\\z"),
    (r"[a][b][\^][-][\-][\]][\\][c][d]", "ab^--]\\\\cd"),
]

ERRORS = [
    (".? xyz .* zyx .", "UnsupportedQuestionMark"),
    (". xyz .** zyx .", "UntranslatableStar"),
    (". xyz .*+ zyx .", "UntranslatablePlus"),
    (". xyz |.* zyx .", "UnsupportedPipe"),
    (". xyz ^.* zyx .", "IllegalCaret"),
    (". xyz $.* zyx .", "IllegalDollarSign"),
    ("abc\\Qdefghi\\Ejkl", "IllegalEscapeSequence"),
    ("x[]y", "UnsupportedCharsetPattern"),
    ("x[a-z]y", "UnsupportedCharsetPattern"),
    ("x[^^]y", "UnsupportedCharsetPattern"),
    ("x[^0-9]y", "UnsupportedCharsetPattern"),
    ("[xX][yY]", "UnsupportedCharsetPattern"),
    ("ch:[a-zA-Z0-9]", "UnsupportedCharsetPattern"),
    ("[\\", "IncompleteCharsetStructure"),
    ("[\\\\", "IncompleteCharsetStructure"),
    ("[xX", "IncompleteCharsetStructure"),
    ("ch:[a-zA-Z0-9", "IncompleteCharsetStructure"),
]

CASE_INSENSITIVE_VALUES = [
    ("[xX][yY]", "xy"),
    ("[Yy][Xx]", "yx"),
    ("[aA][Bb][Cc]", "abc"),
    ("[aA][Bb][\\^][-][\\]][Cc][dD]", "ab^-]cd"),
]

ANCHOR_VALUES = [
    ("^", "*"),
    ("$", "*"),
    ("^xyz$", "xyz"),
    ("xyz", "*xyz*"),
    ("xyz$$", "*xyz"),
]


@pytest.mark.parametrize("regex,wild", VALUES)
def test_simple_translations(regex, wild):
    assert regex_to_wildcard(regex) == wild


@pytest.mark.parametrize("regex,code", ERRORS)
def test_translation_errors(regex, code):
    with pytest.raises(RegexTranslationError) as e:
        regex_to_wildcard(regex)
    assert e.value.code == code


@pytest.mark.parametrize("regex,wild", CASE_INSENSITIVE_VALUES)
def test_case_insensitive(regex, wild):
    assert regex_to_wildcard(regex, case_insensitive=True) == wild


@pytest.mark.parametrize("regex,wild", ANCHOR_VALUES)
def test_anchor_config(regex, wild):
    assert regex_to_wildcard(regex, add_prefix_suffix_wildcards=True) == wild


def test_anchor_error():
    with pytest.raises(RegexTranslationError) as e:
        regex_to_wildcard("xyz$zyx$", add_prefix_suffix_wildcards=True)
    assert e.value.code == "IllegalDollarSign"


def test_grep_regex_frontend(spark, vocab_meta, small_corpus):
    """search_regex == search of the translated wildcard; untranslatable
    regexes fall back to rlike with identical results."""
    from clpspark.operators.enrich import build_logtype_dict, build_var_dict, enrich
    from clpspark.operators.parse import parse_sequences
    from clpspark.plans.grep import GrepEngine

    parsed = parse_sequences(spark.read.parquet(small_corpus), vocab_meta.vocab)
    lt, vd = build_logtype_dict(parsed), build_var_dict(parsed)
    engine = GrepEngine(enrich(parsed, lt, vd), lt, vd)

    a = {r["doc_id"] for r in engine.search_regex("heartbeat seq").collect()}
    b = {r["doc_id"] for r in engine.search("*heartbeat seq*").collect()}
    assert a == b and a

    # untranslatable ([0-9] charset) -> rlike fallback
    c = {r["doc_id"]
         for r in engine.search_regex("heartbeat seq [0-9]+ ok").collect()}
    d = {r["doc_id"]
         for r in engine.search("*heartbeat seq * ok*").collect()
         if r["message"]}
    assert c and c <= d
