"""Golden tests for the pure-Python reference encoder.

Ports the matrices of the reference's Catch2 tests
(components/core/tests/test-EncodedVariableInterpreter.cpp,
 tests/test-ir_parsing.cpp) — these pin our oracle to CLP behavior.
"""

from __future__ import annotations

import pytest

from clpspark.ref import encoder as E
from clpspark.ref.timestamps import strip_timestamp
from clpspark.ref.wildcard import (
    clean_up_wildcard_search_string,
    wildcard_match,
)

INT64_MAX = 2**63 - 1
INT64_MIN = -(2**63)


# --- test-EncodedVariableInterpreter.cpp:22-192 (int matrix) ----------------
@pytest.mark.parametrize(
    "value,expected",
    [
        ("0", 0),
        ("-1", -1),
        ("1", 1),
        (str(INT64_MAX), INT64_MAX),
        (str(INT64_MIN), INT64_MIN),
    ],
)
def test_int_accepts(value, expected):
    assert E.encode_int(value) == expected


@pytest.mark.parametrize(
    "value",
    ["", "a", "-", "+", "-a", "+a", "--", "++", " 1", "- 1", "1 ", "01",
     "+1", "1u", "1U", "1l", "1L", "1ll", "1LL", "0.0", "-0",
     str(INT64_MAX + 1), str(INT64_MIN - 1)],
)
def test_int_rejects(value):
    assert E.encode_int(value) is None


# --- test-EncodedVariableInterpreter.cpp:194-377 (float matrix) --------------
@pytest.mark.parametrize(
    "value",
    ["0.0", "-1.0", "1.0", ".1", "-00.00", "-999999999999999.9",
     "-.9999999999999999", ".9999999999999999"],
)
def test_float_roundtrip(value):
    enc = E.encode_float(value)
    assert enc is not None
    assert E.decode_float(enc) == value


@pytest.mark.parametrize(
    "value",
    ["", "a", "-", "+", "-a", "+a", "--", "++", ".", "1.", " 1.0", "- 1.0",
     "1.0 ", "+1.0", "1.0f", "1.0F", "1.0l", "1.0L", str(2**64 - 1),
     "12345678901234567.8"],
)
def test_float_rejects(value):
    assert E.encode_float(value) is None


# --- test-ir_parsing.cpp (variable bounds goldens) ---------------------------
def _vars(s: str) -> list[str]:
    return [s[b:e] for b, e in E.tokenize(s)]


def test_tokenizer_goldens():
    assert _vars("") == []
    # "abc" is all-hex chars (>=2) -> variable per the hex rule
    assert _vars("abc") == ["abc"]
    assert _vars("/") == []
    assert _vars("xyz") == []
    assert _vars("=") == []
    assert _vars("~=x!abc123;1.2%x:+394/-") == ["x", "abc123", "1.2", "+394"]
    assert _vars(" ad ff 95 24 0d ff ") == ["ad", "ff", "95", "24", "0d", "ff"]
    assert _vars(" text ") == []
    assert _vars("= var123 ") == ["var123"]


def test_is_var():
    assert E.is_var("abc123")
    assert E.is_var("1.2")
    assert E.is_var("deadBEEF")
    assert not E.is_var("xyz")
    assert not E.is_var("abc123 ")
    assert not E.is_var(" abc123")


def test_hex_rule():
    assert E.could_be_multi_digit_hex_value("ad")
    assert E.could_be_multi_digit_hex_value("deadBEEF")
    assert not E.could_be_multi_digit_hex_value("a")
    assert not E.could_be_multi_digit_hex_value("xyz1")
    assert not E.could_be_multi_digit_hex_value("ag")


# --- test-EncodedVariableInterpreter.cpp:426-581 (full message) --------------
def test_full_message_roundtrip():
    large = str((2**64 - 1)) + "0"  # > int64 -> dictionary var
    msg = (
        "here is a string with a small int 4938"
        " and a very large int " + large +
        " and a double -25.5196868642755"
        " and a weird double -00.00"
        " and a str with numbers python2.7.3"
        " and an escape \\"
        " and an int placeholder \x11"
        " and a float placeholder \x13"
        " and a dictionary placeholder \x12"
    )
    em = E.encode_message(msg)
    assert em.var_classes == [E.VAR_INT, E.VAR_DICT, E.VAR_FLOAT, E.VAR_FLOAT,
                              E.VAR_DICT]
    assert em.dict_vars == [large, "python2.7.3"]
    assert em.encoded_vars[0] == 4938
    # escaped placeholders stay escaped in the logtype
    assert "\\\x11" in em.logtype and "\\\x13" in em.logtype
    assert "\\\x12" in em.logtype and "\\\\" in em.logtype
    assert E.decode_message(em.logtype, em.encoded_vars, em.dict_vars) == msg


def test_empty_and_constant_messages():
    for msg in ["", "static text", "a b c !"]:
        em = E.encode_message(msg)
        assert em.encoded_vars == [] and em.logtype == msg
        assert E.decode_message(em.logtype, [], []) == msg


# --- timestamps ---------------------------------------------------------------
def test_timestamp_patterns():
    ts, ix, rest = strip_timestamp("2016-05-08 07:34:05.251 INFO hello")
    assert ts == 1462692845251 and rest == " INFO hello"
    ts, _, rest = strip_timestamp("2015-01-31T15:50:45.392 x")
    assert ts == 1422719445392
    ts, _, _ = strip_timestamp("[2015-01-31 15:50:45,085] boot")
    assert ts == 1422719445085
    ts, ix, rest = strip_timestamp("916321 relative timestamp")
    assert ts == 916321 and rest == " relative timestamp"
    ts, ix, rest = strip_timestamp("no timestamp here")
    assert ts is None and ix == -1 and rest == "no timestamp here"


# --- wildcard (string_utils.cpp) ----------------------------------------------
def test_wildcard_match():
    assert wildcard_match("abcde", "a*e")
    assert wildcard_match("ae", "a*e")
    assert not wildcard_match("abcd", "a*e")
    assert wildcard_match("a*e", "a\\*e")
    assert not wildcard_match("abcde", "a\\*e")
    assert wildcard_match("abc", "a?c")
    assert not wildcard_match("abbc", "a?c")
    assert wildcard_match("ABC", "abc", case_sensitive=False)
    assert not wildcard_match("ABC", "abc", case_sensitive=True)
    assert wildcard_match("", "*")
    assert not wildcard_match("", "?")
    assert wildcard_match("anything at all", "*")


def test_clean_up_wildcard():
    assert clean_up_wildcard_search_string("a***b") == "a*b"
    assert clean_up_wildcard_search_string("a\\xb") == "axb"
    assert clean_up_wildcard_search_string("a\\*b") == "a\\*b"
    assert clean_up_wildcard_search_string("a\\\\b") == "a\\\\b"
    assert clean_up_wildcard_search_string("trail\\") == "trail"
