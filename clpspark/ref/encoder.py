"""Pure-Python reference implementation of CLP's tokenizer + variable encoding.

This module is the correctness anchor for the Spark pipeline: every Spark-side
parse result is compared row-by-row against these functions ("token-array
equality vs the reference encoding").

Semantics re-expressed (not copied) from the reference C++:
  - delimiters / variable token bounds .... clp/ir/parsing.cpp:20-88
  - hex-token rule ........................ clp/ir/parsing.hpp:45-58
  - placeholder bytes ..................... clp/ir/types.hpp:11-16
  - int representability .................. clp/EncodedVariableInterpreter.cpp:24-61
  - float bit-packing ..................... clp/EncodedVariableInterpreter.cpp:63-142
  - float decode .......................... clp/EncodedVariableInterpreter.cpp:144-197
  - logtype construction + escaping ....... clp/LogTypeDictionaryEntry.cpp:36-98,
                                            clp/ir/parsing.inc:12-33
  - message decode ........................ clp/EncodedVariableInterpreter.hpp:362-435

No code is copied from the reference; behavior is matched against its golden
tests (components/core/tests/test-EncodedVariableInterpreter.cpp,
test-ir_parsing.cpp), which are ported into tests/test_ref_encoder.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Variable placeholder bytes (clp/ir/types.hpp:11-16)
PLACEHOLDER_INT = "\x11"
PLACEHOLDER_DICT = "\x12"
PLACEHOLDER_FLOAT = "\x13"
PLACEHOLDER_ESCAPE = "\\"

_PLACEHOLDERS = (PLACEHOLDER_INT, PLACEHOLDER_DICT, PLACEHOLDER_FLOAT)

_INT64_MIN = -(1 << 63)
_INT64_MAX = (1 << 63) - 1
_FLOAT_DIGITS_MASK = (1 << 54) - 1  # clp/ffi/encoding_methods.hpp:57

# The non-delimiter character set: "+-.0-9A-Z\_a-z" (clp/ir/parsing.cpp:20-24).
_NON_DELIMS = frozenset(
    "+-."
    "0123456789"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "\\_"
    "abcdefghijklmnopqrstuvwxyz"
)

_HEX_CHARS = frozenset("0123456789abcdefABCDEF")
_ALPHA = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
_DIGITS = frozenset("0123456789")


def is_delim(c: str) -> bool:
    """Everything except [+\\-.0-9A-Z\\\\_a-z] is a delimiter (parsing.cpp:20-24).

    Bytes >= 0x80 compare negative as C++ signed char, so they are delimiters
    there too; any non-ASCII codepoint is a delimiter here.
    """
    return c not in _NON_DELIMS


def could_be_multi_digit_hex_value(s: str) -> bool:
    """[a-fA-F0-9]{2,} (parsing.hpp:45-58)."""
    if len(s) < 2:
        return False
    return all(c in _HEX_CHARS for c in s)


def get_bounds_of_next_var(s: str, end_pos: int) -> tuple[int, int] | None:
    """Find the next variable token at/after ``end_pos``.

    Returns (begin, end) of the next variable, or None. A variable is a token
    (maximal run of non-delimiters) that (a) contains a decimal digit, or
    (b) is directly preceded by '=' and contains a letter, or (c) could be a
    multi-digit hex value. Mirrors parsing.cpp:37-88.
    """
    n = len(s)
    if n <= end_pos:
        return None
    while True:
        begin_pos = end_pos
        while begin_pos < n and is_delim(s[begin_pos]):
            begin_pos += 1
        if begin_pos == n:
            return None
        has_digit = False
        has_alpha = False
        end_pos = begin_pos
        while end_pos < n:
            c = s[end_pos]
            if c in _DIGITS:
                has_digit = True
            elif c in _ALPHA:
                has_alpha = True
            elif is_delim(c):
                break
            end_pos += 1
        tok = s[begin_pos:end_pos]
        if (
            has_digit
            or (begin_pos > 0 and s[begin_pos - 1] == "=" and has_alpha)
            or could_be_multi_digit_hex_value(tok)
        ):
            return (begin_pos, end_pos)


def is_var(s: str) -> bool:
    """Whether the whole string is a single variable token (parsing.cpp:26-35)."""
    bounds = get_bounds_of_next_var(s, 0)
    return bounds is not None and bounds == (0, len(s))


def tokenize(s: str) -> list[tuple[int, int]]:
    """All variable token bounds in ``s``, in order."""
    out: list[tuple[int, int]] = []
    end = 0
    while (b := get_bounds_of_next_var(s, end)) is not None:
        out.append(b)
        end = b[1]
    return out


def encode_int(value: str) -> int | None:
    """String -> representable int64, or None.

    Rules (EncodedVariableInterpreter.cpp:24-61): no empty, no '+', no
    zero-padding, '-' must be followed by [1-9], whole string must parse and
    fit int64.
    """
    if not value:
        return None
    if value[0] == "-":
        if len(value) < 2 or not ("1" <= value[1] <= "9"):
            return None
        body = value[1:]
    else:
        if not ("0" <= value[0] <= "9"):
            return None
        if len(value) > 1 and value[0] == "0":
            return None
        body = value
    # from_chars: every remaining char must be an ASCII decimal digit
    for c in body:
        if not ("0" <= c <= "9"):
            return None
    v = int(value)
    if v < _INT64_MIN or v > _INT64_MAX:
        return None
    return v


def encode_float(value: str) -> int | None:
    """String -> custom-packed decimal float in an int64, or None.

    Bit layout MSB->LSB: [1 sign][1 unused][54 digits][4 num_digits-1]
    [4 decimal_pos_from_right-1] (EncodedVariableInterpreter.cpp:63-142).
    """
    if not value:
        return None
    pos = 0
    max_length = 17  # 16 digits + decimal point
    is_negative = False
    if value[0] == "-":
        is_negative = True
        pos = 1
        max_length = 18
    if len(value) > max_length:
        return None
    num_digits = 0
    decimal_point_pos = None
    digits = 0
    for i in range(pos, len(value)):
        c = value[i]
        if "0" <= c <= "9":
            digits = digits * 10 + (ord(c) - 48)
            num_digits += 1
        elif decimal_point_pos is None and c == ".":
            decimal_point_pos = len(value) - 1 - i
        else:
            return None
    if decimal_point_pos is None or decimal_point_pos == 0 or num_digits == 0:
        return None
    enc = 1 if is_negative else 0
    enc <<= 55
    enc |= digits & _FLOAT_DIGITS_MASK
    enc <<= 4
    enc |= (num_digits - 1) & 0x0F
    enc <<= 4
    enc |= (decimal_point_pos - 1) & 0x0F
    if enc > _INT64_MAX:  # bit_cast uint64 -> int64
        enc -= 1 << 64
    return enc


def decode_float(encoded_var: int) -> str:
    """Inverse of :func:`encode_float` (EncodedVariableInterpreter.cpp:144-197)."""
    enc = encoded_var & ((1 << 64) - 1)
    decimal_pos = (enc & 0x0F) + 1
    enc >>= 4
    num_digits = (enc & 0x0F) + 1
    enc >>= 4
    digits = enc & _FLOAT_DIGITS_MASK
    enc >>= 55
    is_negative = enc > 0

    value_length = num_digits + 1 + (1 if is_negative else 0)
    buf = ["\0"] * value_length
    num_chars_to_process = value_length
    if is_negative:
        buf[0] = "-"
        num_chars_to_process -= 1

    pos = value_length - 1
    while pos > (value_length - 1 - decimal_pos) and digits > 0:
        buf[pos] = chr(48 + digits % 10)
        digits //= 10
        pos -= 1
        num_chars_to_process -= 1
    if digits > 0:
        pos -= 1  # skip decimal; added at the end
        num_chars_to_process -= 1
        while digits > 0:
            buf[pos] = chr(48 + digits % 10)
            digits //= 10
            pos -= 1
            num_chars_to_process -= 1
    while num_chars_to_process > 0:
        buf[pos] = "0"
        pos -= 1
        num_chars_to_process -= 1
    buf[value_length - 1 - decimal_pos] = "."
    return "".join(buf)


def escape_constant(constant: str) -> str:
    """Escape placeholder/escape bytes in a logtype constant (parsing.inc:12-33)."""
    out = []
    for c in constant:
        if c == PLACEHOLDER_ESCAPE or c in _PLACEHOLDERS:
            out.append(PLACEHOLDER_ESCAPE)
        out.append(c)
    return "".join(out)


# Variable classes emitted by encode_message
VAR_INT = 0
VAR_FLOAT = 1
VAR_DICT = 2


@dataclass
class EncodedMessage:
    """Parse/encode result of one message (the per-row pipeline invariant).

    ``encoded_vars[i]`` is the int64 for int/float vars and None for dict vars
    (the dictionary id is assigned by the enrich stage); ``dict_vars`` holds
    the dict-var strings in order.
    """

    logtype: str = ""
    var_classes: list[int] = field(default_factory=list)
    encoded_vars: list[int | None] = field(default_factory=list)
    dict_vars: list[str] = field(default_factory=list)


def encode_message(message: str) -> EncodedMessage:
    """Full parse+encode of a message: logtype with placeholders + typed vars.

    Mirrors EncodedVariableInterpreter::encode_and_add_to_dictionary
    (EncodedVariableInterpreter.hpp:266-286) driving
    LogTypeDictionaryEntry::parse_next_var (LogTypeDictionaryEntry.cpp:65-98),
    with variable classification int -> float -> dictionary
    (EncodedVariableInterpreter.hpp:513-530).
    """
    out = EncodedMessage()
    parts: list[str] = []
    last_end = 0
    end = 0
    while (bounds := get_bounds_of_next_var(message, end)) is not None:
        begin, end = bounds
        parts.append(escape_constant(message[last_end:begin]))
        last_end = end
        var = message[begin:end]
        iv = encode_int(var)
        if iv is not None:
            parts.append(PLACEHOLDER_INT)
            out.var_classes.append(VAR_INT)
            out.encoded_vars.append(iv)
        else:
            fv = encode_float(var)
            if fv is not None:
                parts.append(PLACEHOLDER_FLOAT)
                out.var_classes.append(VAR_FLOAT)
                out.encoded_vars.append(fv)
            else:
                parts.append(PLACEHOLDER_DICT)
                out.var_classes.append(VAR_DICT)
                out.encoded_vars.append(None)
                out.dict_vars.append(var)
    parts.append(escape_constant(message[last_end:]))
    out.logtype = "".join(parts)
    return out


def decode_message(
    logtype: str,
    encoded_vars: list[int | None],
    dict_vars: list[str],
) -> str:
    """Reconstruct the original message from a logtype + variables.

    Walks the logtype; placeholders consume variables in order, escape bytes
    un-escape the next char (EncodedVariableInterpreter.hpp:362-435).
    """
    out: list[str] = []
    var_ix = 0
    dict_ix = 0
    i = 0
    n = len(logtype)
    while i < n:
        c = logtype[i]
        if c == PLACEHOLDER_ESCAPE:
            i += 1
            if i < n:
                out.append(logtype[i])
        elif c == PLACEHOLDER_INT:
            out.append(str(encoded_vars[var_ix]))
            var_ix += 1
        elif c == PLACEHOLDER_FLOAT:
            out.append(decode_float(encoded_vars[var_ix]))  # type: ignore[arg-type]
            var_ix += 1
        elif c == PLACEHOLDER_DICT:
            out.append(dict_vars[dict_ix])
            dict_ix += 1
            var_ix += 1  # dict vars occupy an encoded-var slot (the dict id)
        else:
            out.append(c)
        i += 1
    return "".join(out)
