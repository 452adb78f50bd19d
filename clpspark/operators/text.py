"""Text-analysis operators for training-data pipelines.

All hot-path metrics are built-in Column expressions (JVM-side, codegen'd);
only the rolling-hash fingerprint needs an Arrow-batched UDF. Each operator
has deterministic, engine-portable semantics so a DuckDB oracle can verify it
(see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "la", "que", "de", "los", "es"],
}


def tokenize_whitespace(col) -> F.Column:
    """Non-empty whitespace-separated tokens (portable split semantics)."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword count (regex segments:
    runs of letters, runs of digits, single other non-space chars)."""
    words = tokenize_whitespace(F.col(text_col))
    subwords = F.regexp_count(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    )
    return df.select(
        "doc_id",
        F.size(words).alias("n_words"),
        subwords.alias("n_subwords"),
        F.length(F.col(text_col)).alias("n_chars_calc"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / distinct-ratio / word-shape quality metrics + composite score.

    Deterministic, engine-portable formula (rounded) so the oracle can verify.
    """
    words = tokenize_whitespace(F.col(text_col))
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_chars = F.length(F.col(text_col))
    sum_wlen = F.aggregate(words, F.lit(0), lambda acc, x: acc + F.length(x))
    avg_wlen = F.when(n_words > 0, F.round(sum_wlen / n_words, 6)).otherwise(
        F.lit(0.0)
    )
    ttr = F.when(n_words > 0, F.round(n_distinct / n_words, 6)).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0,
        F.round(
            (n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", "")))
            / n_chars,
            6,
        ),
    ).otherwise(F.lit(0.0))
    score = F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + ttr * 0.4
        + (F.lit(1.0) - digit_ratio) * 0.2,
        6,
    )
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        avg_wlen.alias("avg_word_len"),
        ttr.alias("type_token_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic; deterministic tie-break by lang code.

    hits(lang) = number of distinct lang stopwords present among the words;
    predicted = lang with max hits ('und' = undetermined when all zero).
    """
    words = F.array_distinct(tokenize_whitespace(F.lower(F.col(text_col))))
    hit_cols = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in LANG_STOPWORDS.items()
    }
    # argmax with deterministic lang-code order
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in sorted(hit_cols):
        h = hit_cols[lang]
        take = h > best_hits
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_hits = F.when(take, h).otherwise(best_hits)
    sel = [df[c] for c in df.columns if c == "doc_id"]
    return df.select(
        *sel,
        *[hit_cols[lang].alias(f"hits_{lang}") for lang in sorted(hit_cols)],
        best.alias("lang_pred"),
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1000003


def fingerprint_py(text: str) -> int:
    """Polynomial rolling hash over normalized words (pure-Python oracle)."""
    h = 0
    for w in text.lower().split():
        for b in w.encode("utf-8"):
            h = (h * _FP_BASE + b) % _FP_MOD
        h = (h * _FP_BASE + 0x1F) % _FP_MOD
    return h


def word_hash_py(w: str) -> int:
    """61-bit polynomial hash of one word (same family as fingerprint_py).

    Chosen over a cryptographic hash so engine-independent oracles (DuckDB
    HUGEINT arithmetic) can recompute it exactly; 61 well-mixed bits is
    plenty for SimHash bit-voting.
    """
    h = 0
    for b in w.encode("utf-8"):
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint (rolling hash) via an Arrow-batched UDF.

    Cross-engine-reproducible (the DuckDB oracle refolds it in SQL) but
    Python-paced (~20 MB/s/core); for bulk 100 TB fingerprinting where
    engine-portability of the hash doesn't matter, use
    :func:`fingerprint_fast`.
    """

    @F.pandas_udf("bigint")
    def fp(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fingerprint_py(t or ""))

    return df.select("doc_id", fp(F.col(text_col)).alias("fingerprint"))


def fingerprint_fast(df: DataFrame, text_col: str = "text") -> DataFrame:
    """JVM-speed document fingerprint over normalized words: xxhash64 inside
    whole-stage codegen (GB/s/core) — the scale path when the hash only needs
    to be stable within the engine."""
    norm = F.array_join(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""),
        "\x1f",
    )
    return df.select("doc_id", F.xxhash64(norm).alias("fingerprint"))
