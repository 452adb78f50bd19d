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


def _token_count_cols(text_col: str) -> dict[str, F.Column]:
    words = tokenize_whitespace(F.col(text_col))
    subwords = F.regexp_count(
        F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    )
    return {
        "n_words": F.size(words),
        "n_subwords": subwords,
        "n_chars_calc": F.length(F.col(text_col)),
    }


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword count (regex segments:
    runs of letters, runs of digits, single other non-space chars)."""
    cols = _token_count_cols(text_col)
    return df.select("doc_id", *[c.alias(k) for k, c in cols.items()])


def _quality_cols(text_col: str) -> dict[str, F.Column]:
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
    return {
        "n_words": n_words,
        "n_distinct_words": n_distinct,
        "avg_word_len": avg_wlen,
        "type_token_ratio": ttr,
        "digit_ratio": digit_ratio,
        "quality_score": score,
    }


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / distinct-ratio / word-shape quality metrics + composite score.

    Deterministic, engine-portable formula (rounded) so the oracle can verify.
    """
    cols = _quality_cols(text_col)
    return df.select("doc_id", *[c.alias(k) for k, c in cols.items()])


def quality_score_col(text_col: str = "text") -> F.Column:
    """The composite quality score as a scan-local Column — attach it with
    withColumn instead of joining quality_score(df) back on doc_id (that
    join shuffles the corpus twice for a value computable in the scan)."""
    return _quality_cols(text_col)["quality_score"]


def _lang_cols(text_col: str) -> dict[str, F.Column]:
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
    out = {f"hits_{lang}": hit_cols[lang] for lang in sorted(hit_cols)}
    out["lang_pred"] = best
    return out


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic; deterministic tie-break by lang code.

    hits(lang) = number of distinct lang stopwords present among the words;
    predicted = lang with max hits ('und' = undetermined when all zero).
    """
    cols = _lang_cols(text_col)
    return df.select(
        "doc_id", *[c.alias(k) for k, c in cols.items()]
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

    from clpspark.operators.util import rebalance_for_udf

    return rebalance_for_udf(df.select("doc_id", text_col)).select(
        "doc_id", fp(F.col(text_col)).alias("fingerprint"))


def fingerprint_fast(df: DataFrame, text_col: str = "text") -> DataFrame:
    """JVM-speed document fingerprint over normalized words: xxhash64 inside
    whole-stage codegen (GB/s/core) — the scale path when the hash only needs
    to be stable within the engine."""
    norm = F.array_join(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""),
        "\x1f",
    )
    return df.select("doc_id", F.xxhash64(norm).alias("fingerprint"))

# Gopher quality-filter rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1) + C4-style
# flags (Raffel et al. 2020 heuristics). Published thresholds:
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_TOP_NGRAM_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}


def _r6(col) -> F.Column:
    return F.round(col, 6)


def _frac(num, den) -> F.Column:
    return F.when(den > 0, _r6(num / den)).otherwise(F.lit(0.0))


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc Gopher/C4 quality-filter metrics + the combined pass flag.

    One row per doc: word-shape rules (symbol-to-word ratio for '#'/
    ellipsis, alphabetic-word fraction, Gopher-stopword hit count), line
    rules over newline-split lines (bullet-start / ellipsis-end /
    terminal-punctuation fractions; duplicate-line and duplicate-line-char
    fractions), repetition rules (top 2/3/4-gram character fraction over
    lowercased words), C4 flags (curly brace, 'lorem ipsum'), and
    ``gopher_pass`` = AND of the published thresholds (word count and mean
    word length bounds included).

    Shape: scalar and line-flag metrics are one codegen'd projection (HOFs
    only over the tiny per-doc line array); the duplicate-line and
    top-n-gram metrics partial-aggregate through explode->count shuffles
    keyed on (doc_id, line|gram) — no per-doc state, no driver loops, so a
    doc with millions of lines streams through combiners. Fractions are
    rounded to 6 places from integer-derived doubles so a DuckDB oracle
    reproduces them bit-for-bit.
    """
    base = df.select(
        "doc_id",
        *[c.alias(k) for k, c in _gopher_scalar_cols(text_col).items()],
    )
    return _gopher_assemble(base, df, text_col).select(
        "doc_id",
        "symbol_word_ratio", "alpha_word_frac", "stopword_hits",
        "bullet_line_frac", "ellipsis_line_frac",
        "terminal_punct_line_frac",
        "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "top_3gram_char_frac",
        "top_4gram_char_frac",
        "has_curly_brace", "has_lorem_ipsum",
        "gopher_pass",
    )


def _gopher_scalar_cols(text_col: str) -> dict[str, F.Column]:
    """Gopher/C4 metrics computable in one row-wise projection (incl. the
    internal _nw/_mwl word-shape bounds gopher_pass tests)."""
    text = F.col(text_col)
    words = tokenize_whitespace(text)
    n_words = F.size(words)
    sum_wlen = F.aggregate(words, F.lit(0), lambda a, x: a + F.length(x))
    mean_wlen = _frac(sum_wlen, n_words)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)

    n_hash = F.regexp_count(text, F.lit("#"))
    n_ellipsis = (F.regexp_count(text, F.lit(r"\.\.\."))
                  + F.regexp_count(text, F.lit("…")))
    symbol_ratio = _frac(n_hash + n_ellipsis, n_words)
    alpha_frac = _frac(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))), n_words
    )
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(tokenize_whitespace(F.lower(text))),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
    ))

    def line_frac(pred) -> F.Column:
        return _frac(F.size(F.filter(lines, pred)), n_lines)

    bullet_frac = line_frac(
        lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•")
    )
    ellipsis_frac = line_frac(
        lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…")
    )
    terminal_frac = line_frac(
        lambda l: F.substring(F.rtrim(l), -1, 1).isin(".", "!", "?", '"')
    )
    return {
        "_nw": n_words,
        "_mwl": mean_wlen,
        "symbol_word_ratio": symbol_ratio,
        "alpha_word_frac": alpha_frac,
        "stopword_hits": stop_hits,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "terminal_punct_line_frac": terminal_frac,
        "has_curly_brace": text.contains("{"),
        "has_lorem_ipsum": F.lower(text).contains("lorem ipsum"),
    }


def _gopher_line_agg(df: DataFrame, text_col: str) -> DataFrame:
    """Duplicate-line fractions: explode -> (doc, line) counts -> per-doc
    rollup. dup_line_frac = (lines - distinct lines) / lines;
    dup_line_char_frac = chars of lines occurring >1 (all occurrences)
    over all line chars."""
    lines = F.split(F.col(text_col), "\n")
    lx = df.select("doc_id", F.explode(lines).alias("line"))
    per_line = lx.groupBy("doc_id", "line").agg(F.count("*").alias("cnt"))
    return per_line.groupBy("doc_id").agg(
        _frac(
            F.sum("cnt") - F.count("*"), F.sum("cnt")
        ).alias("dup_line_frac"),
        _frac(
            F.sum(F.when(F.col("cnt") > 1,
                         F.length("line") * F.col("cnt")).otherwise(0)),
            F.sum(F.length("line") * F.col("cnt")),
        ).alias("dup_line_char_frac"),
    )


def _gopher_tops(df: DataFrame, text_col: str) -> DataFrame:
    """Top n-gram char fraction: chars of the most frequent word n-gram
    (len(gram) x occurrence count — occurrences overlap in words, so the
    raw ratio can exceed 1 on degenerate repeats; clamped at 1.0, which
    keeps the filter monotone) over total text chars. Grams build from a
    posexplode + lead window (codegen'd, no interpreted HOF over big
    arrays); ties break on the lexically GREATEST gram (max_by struct)."""
    text = F.col(text_col)
    lw = df.select(
        "doc_id",
        F.length(text).alias("n_chars"),
        F.posexplode(tokenize_whitespace(F.lower(text))).alias("pos", "w"),
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy("pos")
    gram_cols = {}
    g = F.col("w")
    for n in (2, 3, 4):
        g = F.concat_ws(" ", g, F.lead("w", n - 1).over(win))
        gram_cols[n] = g
    # ALL three gram lengths melt out of ONE window pass (a per-n groupBy
    # would re-execute the posexplode + window three times), then one
    # count shuffle + one max_by shuffle + a conditional pivot back to
    # columns.
    grams = lw.select(
        "doc_id", "n_chars",
        *[gram_cols[n].alias(f"g{n}") for n in (2, 3, 4)],
        *[(F.lead("w", n - 1).over(win).isNotNull()).alias(f"ok{n}")
          for n in (2, 3, 4)],
    )
    # explode (a generator) cannot share an operator with the window
    # expressions above — project them first
    melted = grams.select(
        "doc_id", "n_chars",
        F.explode(F.array(*[
            F.when(
                F.col(f"ok{n}"),
                F.struct(F.lit(n).alias("n"),
                         F.col(f"g{n}").alias("gram")),
            )
            for n in (2, 3, 4)
        ])).alias("m"),
    ).where(F.col("m").isNotNull()).select(
        "doc_id", "n_chars", "m.n", "m.gram"
    )
    per_n = (
        melted.groupBy("doc_id", "n_chars", "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id", "n")
        .agg(F.least(F.lit(1.0), _frac(
            F.max_by(
                F.length("gram") * F.col("cnt"),
                F.struct(F.col("cnt"), F.col("gram")),
            ),
            F.first("n_chars"),
        )).alias("frac"))
    )
    return per_n.groupBy("doc_id").agg(*[
        F.max(F.when(F.col("n") == n, F.col("frac")))
        .alias(f"top_{n}gram_char_frac")
        for n in (2, 3, 4)
    ])


def _gopher_assemble(base: DataFrame, df: DataFrame,
                     text_col: str) -> DataFrame:
    """Join the two aggregate tables onto a projection that carries the
    scalar gopher columns (incl. _nw/_mwl), fill the no-word nulls, and
    append gopher_pass. Drops the internal _nw/_mwl bound columns."""
    out = (
        base.join(_gopher_line_agg(df, text_col), "doc_id", "left")
        .join(_gopher_tops(df, text_col), "doc_id", "left")
    )
    # docs with no words have no grams: a left join leaves nulls -> 0.0
    fills = {f"top_{n}gram_char_frac": 0.0 for n in (2, 3, 4)}
    fills.update({"dup_line_frac": 0.0, "dup_line_char_frac": 0.0})
    out = out.fillna(fills)

    gp = (
        (F.col("_nw") >= GOPHER_MIN_WORDS)
        & (F.col("_nw") <= GOPHER_MAX_WORDS)
        & (F.col("_mwl") >= GOPHER_MIN_MEAN_WLEN)
        & (F.col("_mwl") <= GOPHER_MAX_MEAN_WLEN)
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_line_frac") <= GOPHER_MAX_BULLET_FRAC)
        & (F.col("ellipsis_line_frac") <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
        & (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE_FRAC)
        & (F.col("dup_line_char_frac") <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
    )
    for n, cap in GOPHER_MAX_TOP_NGRAM_FRAC.items():
        gp = gp & (F.col(f"top_{n}gram_char_frac") <= cap)
    return out.withColumn("gopher_pass", gp).drop("_nw", "_mwl")


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The full text-analysis suite — token counting, quality scoring,
    language ID, and the Gopher/C4 rule set — in ONE pass over the corpus.

    Composing the four operators individually joins the same scan on
    doc_id once per operator: at 100 TB that is three avoidable
    full-corpus shuffles plus three redundant scans. Here every row-wise
    metric fuses into a single projection of one scan; only the two
    genuinely aggregating Gopher tables (duplicate-line stats, top-n-gram
    stats) join. Column set and values are identical to
    token_count ⋈ quality_score ⋈ lang_id ⋈ gopher_quality."""
    from clpspark.operators.util import rebalance_for_udf

    # the fused projection is CPU-heavy JVM work (array HOFs per row); a
    # small single-file parquet input arrives as 1-2 scan splits and would
    # strand it on as many cores — same guard as the Arrow stages
    df = rebalance_for_udf(df)
    tc = _token_count_cols(text_col)
    qc = _quality_cols(text_col)
    qc.pop("n_words")  # token_count already emits it
    lc = _lang_cols(text_col)
    gc = _gopher_scalar_cols(text_col)
    merged = {**tc, **qc, **lc, **gc}
    base = df.select(
        "doc_id", *[c.alias(k) for k, c in merged.items()]
    )
    return _gopher_assemble(base, df, text_col)


def compressibility(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Per-document zlib compressibility — the gzip-ratio quality signal
    production corpora filter on (Dolma §2.2 "gzip compression ratio",
    RefinedWeb repetition heuristics): highly compressible text is
    boilerplate/repetition, incompressible text is often binary noise or
    gibberish. Returns (id_col, n_bytes, n_compressed, compress_ratio)
    with ratio = raw/compressed (>= ~1, higher = more redundant).

    Arrow-batched; zlib is C-speed (~100 MB/s/core) and scan-local — no
    shuffle, fuses into whatever filter follows. Deterministic: zlib
    output at a fixed level is stable for a given input, and the pytest
    replay recomputes via the same stdlib."""
    import zlib

    @F.pandas_udf("struct<n_bytes: long, n_compressed: long>")
    def comp(s: pd.Series) -> pd.DataFrame:
        raw_lens, comp_lens = [], []
        for t in s:
            b = (t or "").encode("utf-8")
            raw_lens.append(len(b))
            comp_lens.append(len(zlib.compress(b, level)))
        return pd.DataFrame({"n_bytes": raw_lens, "n_compressed": comp_lens})

    out = df.select(id_col, comp(F.col(text_col)).alias("_c"))
    return out.select(
        id_col,
        F.col("_c.n_bytes").alias("n_bytes"),
        F.col("_c.n_compressed").alias("n_compressed"),
        F.round(F.col("_c.n_bytes") / F.col("_c.n_compressed"), 6)
        .alias("compress_ratio"),
    )


def tfidf_top_terms(df: DataFrame, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF — keyword extraction /
    topic signal for corpus triage. score = tf * (ln((N+1)/(df+1)) + 1),
    ties broken by term. Returns (id_col, term, tf, tfidf, rank).

    Scale shape: one shuffle for per-(doc, term) counts, one bounded agg
    over the term table for document frequencies (map-side combined to
    vocabulary size), one window partitioned BY DOCUMENT for the top-k
    (never global); N is a scalar count. All JVM/codegen — no python.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col),
        F.explode(tokenize_whitespace(F.lower(F.col(text_col))))
        .alias("term"),
    )
    tf = words.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    n_docs = df.select(id_col).distinct().count()
    scored = tf.join(dfreq, "term").select(
        id_col, "term", "tf",
        F.round(
            F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0))
                           + F.lit(1.0)),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
