"""Training-data curation operators: deterministic sampling, PII scrubbing,
corpus n-gram statistics.

Standard large-scale pipeline stages that sit alongside dedup/quality in a
training-data flow. Design rules here:

  - Sampling is HASH-DETERMINISTIC, not rand(): results are reproducible
    across engines, runs, and parallelism (rand(seed) in Spark depends on
    partitioning), and the driver's DuckDB oracle can recompute them exactly
    (md5 hex is lexicographically comparable in both engines).
  - The fraction sampler is scan-local — a per-row hash threshold, NO
    shuffle; at 100 TB it's a free filter fused into whatever scan follows.
  - The exact top-n-per-stratum sampler is one window shuffle on the strata
    key (use it for small-cardinality strata; heavy single strata skew the
    window — prefer the fraction sampler at extreme scale).
  - PII scrubbing is a chain of JVM regexp_replace (codegen, no UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 6  # 6 hex digits of md5 = the sampling resolution


def hash_keep(id_col, fraction: float) -> F.Column:
    """Deterministic keep-predicate: md5(id) below the fraction boundary of
    the 6-hex-digit prefix space. Engine-portable (md5 hex compares
    lexicographically the same everywhere).

    fraction >= 1 / <= 0 short-circuit to keep-all / keep-none: the
    boundary for 1.0 would format as 7 hex chars ('1000000') and the
    lexicographic compare would silently keep only hashes starting '0'."""
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    threshold = format(int(fraction * _HEX_SPACE), "06x")
    return F.md5(F.col(id_col).cast("string")) < threshold


def sample_fraction(
    df: DataFrame,
    fraction: float | dict[str, float],
    id_col: str = "doc_id",
    strata_col: str | None = None,
) -> DataFrame:
    """Hash-deterministic row sampling; ``fraction`` may be a per-stratum
    dict (stratified rates, e.g. downsample crawl data but keep all books).
    Scan-local: no shuffle, reproducible at any parallelism."""
    if isinstance(fraction, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        pred = F.lit(False)
        for stratum, frac in fraction.items():
            pred = F.when(
                F.col(strata_col) == stratum, hash_keep(id_col, frac)
            ).otherwise(pred)
        return df.where(pred)
    return df.where(hash_keep(id_col, fraction))


def sample_per_stratum(
    df: DataFrame,
    strata_cols: list[str],
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly n rows per stratum, picked by deterministic md5 rank (the
    reproducible reservoir-sample). One window shuffle on the strata key."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )


# Ordered scrub rules: (name, java/RE2-compatible regex, replacement).
# Patterns deliberately use only syntax with identical semantics in Java
# regex and RE2 (no backrefs, no lookaround) so oracles can replay them.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Greedy token-budget selection: take documents best-quality-first
    (ties broken by ``id_col``) while the cumulative token count stays
    within ``budget_tokens`` — the "top-quality docs until N tokens"
    step every training-data mix ends with. Strict prefix semantics:
    once a doc overshoots the budget, it and everything after it is
    excluded (no bin-packing), so the selection is a pure deterministic
    function of the ordering. Returns (id_col, n_tokens, cum_tokens).

    ``token_col`` supplies a precomputed per-doc token count (e.g.
    encode_bpe_ids sizes); default is the whitespace token count.
    ``quality_col`` None = ascending ``id_col`` order (corpus-prefix).

    Scale shape: the cumulative sum is the classic two-pass running sum
    — range-partition on the selection order, per-partition token
    totals, tiny driver cumulative offsets, in-partition cumsum — NO
    partition-less window; partitions whose offset already exceeds the
    budget short-circuit without scanning rows.
    """
    from clpspark.operators.text import tokenize_whitespace
    from clpspark.operators.util import rebalance_for_udf

    # the selection-order projection (tokenize + quality) is CPU work that
    # would otherwise run TWICE on a 1-2-split scan: once in
    # repartitionByRange's range-bounds sampling job and once in the
    # exchange itself — rebalance first so both run wide (no-op at scale)
    df = rebalance_for_udf(df)
    spark = df.sparkSession
    ntok = (F.col(token_col) if token_col
            else F.size(tokenize_whitespace(F.col(text_col))))
    cols = [F.col(id_col), ntok.cast("long").alias("n_tokens")]
    order = [F.col(id_col).asc()]
    if quality_col is not None:
        cols.append(F.col(quality_col))
        order = [F.col(quality_col).desc(), F.col(id_col).asc()]
    sel = df.select(*cols)
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # _pid is baked into the DATA during the eager checkpoint (its own
    # stage, so spark_partition_id() == the range-partition index there).
    # TaskContext.partitionId() would be WRONG downstream: when the final
    # mapInPandas stage is consumed inside a union, stage partition ids
    # renumber across the union's children and an id-keyed offset lookup
    # silently misses.
    part = (
        sel.repartitionByRange(npart, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin rows across the two passes
    )

    def _totals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, int] = {}
        for pdf in batches:
            for p, t in pdf.groupby("_pid")["n_tokens"].sum().items():
                acc[int(p)] = acc.get(int(p), 0) + int(t)
        if acc:
            yield pd.DataFrame(
                {"pid": list(acc), "total": list(acc.values())}
            )

    rows = sorted(
        part.mapInPandas(_totals, "pid int, total long").collect(),
        key=lambda r: r["pid"],
    )  # bounded: one row per partition (range order == pid order)
    offsets: dict[int, int] = {}
    running = 0
    for r in rows:
        offsets[r["pid"]] = running
        running += r["total"]

    budget = int(budget_tokens)

    def _take(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cum: int | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cum is None:
                cum = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            if cum > budget:
                return  # whole partition past the budget
            inc = pdf["n_tokens"].cumsum() + cum
            keep = inc <= budget
            out = pdf.loc[keep, [id_col, "n_tokens"]].copy()
            out["cum_tokens"] = inc[keep]
            cum = int(inc.iloc[-1]) if len(inc) else cum
            if len(out):
                yield out
            if not bool(keep.iloc[-1]):
                return  # prefix ended inside this batch

    schema = df.select(F.col(id_col)).schema[0].dataType.simpleString()
    return part.mapInPandas(
        _take, f"{id_col} {schema}, n_tokens long, cum_tokens long"
    )


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Redact emails / SSNs / IPv4s with typed placeholders — pure JVM
    regexp_replace chain (whole-stage codegen, no UDF)."""
    col = F.col(text_col)
    for _, pat, repl in PII_RULES:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col or text_col, col)


def _gram_udf(n: int):
    """array<string> word n-grams of a text column — one Arrow pass (HOF
    shingle builders re-evaluate the split per element, the documented
    Catalyst projection-collapse trap)."""

    @F.pandas_udf("array<string>")
    def grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.tolist():
            words = (t or "").split()
            out.append(
                [" ".join(words[i:i + n])
                 for i in range(len(words) - n + 1)]
            )
        return pd.Series(out)

    return grams


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: training docs sharing any word ``n``-gram
    with an eval/benchmark set (the standard n-gram-overlap test-set leak
    check in pretraining pipelines).

    Returns (id_col, n_shared_ngrams) for contaminated docs only.

    Scale shape: the benchmark is small by nature → its distinct grams
    BROADCAST (the same driver/executor memory profile a broadcast join
    build side has); the training side is ONE scan with the shared-gram
    count computed scan-locally against the broadcast set — no explode of
    the corpus into per-gram rows, no join, no distinct shuffle: the
    surviving (doc, count) rows are the only thing past the scan. At
    100 TB the cost is the one pass over the training text.
    """
    from clpspark.operators.util import rebalance_for_udf

    spark = docs.sparkSession
    grams = _gram_udf(n)
    # distinct BEFORE collect (map-side dedup bounds the driver transfer
    # to distinct grams — a boilerplate-heavy benchmark repeats grams
    # many times over); no rebalance: the benchmark is small by contract
    bench_rows = (
        benchmark.select(F.explode(grams(F.col(text_col))).alias("gram"))
        .distinct()
        .collect()
    )
    bench_bc = spark.sparkContext.broadcast(
        frozenset(r["gram"] for r in bench_rows)
    )
    nn = n

    @F.pandas_udf("long")
    def n_shared(texts: pd.Series) -> pd.Series:
        bench_set = bench_bc.value
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.tolist()):
            words = (t or "").split()
            if len(words) < nn:
                continue
            doc_grams = {
                " ".join(words[j:j + nn])
                for j in range(len(words) - nn + 1)
            }
            out[i] = len(doc_grams & bench_set)
        return pd.Series(out)

    return (
        rebalance_for_udf(docs.select(id_col, text_col))
        .select(id_col, n_shared(F.col(text_col)).alias("n_shared_ngrams"))
        .where(F.col("n_shared_ngrams") > 0)
    )


def dedup_lines(
    docs: DataFrame,
    max_occurrences: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """C4-style cross-corpus repeated-line removal: any line occurring more
    than ``max_occurrences`` times in the whole corpus keeps only its
    globally FIRST instance (ordered by (doc, position)); docs are
    reassembled with order preserved. Docs whose every line is removed drop
    out of the result.

    Scale shape: NO line text ever shuffles. Instances are ranked under a
    window keyed by a 128-bit digest pair of the line (two independent
    xxhash64 seeds — collision odds are negligible below ~2^60 distinct
    lines, far past 100 TB), shipping only (digests, doc, pos) rows; the
    over-occurring instances form a small per-doc drop-list that joins
    back, and each doc is rebuilt IN PLACE by index-filtering its own
    split — one narrow shuffle + one small join, document text stays put.

    ``sep`` is a REGEX (it feeds F.split); for faithful reassembly it must
    also be its own literal (true for the default ``"\\n"``) — a
    metacharacter pattern splits consistently but cannot be rejoined.
    """
    # digest PAIR order matters: Spark's xxhash64 folds arguments left to
    # right with the running hash as seed, so xxhash64(line, lit(1)) would
    # be a pure function of xxhash64(line) — zero extra entropy. Putting
    # the salt FIRST makes it the seed of an independent 64-bit hash.
    keyed = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).select(
        id_col,
        "pos",
        F.xxhash64("line").alias("_h1"),
        F.xxhash64(F.lit(1), F.col("line")).alias("_h2"),
    )
    part = Window.partitionBy("_h1", "_h2")
    ranked = keyed.select(
        id_col,
        "pos",
        F.row_number().over(part.orderBy(id_col, "pos")).alias("_rn"),
        F.count("*").over(part).alias("_cnt"),
    )
    drops = (
        ranked.where(
            (F.col("_cnt") > max_occurrences) & (F.col("_rn") > 1)
        )
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_drop"))
    )

    # Arrow-batched rebuild (per the repo's HOF guidance: interpreted
    # per-element array_contains over a possibly-large drop set is the
    # pathological class; a vectorized pass over (text, drop-set) is not)
    @F.pandas_udf("string")
    def rebuild(text: pd.Series, drop: pd.Series) -> pd.Series:
        # split with the SAME regex semantics as the position-assigning
        # F.split — a literal str.split would mis-index for any sep with
        # regex metacharacters (sep is a regex throughout this function)
        import re as _re

        rx = _re.compile(sep)
        out = []
        for t, d in zip(text, drop):
            if d is None:  # CASE WHEN still evaluates the batch UDF branch
                out.append(t)
                continue
            ds = {int(x) for x in d}
            out.append(
                sep.join(
                    line
                    for i, line in enumerate(rx.split(t or ""))
                    if i not in ds
                )
            )
        return pd.Series(out, dtype=object)

    joined = docs.join(drops, id_col, "left")
    # a doc disappears only when dedup removed EVERY one of its lines;
    # untouched docs pass through verbatim (empty docs included — the
    # old length() filter silently dropped legitimately-empty texts)
    n_lines = F.size(F.split(F.col(text_col), sep))
    return (
        joined.where(
            F.col("_drop").isNull() | (F.size("_drop") < n_lines)
        )
        .withColumn(
            text_col,
            F.when(F.col("_drop").isNull(), F.col(text_col)).otherwise(
                rebuild(F.col(text_col), F.col("_drop"))
            ),
        )
        .select(id_col, text_col)
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: within each shard, docs are concatenated
    in id order into a token stream that is sliced every ``budget`` tokens;
    a doc straddling a slice boundary contributes to both packs. Returns one
    row per (doc, pack) with the tokens that (doc, pack) cell holds — the
    exact feed plan for fixed-length pretraining batches.

    Scale shape: one cumulative-sum window per shard — shards are the
    parallel unit, exactly how packing runs in production (each output
    shard is packed independently). No UDF, no driver state.
    """
    n_tok = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                            lambda x: x != ""))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = docs.select(
        shard_col, id_col, n_tok.alias("n_tokens")
    ).withColumn("_end", F.sum("n_tokens").over(w))
    spans = spans.where(F.col("n_tokens") > 0).withColumn(
        "_start", F.col("_end") - F.col("n_tokens")
    )
    b = F.lit(budget)
    first_p = F.floor(F.col("_start") / b)
    last_p = F.floor((F.col("_end") - 1) / b)
    exploded = spans.select(
        shard_col,
        id_col,
        "n_tokens",
        F.explode(F.sequence(first_p, last_p)).alias("pack_id"),
        "_start",
        "_end",
    )
    contrib = (
        F.least(F.col("_end"), (F.col("pack_id") + 1) * b)
        - F.greatest(F.col("_start"), F.col("pack_id") * b)
    )
    return exploded.select(
        shard_col, id_col, "n_tokens", "pack_id",
        contrib.cast("long").alias("pack_tokens"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts (vocabulary/contamination
    inspection). N-grams materialize in ONE Arrow pass (building them with
    higher-order functions re-evaluates the split per element — the
    documented Catalyst projection-collapse trap); the count is a standard
    partial/final hash aggregation on the exploded grams.
    """

    def grams(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[text_col].tolist():
                words = (t or "").split()
                out.append(
                    [" ".join(words[i:i + n])
                     for i in range(len(words) - n + 1)]
                )
            yield pd.DataFrame({"grams": out})

    from clpspark.operators.util import rebalance_for_udf

    exploded = rebalance_for_udf(df.select(text_col)).mapInPandas(
        grams, schema="grams array<string>"
    ).select(F.explode("grams").alias("ngram"))
    return (
        exploded.groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "ngram")
        .limit(k)
    )


def dedup_spans(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every k-word window that
    occurs more than once in the corpus is duplicated text; all but its
    globally FIRST occurrence (ordered by (doc_id, position)) are cut from
    the documents. Word-level windows are the distributed analog of the
    paper's suffix-array 50-token spans.

    Returns (doc_id, clean_text, n_words, n_removed): the document with
    every word covered by a non-first duplicated-window occurrence
    removed, and the removal count. A word survives unless some removed
    window occurrence covers it — self-consistent, engine-reproducible
    semantics (a SQL oracle can replay it exactly).

    Scale shape: windows build from ONE posexplode + per-doc lead window
    (codegen, no interpreted HOF over big arrays); the duplicate decision
    is a single shuffle keyed on the window text with a rank-1 window to
    pick the first occurrence; covered positions explode to at most
    k x duplicate-occurrences rows; the rebuild is one per-doc
    collect_list. Nothing is quadratic; only duplicated spans fan out.
    (At extreme scale, key the shuffle on xxhash64(window) instead of the
    window text — 8 bytes vs ~k words; kept as text here so independent
    engines reproduce results without a shared hash.)
    """
    from clpspark.operators.text import tokenize_whitespace

    words = tokenize_whitespace(F.col(text_col))
    lw = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "w")
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("w"), *[F.lead("w", i).over(win) for i in range(1, k)]
    )
    complete = F.lead("w", k - 1).over(win).isNotNull()
    occ = lw.select(
        id_col, "pos", gram.alias("gram"), complete.alias("_ok")
    ).where("_ok").drop("_ok")

    # rank >= 2 already implies the gram occurs >= 2 times — no separate
    # count window needed
    gwin = Window.partitionBy("gram").orderBy(id_col, "pos")
    ranked = occ.select(
        id_col, "pos", F.row_number().over(gwin).alias("_rn")
    )
    removed = ranked.where(F.col("_rn") >= 2)
    covered = removed.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("pos"),
    ).distinct()

    kept = lw.join(covered, [id_col, "pos"], "left_anti")
    # array-of-struct field read (GetArrayStructFields) — codegen, not an
    # interpreted per-element HOF (CLAUDE.md rule)
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.array_sort(F.collect_list(F.struct("pos", "w")))["w"],
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    base = docs.select(id_col, F.size(words).cast("long").alias("n_words"))
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_words",
            (F.col("n_words") - F.coalesce("_kept", F.lit(0)))
            .alias("n_removed"),
        )
    )


# --------------------------------------------------------------- DSIR


_DSIR_MEMO_MAX = 1 << 20  # bound the per-worker token-bucket memo (OOM guard)


def dsir_feature_buckets(text_col: str, n_buckets: int) -> F.Column:
    """Hashed-ngram feature column for DSIR (Xie et al. 2023 §3):
    whitespace unigrams + bigrams of ``text_col``, each mapped to
    ``hash % n_buckets`` with the 61-bit oracle-replayable polynomial
    word hash (bigrams hash the ``w1<US>w2`` join, US = 0x1f, the
    corpus-wide word separator the fingerprint uses). One bucket id per
    feature occurrence. The per-worker memo maps token -> bucket with a
    size cap (OOM guard on unbounded vocabularies); a warm dict hit is
    ~10x faster here than np.unique-batched hashing (measured: sorting
    the object array dominates when vocabulary repeats heavily)."""
    from clpspark.operators.text import word_hash_py

    memo: dict[str, int] = {}

    @F.pandas_udf("array<long>")
    def feats(s: pd.Series) -> pd.Series:
        def one(t: str | None) -> list[int]:
            ws = (t or "").split()
            toks = ws + [ws[i] + "\x1f" + ws[i + 1]
                         for i in range(len(ws) - 1)]
            out = []
            for w in toks:
                b = memo.get(w)
                if b is None:
                    b = word_hash_py(w) % n_buckets
                    if len(memo) < _DSIR_MEMO_MAX:
                        memo[w] = b
                out.append(b)
            return out

        return s.map(one)

    return feats(F.col(text_col))


def dsir_log_weights(
    corpus: DataFrame,
    target: DataFrame | F.Column,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit hashed-ngram bag
    models p (target domain) and q (raw corpus) with add-alpha smoothing,
    then score every corpus doc with log w = sum over its feature
    occurrences of log p(b) - log q(b). Returns (id_col, log_weight).

    ``target`` is either a separate DataFrame (out-of-corpus target
    domain) or a boolean Column over the corpus (in-corpus target slice)
    — the Column form computes BOTH bucket distributions in one corpus
    scan via a conditional aggregate.

    Scale shape (100 TB): the bucket distributions aggregate with
    map-side partial aggregation down to <= n_buckets rows each — the
    only collects are those bounded tables; the log-ratio vector rides
    to executors inside the UDF closure (n_buckets doubles); per-doc
    scoring is scan-local (no shuffle, no join). The corpus is scanned
    once for distributions (twice when target is a DataFrame) plus once
    for scoring — re-scanning columnar storage beats caching a 100 TB
    projection (CLAUDE.md persist rule).
    """
    import math

    from clpspark.operators.util import rebalance_for_udf

    corpus = rebalance_for_udf(corpus)
    if not isinstance(target, F.Column):
        target = rebalance_for_udf(target)
    feat_col = dsir_feature_buckets(text_col, n_buckets)

    def dist(df: DataFrame) -> dict[int, int]:
        rows = (
            df.select(F.explode(feat_col).alias("b"))
            .groupBy("b")
            .count()
            .collect()
        )
        return {int(r["b"]): int(r["count"]) for r in rows}

    if isinstance(target, F.Column):
        rows = (
            corpus.select(F.explode(feat_col).alias("b"),
                          target.alias("_t"))
            .groupBy("b")
            .agg(
                F.count(F.lit(1)).alias("_r"),
                F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_tc"),
            )
            .collect()
        )
        raw = {int(r["b"]): int(r["_r"]) for r in rows}
        tgt = {int(r["b"]): int(r["_tc"]) for r in rows if r["_tc"]}
    else:
        tgt = dist(target)
        raw = dist(corpus)
    t_total = sum(tgt.values())
    r_total = sum(raw.values())
    if t_total == 0 or r_total == 0:
        raise ValueError("DSIR needs non-empty target and corpus text")
    ratio = np.zeros(n_buckets, dtype=np.float64)
    for b in range(n_buckets):
        p = (tgt.get(b, 0) + alpha) / (t_total + alpha * n_buckets)
        q = (raw.get(b, 0) + alpha) / (r_total + alpha * n_buckets)
        ratio[b] = math.log(p) - math.log(q)

    @F.pandas_udf("double")
    def logw(buckets: pd.Series) -> pd.Series:
        lens = np.array([len(b) for b in buckets], dtype=np.int64)
        out = np.zeros(len(lens), dtype=np.float64)
        ne = lens > 0
        if ne.any():
            flat = np.concatenate(
                [np.asarray(b, dtype=np.int64) for b in buckets if len(b)])
            offsets = np.concatenate(([0], np.cumsum(lens[ne])[:-1]))
            out[ne] = np.add.reduceat(ratio[flat], offsets)
        return pd.Series(out)

    return corpus.select(
        F.col(id_col), logw(feat_col).alias("log_weight")
    )


_HEX12 = float(16 ** 12)


def gumbel_key(id_col: str, logw_col: str = "log_weight") -> F.Column:
    """Deterministic Gumbel-top-k sampling key: log w + Gumbel(0,1) with
    the noise derived from md5(id) (u = (first-12-hex + 0.5) / 16^12,
    g = -ln(-ln u)) — reproducible across engines and parallelism, like
    every sampler here. Top-k of this key IS sampling without
    replacement proportional to w (Gumbel-max trick)."""
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_HEX12)
    return F.col(logw_col) - F.log(-F.log(u))


def dsir_select(
    corpus: DataFrame,
    target: DataFrame | F.Column,
    k: int,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full DSIR selection: importance log-weights + Gumbel top-k resample
    of ``k`` docs. Returns (id_col, log_weight, gumbel_key), highest key
    first. The top-k is a bounded TakeOrderedAndProject — no global
    sort materializes at scale."""
    scored = dsir_log_weights(
        corpus, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col,
    )
    return (
        scored.withColumn("gumbel_key", gumbel_key(id_col))
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )


# --------------------------------------------------- text normalization


def normalize_text(df: DataFrame, text_col: str = "text",
                   lowercase: bool = True,
                   collapse_whitespace: bool = True,
                   form: str | None = "NFC") -> DataFrame:
    """Unicode + whitespace normalization — the canonicalization step that
    precedes dedup/decontamination in training pipelines (equivalent
    strings must hash equally: 'é' composed vs 'e'+combining-accent are
    different byte strings until NFC). Unicode normalization is an
    Arrow-batched unicodedata UDF (Spark 4.1 has no built-in normalize;
    the UDF is scan-local and fuses with downstream hashing); lowercasing
    and whitespace collapse are plain codegen expressions. Replaces
    ``text_col`` in place; other columns pass through. The DuckDB oracle
    replays NFC via its native ``nfc_normalize``."""
    col = F.col(text_col)
    if form:
        import unicodedata

        nform = form

        @F.pandas_udf("string")
        def norm(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: unicodedata.normalize(nform, t)
                if t is not None else None
            )

        col = norm(col)
    if lowercase:
        col = F.lower(col)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.withColumn(text_col, col)
