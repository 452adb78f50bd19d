"""Tokenizer training and LM-based quality scoring — the token-side ops a
pretraining-data pipeline runs over a curated corpus.

Two published algorithms, Spark-first:

- BPE vocabulary training (Sennrich, Haddow & Birch 2016, "Neural Machine
  Translation of Rare Words with Subword Units"): learn a merge table from
  corpus word frequencies, then segment text with it. The full-corpus pass
  is ONE word-count shuffle; every merge iteration then runs over the word
  VOCAB table (distinct words + counts) — the classic scale shape, since
  the vocab is orders of magnitude smaller than the corpus and stays
  distributed (no driver residency of the vocabulary).

- n-gram LM perplexity scoring + bucketing (Wenzek et al. 2020, "CCNet:
  Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  score each document by the cross-entropy of an add-k-smoothed bigram LM
  trained on a reference slice of the corpus, then split into head /
  middle / tail perplexity buckets. CCNet keeps head+middle for training.
  Counts are plain shuffled aggregations; scoring is a join of per-doc
  bigrams against the count tables (AQE broadcasts them when small).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from clpspark.operators.text import tokenize_whitespace

__all__ = [
    "train_bpe", "encode_bpe", "bpe_segment_word", "bpe_vocab",
    "encode_bpe_ids", "lm_perplexity",
]

# end-of-word marker (Sennrich et al. §3.2: distinguishes "est" in
# "est</w>" from "est" mid-word so merges can't cross word boundaries)
END_OF_WORD = "</w>"


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the single
    full-corpus pass of BPE training."""
    return (
        docs.select(
            F.explode(tokenize_whitespace(F.lower(F.col(text_col))))
            .alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    sample_fraction: float | None = None,
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from the corpus. Returns the ordered merge
    list [(left, right), ...] (rank = position), stopping early when the
    best remaining pair occurs fewer than ``min_pair_count`` times.

    ``sample_fraction`` trains on a hash-deterministic document sample
    (curate.hash_keep — reproducible across runs/engines/partitionings),
    the standard practice at corpus scale: merge ranks converge on a
    fraction of the data, and the word-count pass is the only full-corpus
    scan you pay for.

    Each iteration: adjacent-symbol pair counts weighted by word frequency
    (distributed partial/final agg over the vocab table), a 1-row argmax
    with a DETERMINISTIC tie-break (count desc, then lexicographic pair),
    and a vectorized left-to-right greedy rewrite of the affected symbol
    sequences. The vocab table is localCheckpoint'd per iteration so the
    plan stays flat across merges (lineage would otherwise grow by one
    UDF + join per merge).

    The merge decisions themselves are inherently sequential (each argmax
    depends on the previous rewrite) — that is the algorithm, not a Spark
    limitation; all heavy work per step is distributed.
    """
    if sample_fraction is not None:
        from clpspark.operators import curate

        docs = curate.sample_fraction(
            docs, sample_fraction, id_col=id_col)
    vocab = _word_freqs(docs, text_col).select(
        "freq",
        F.concat(
            F.split("word", ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        n = F.size("syms")
        pairs = vocab.where(n >= 2).select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, n - 1).alias("l"),
                    F.slice("syms", 2, n - 1).alias("r"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))

        def _make_apply(left: str, right: str):
            lr = left + right

            @pandas_udf("array<string>")
            def _apply(s: pd.Series) -> pd.Series:
                def m(a):
                    out, i, size = [], 0, len(a)
                    while i < size:
                        if (i + 1 < size and a[i] == left
                                and a[i + 1] == right):
                            out.append(lr)
                            i += 2
                        else:
                            out.append(a[i])
                            i += 1
                    return out

                return s.apply(m)

            return _apply

        _apply = _make_apply(left, right)

        # previous iterations' checkpoint blocks are GC-released by the
        # ContextCleaner once this rebinding drops the last reference.
        # LAZY checkpoint: the next iteration's pair-count action
        # materializes it — one job per merge instead of two
        vocab = vocab.select(
            "freq", _apply("syms").alias("syms")
        ).localCheckpoint(eager=False)
    return merges


def bpe_segment_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Segment ONE word with a trained merge table: repeatedly apply the
    lowest-rank merge present (the canonical BPE encode loop)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) >= 2:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        ranked = [(rank[p], i) for i, p in enumerate(pairs) if p in rank]
        if not ranked:
            break
        best_rank = min(r for r, _ in ranked)
        left, right = next(p for p in pairs if rank.get(p) == best_rank)
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == left
                    and syms[i + 1] == right):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bpe_tokens, n_bpe_tokens): segment each document with a
    trained merge table. The table (≤ num_merges entries, a user-bounded
    constant) ships in the UDF closure — broadcast, never shuffled; each
    distinct word per Arrow batch is segmented once (memo)."""
    rank = {p: i for i, p in enumerate(merges)}

    import re

    # EXACTLY the training tokenization (tokenize_whitespace = Java \s+
    # without UNICODE_CHARACTER_CLASS): python's \s is unicode-aware and
    # would split NBSP etc. into words the merge table never saw
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(text: str | None) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in java_ws.split(text):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = bpe_segment_word(w, rank)
                out.extend(got)
            return out

        return texts.apply(enc)

    # lowercase JVM-side: exact parity with train_bpe's F.lower (python
    # str.lower differs on a few unicode points)
    from clpspark.operators.util import rebalance_for_udf

    return rebalance_for_udf(docs.select(id_col, text_col)).select(
        id_col, seg(F.lower(F.col(text_col))).alias("bpe_tokens")
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))


_START = "<s>"
_UNK = "<unk>"


def lm_perplexity(
    docs: DataFrame,
    train_filter: F.Column | None = None,
    add_k: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style LM quality scoring: per-doc bigram cross-entropy and
    perplexity under an add-k-smoothed bigram LM, plus the head/middle/
    tail perplexity bucket (threshold split at the exact tercile cut
    values — CCNet itself buckets on percentile thresholds, Wenzek 2020
    §4.3).

    ``train_filter`` selects the reference slice the LM trains on (CCNet
    trains on Wikipedia; e.g. ``F.col("lang") == "en"``); default trains
    on the whole corpus. Scoring maps words unseen in training to <unk>
    (V = train vocab + 1). Docs with no tokens are excluded (no events to
    score).

    p(w | prev) = (c(prev, w) + k) / (ctx(prev) + k·V), ctx from the
    bigram table itself (sum over following words), each doc prepended
    with <s>. Per-term ln p rounds to 9 places and the final xent/ppl to
    6 so an independent SQL engine reproduces the values bit-for-bit.

    Scale shape: two count shuffles (bigram, context) + one per-doc
    bigram join (AQE broadcasts small LMs) + one agg back to docs. The
    tercile split is TWO percentile_approx cut points (one tree-reduced
    aggregation) broadcast onto the scored docs — no partition-less
    Window anywhere; below 10^6 docs the sketch holds every sample and
    the cut points are the exact order statistics at rank ceil(p*n)
    (ties at a threshold share its bucket).
    """
    from clpspark.operators.util import rebalance_for_udf

    # the bigram explode fans each doc into ~n_tokens rows and feeds the
    # partial count aggregation: on a 1-2-split parquet scan all of that
    # ran on 1-2 cores — rebalance first (no-op at real input sizes)
    docs = rebalance_for_udf(docs)
    toks = tokenize_whitespace(F.lower(F.col(text_col)))
    base = docs.select(id_col, toks.alias("toks")).where(F.size("toks") > 0)

    def bigrams(df: DataFrame, cols: list[str]) -> DataFrame:
        """(prev, w) per position, <s>-prepended — SCAN-LOCAL: the previous
        token is just element_at(toks, pos) (1-based = pos-1 in 0-based),
        so no Window.partitionBy(doc).orderBy(pos) — the lag formulation
        shuffled every (doc, pos, token) row on doc_id twice per call
        (train + score) only to look one element back in an array the row
        already holds."""
        ex = df.select(
            *cols, F.col("toks"), F.posexplode("toks").alias("pos", "w")
        )
        return ex.select(
            *cols,
            F.when(F.col("pos") == 0, F.lit(_START))
            .otherwise(F.element_at("toks", F.col("pos")))
            .alias("prev"),
            "w",
        )

    train = base if train_filter is None else (
        docs.where(train_filter)
        .select(id_col, toks.alias("toks"))
        .where(F.size("toks") > 0)
    )
    tb = bigrams(train, [id_col])
    big = tb.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = big.groupBy("prev").agg(F.sum("c_bg").alias("c_ctx"))
    vocab = train.select(F.explode("toks").alias("w")).distinct()
    v_size = vocab.count() + 1  # +1: <unk>

    # score: map OOV words (and OOV contexts) to <unk>; <s> is always a
    # known context when training saw at least one doc
    known = vocab.withColumn("_known", F.lit(True))
    sb = bigrams(base, [id_col])
    sb = (
        sb.join(known.withColumnRenamed("w", "prev"), "prev", "left")
        .withColumn(
            "prev",
            F.when(
                F.col("_known").isNotNull() | (F.col("prev") == _START),
                F.col("prev"),
            ).otherwise(F.lit(_UNK)),
        )
        .drop("_known")
        .join(known, "w", "left")
        .withColumn(
            "w",
            F.when(F.col("_known").isNotNull(), F.col("w"))
            .otherwise(F.lit(_UNK)),
        )
        .drop("_known")
    )
    k = F.lit(float(add_k))
    kv = F.lit(float(add_k) * v_size)
    scored = (
        sb.join(big, ["prev", "w"], "left")
        .join(ctx, "prev", "left")
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c_bg"), F.lit(0)) + k)
                    / (F.coalesce(F.col("c_ctx"), F.lit(0)) + kv)
                ),
                9,
            ).alias("lnp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(-F.sum("lnp") / F.count(F.lit(1)), 6).alias("lm_xent"),
        F.count(F.lit(1)).alias("n_lm_tokens"),
    ).withColumn("lm_ppl", F.round(F.exp("lm_xent"), 6))
    # tercile cut points: percentile_approx is exact (value at rank
    # ceil(p*n), empirically pinned across sizes) while the sketch holds
    # all samples — one scalable aggregation instead of funneling every
    # scored doc through a single global-sort ntile task
    thr = per_doc.agg(
        F.percentile_approx(
            "lm_ppl", F.array(F.lit(1.0 / 3.0), F.lit(2.0 / 3.0)),
            F.lit(1_000_000),
        ).alias("_t")
    ).select(F.col("_t")[0].alias("_t1"), F.col("_t")[1].alias("_t2"))
    bucket = (
        F.when(F.col("lm_ppl") <= F.col("_t1"), F.lit("head"))
        .when(F.col("lm_ppl") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return per_doc.crossJoin(F.broadcast(thr)).select(
        id_col, "n_lm_tokens", "lm_xent", "lm_ppl",
        bucket.alias("lm_bucket"),
    )


def bpe_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """(token, token_id, n_occurrences): the corpus vocabulary under a
    trained merge table, with deterministic dense ids (0..V-1 ordered by
    token — the enrich zip_with_index pattern, no global window) — what
    an id-based training feed joins against.

    Pass ``encoded`` (a checkpointed encode_bpe result) to reuse one
    segmentation pass across bpe_vocab AND encode_bpe_ids — the python
    UDF segmentation is the hot cost, don't pay it per consumer."""
    from clpspark.operators.enrich import zip_with_index

    if encoded is None:
        if merges is None:
            raise ValueError("pass merges or a pre-encoded DataFrame")
        encoded = encode_bpe(docs, merges, text_col=text_col, id_col=id_col)
    toks = (
        encoded.select(F.explode("bpe_tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return zip_with_index(
        toks, "token", "token_id", already_distinct=True
    )


def encode_bpe_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, token_ids, n_bpe_tokens): segment and map to vocab ids in
    ORDER (posexplode -> id join -> re-assemble sorted by position; the
    vocab side broadcasts while small, shuffles beyond — Spark's call).
    Tokens absent from ``vocab`` map to id -1 (callers decide OOV policy);
    token-less docs (null/empty text) keep a row with an EMPTY id array —
    same contract as encode_bpe. ``encoded`` reuses a prior (checkpointed)
    encode_bpe pass instead of segmenting again."""
    if encoded is None:
        if merges is None:
            raise ValueError("pass merges or a pre-encoded DataFrame")
        encoded = encode_bpe(docs, merges, text_col=text_col, id_col=id_col)
    ex = encoded.select(
        id_col, F.posexplode("bpe_tokens").alias("pos", "token")
    )
    joined = ex.join(vocab.select("token", "token_id"), "token", "left")
    ids = joined.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(
                "pos",
                F.coalesce("token_id", F.lit(-1)).alias("tid"),
            ))
        )["tid"].alias("token_ids")
    )
    # posexplode emits nothing for empty arrays — rejoin onto the full doc
    # set so token-less docs keep a row (curate.dedup_lines pattern)
    return (
        encoded.select(id_col)
        .join(ids, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "token_ids", F.array().cast("array<bigint>")
            ).alias("token_ids"),
        )
        .withColumn("n_bpe_tokens", F.size("token_ids"))
    )
