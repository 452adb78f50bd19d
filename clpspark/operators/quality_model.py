"""Classifier-based quality filtering — the GPT-3-style model filter.

Brown et al. 2020 (GPT-3, Appendix A) filter CommonCrawl with a logistic
regression over word-hash features, trained to separate a high-quality
reference corpus from raw crawl, then keep a document iff

    np.random.pareto(alpha) > 1 - document_score      (alpha = 9)

so high-scoring docs are almost always kept while low-scoring docs are
still sampled occasionally (keeps the tail diverse). Spark-first here:

  - features: ``HashingTF`` over whitespace tokens (the hashing trick —
    no vocabulary state to ship, scales to any corpus);
  - model: ``pyspark.ml`` LogisticRegression (distributed L-BFGS; the
    trained coefficients are a single broadcastable vector);
  - the Pareto draw is HASH-DETERMINISTIC per doc (same md5-uniform
    construction as curate.hash_keep) so runs, engines, and resumes
    agree on exactly which documents survive — rand() would not.

Scale shape: training aggregates gradient partials (no driver residency
beyond the coefficient vector); scoring is one map-side model apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clpspark.operators.curate import _HEX_SPACE

PARETO_ALPHA = 9.0  # GPT-3 Appendix A
_N_FEATURES = 1 << 18


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_features: int = _N_FEATURES,
    reg: float = 1e-3,
):
    """Fit the LR quality model: ``label_col`` (boolean/0-1) marks the
    high-quality reference slice (GPT-3 uses WebText/Wikipedia/books as
    positives vs raw crawl). Returns a fitted PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    pipe = Pipeline(stages=[
        Tokenizer(inputCol="_qm_text", outputCol="_qm_words"),
        HashingTF(inputCol="_qm_words", outputCol="_qm_features",
                  numFeatures=n_features),
        LogisticRegression(featuresCol="_qm_features", labelCol="_qm_label",
                           regParam=reg, standardization=False),
    ])
    train = docs.select(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_qm_text"),
        F.col(label_col).cast("double").alias("_qm_label"),
    ).where(F.col("_qm_label").isNotNull())
    return pipe.fit(train)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = PARETO_ALPHA,
) -> DataFrame:
    """(doc_id, quality_score, keep): the model's P(high quality) per doc
    plus the GPT-3 Pareto keep decision.

    The Pareto draw replays deterministically: u = md5-uniform over a
    SALTED id ('qm:' + doc_id — an unsalted md5(doc_id) would correlate
    this draw with every other md5-based sampling decision in the
    pipeline, e.g. curate.hash_keep, silently destroying the Pareto
    tail-sampling property for pre-sampled inputs), pareto =
    (1-u)^(-1/alpha) - 1 (inverse-CDF of numpy's Lomax pareto), keep iff
    pareto > 1 - quality_score — compared against the ROUNDED emitted
    score, so the decision replays exactly from this function's output."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.select(
        id_col,
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_qm_text"),
    ))
    prob = F.round(F.element_at(vector_to_array("probability"), 2), 6)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("qm:"),
                               F.col(id_col).cast("string"))), 1, 6),
            16, 10,
        ).cast("double") / F.lit(float(_HEX_SPACE))
    )
    pareto = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return scored.select(
        id_col,
        prob.alias("quality_score"),
        (pareto > (1.0 - prob)).alias("keep"),
    )
