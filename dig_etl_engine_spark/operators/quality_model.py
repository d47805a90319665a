"""Classifier-based corpus quality filtering — the fastText-style
"train a small classifier on good-vs-bad text, score the crawl" stage
that sits between heuristic gates and model-based curation in LLM data
pipelines (the reference has nothing comparable; this is part of the
training-data extension surface, like operators/dedup.py).

Features are the repo's own heuristic columns (text_analysis) assembled
into a vector; the model is Spark MLlib logistic regression, so training
and scoring are both distributed and the scoring path is one JVM-side
model transform — no Python in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# underscore-prefixed so user data columns (the repo's own profiling
# queries emit e.g. n_tokens) are never clobbered or dropped by scoring
FEATURES = ("_qf_n_tokens", "_qf_stop_ratio", "_qf_distinct_ratio",
            "_qf_mean_tok_len", "_qf_line_rep")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the heuristic feature columns used by the classifier —
    pure column math (codegen, no shuffle), shared between training and
    scoring so the two can never skew. Null text is treated as empty
    (scores as junk) instead of feeding nulls into the assembler."""
    from dig_etl_engine_spark.operators.text_analysis import (
        distinct_token_ratio, line_repetition_ratio, mean_token_length,
        stopword_ratio, token_count)

    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.withColumns({
        "_qf_n_tokens": token_count(t).cast("double"),
        "_qf_stop_ratio": stopword_ratio(t),
        "_qf_distinct_ratio": distinct_token_ratio(t),
        "_qf_mean_tok_len": mean_token_length(t),
        "_qf_line_rep": line_repetition_ratio(t),
    })


def train_quality_classifier(labeled: DataFrame, *, text_col: str = "text",
                             label_col: str = "label",
                             max_iter: int = 50, reg: float = 0.01):
    """Train the filter on a labeled sample (1 = keep-quality, 0 = junk;
    the classic recipe labels a curated corpus 1 and raw crawl 0).
    Returns a fitted PipelineModel (assembler + logistic regression) —
    ``model.write().overwrite().save(path)`` / ``PipelineModel.load`` for
    reuse across jobs. Deterministic: LR over a fixed feature order with
    a fixed iteration budget."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(labeled, text_col)
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=list(FEATURES), outputCol="_qf_vec"),
        LogisticRegression(featuresCol="_qf_vec", labelCol=label_col,
                           maxIter=max_iter, regParam=reg,
                           rawPredictionCol="_qf_raw",
                           probabilityCol="_qf_prob",
                           predictionCol="_qf_pred"),
    ])
    return pipe.fit(feats)


# Coefficients of `train_quality_classifier` fitted once over the sf0.01
# documents table vs 40-token "zzz" junk mutants (the registry fixture),
# rounded to 6 decimals and pinned — the production train-once /
# score-everywhere split. Order matches FEATURES. `test_quality_model.py`
# asserts the pinned model still separates real docs from junk and stays
# sign-consistent with a fresh LBFGS fit.
PINNED_COEFFICIENTS = (0.030574, 24.089819, 6.147928, 2.265041, 0.0)
PINNED_INTERCEPT = -12.164041


def quality_logit(df: DataFrame, *, text_col: str = "text",
                  weights: tuple = PINNED_COEFFICIENTS,
                  intercept: float = PINNED_INTERCEPT,
                  out_col: str = "quality_logit") -> DataFrame:
    """Score with a FIXED coefficient vector — pure column math (codegen,
    no shuffle, no model object), the deployable half of the classifier:
    train with :func:`train_quality_classifier` offline, ship the
    coefficients, score the 100 TB corpus as one narrow projection.
    ``keep = logit >= 0`` is exactly ``P(quality) >= 0.5`` without
    evaluating the sigmoid (monotone transform) — and stays replayable
    by any SQL engine, which LBFGS iterations are not.

    The sum is built left-to-right in FEATURES order so an oracle writing
    the same expression gets bitwise-identical IEEE doubles."""
    feats = quality_features(df, text_col)
    z: Column = F.lit(float(intercept))
    for w, c in zip(weights, FEATURES):
        if w == 0.0:
            continue
        z = z + F.lit(float(w)) * F.col(c)
    return feats.withColumn(out_col, z).drop(*FEATURES)


def score_quality(df: DataFrame, model, *, text_col: str = "text",
                  out_col: str = "quality_prob") -> DataFrame:
    """Append P(quality) per doc. The transform is JVM-side (MLlib);
    corpus filtering is then ``filter(col(out_col) >= cutoff)`` — choose
    the cutoff on a held-out sample for the recall/precision trade."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(quality_features(df, text_col))
    return (scored.withColumn(
        out_col, vector_to_array(F.col("_qf_prob")).getItem(1))
        .drop("_qf_vec", "_qf_raw", "_qf_prob", "_qf_pred", *FEATURES))
