"""Trainable document quality classifier — multinomial Naive Bayes.

The CCNet/fasttext-style curation step the fixed heuristics
(quality_score, lm_score, compression cuts) cannot replace: label a
small seed set ("looks like reference text" vs "looks like crawl
noise"), TRAIN on it, score the corpus. Naive Bayes is the Spark-first
choice because training is literally three aggregations — token counts
per class, class totals, document priors — one corpus scan, no
gradient loop, no driver-side state beyond two scalars.

Scale shape (100 TB):

- ``nb_train``: tokenize → explode → two hash-keyed aggregates. The
  vocabulary is BOUNDED (top ``vocab_size`` tokens by document
  frequency, deterministic ties) so the model is a broadcastable
  (token, weight) table no matter the corpus size; everything else
  folds map-side.
- ``nb_score``: explode → broadcast-join the model → per-doc sum.
  One shuffle on doc_id; the model never shuffles.

Weights are binary log-odds: w(t) = log P(t|pos) − log P(t|neg) with
Laplace smoothing, plus a class prior — the standard form; scoring is
prior + Σ_t count(t,doc)·w(t), positive ⇒ keep-leaning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default vocabulary bound — the model stays broadcastable
NB_VOCAB_SIZE = 50_000
#: Laplace smoothing mass
NB_ALPHA = 1.0

_TOKENIZE = r"[\t\n\f\r ]+"


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), _TOKENIZE), lambda t: t != "")
        ).alias("token"),
    )


def nb_train(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = NB_VOCAB_SIZE,
    alpha: float = NB_ALPHA,
) -> tuple[DataFrame, float]:
    """(model, prior) from a labeled seed set: model is a bounded
    (token, weight) table of smoothed log-odds, prior the class
    log-ratio. ``label_col`` is binary (1 = positive/keep). Tokens
    outside the top-``vocab_size`` by document frequency (ties → token
    asc) fall out of the model — scoring treats them as weight 0, the
    correct neutral for out-of-vocabulary mass."""
    toks = _tokens(docs, text_col, id_col).join(
        docs.select(F.col(id_col).alias("_doc"), F.col(label_col).alias("_y")), "_doc"
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count_distinct("_doc").alias("df"))
        .orderBy(F.col("df").desc(), "token")
        .limit(vocab_size)
        .select("token")
    )
    counts = (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("_y") != 1, 1).otherwise(0)).alias("c_neg"),
        )
    )
    # class token totals + doc priors: four bounded scalars, one job
    tot = counts.agg(
        F.sum("c_pos").alias("t_pos"), F.sum("c_neg").alias("t_neg")
    ).first()
    nd = docs.agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col(label_col) != 1, 1).otherwise(0)).alias("n_neg"),
    ).first()
    if not nd["n_pos"] or not nd["n_neg"]:
        raise ValueError("nb_train: both classes must be present in the seed set")
    v = vocab_size  # smoothing denominates over the bounded vocab
    t_pos, t_neg = tot["t_pos"] or 0, tot["t_neg"] or 0
    model = counts.select(
        "token",
        (
            F.log((F.col("c_pos") + alpha) / F.lit(float(t_pos + alpha * v)))
            - F.log((F.col("c_neg") + alpha) / F.lit(float(t_neg + alpha * v)))
        ).alias("weight"),
    )
    prior = math.log(nd["n_pos"]) - math.log(nd["n_neg"])
    return model, prior


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    prior: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "nb_score",
) -> DataFrame:
    """Documents with the classifier log-odds score attached: prior +
    Σ count(token)·weight over in-vocabulary tokens (empty/OOV-only
    documents score exactly the prior). The model side broadcasts; the
    corpus side shuffles once on the document id."""
    per_doc = (
        _tokens(docs, text_col, id_col)
        .join(F.broadcast(model), "token")
        .groupBy("_doc")
        .agg(F.sum("weight").alias("_mass"))
    )
    return (
        docs.join(per_doc, docs[id_col] == per_doc._doc, "left")
        .drop("_doc")
        .withColumn(score_col, F.lit(prior) + F.coalesce(F.col("_mass"), F.lit(0.0)))
        .drop("_mass")
    )
