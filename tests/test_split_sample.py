"""Deterministic splits + exact-size sampling (operators/split.py)."""

from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.operators.split import (
    hash_split,
    uniform_sample_k,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_hash_split_deterministic_and_proportional(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    n = ev.count()
    tag = lambda seed: {
        r["event_id"]: r["split"]
        for r in hash_split(ev, WEIGHTS, ["event_id"], seed=seed)
        .select("event_id", "split")
        .collect()
    }
    a, b, c = tag(1), tag(1), tag(2)
    assert a == b  # same seed → identical assignment
    assert a != c  # new seed → new assignment
    counts = {s: sum(1 for v in a.values() if v == s) for s in WEIGHTS}
    assert set(counts) == set(WEIGHTS)
    for s, w in WEIGHTS.items():
        exp = n * w
        tol = 4 * (n * w * (1 - w)) ** 0.5  # 4σ binomial envelope
        assert abs(counts[s] - exp) <= tol, (s, counts[s], exp)


def test_hash_split_is_group_coherent(spark, sf_dir):
    """Keying by user_id must place every row of a user in ONE split —
    the leakage-safety contract."""
    ev = table(spark, sf_dir, "events")
    per_user = (
        hash_split(ev, WEIGHTS, ["user_id"], seed=5)
        .groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
    )
    assert per_user.filter(F.col("k") > 1).count() == 0


def test_uniform_sample_k_exact_and_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    s1 = sorted(
        r["doc_id"] for r in uniform_sample_k(docs, 37, ["doc_id"], seed=9).collect()
    )
    s2 = sorted(
        r["doc_id"] for r in uniform_sample_k(docs, 37, ["doc_id"], seed=9).collect()
    )
    s3 = sorted(
        r["doc_id"] for r in uniform_sample_k(docs, 37, ["doc_id"], seed=10).collect()
    )
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert len(s1) == 37 and s1 == s2 and s3 != s1
    assert set(s1) <= all_ids and set(s3) <= all_ids
    # k ≥ n degenerates to the full table
    assert uniform_sample_k(docs, 10**6, ["doc_id"]).count() == len(all_ids)


def test_uniform_sample_k_plan_is_bounded_topk(spark, sf_dir):
    """The sample must plan as per-partition top-k (TakeOrderedAndProject),
    not a global sort of the corpus."""
    plan = (
        uniform_sample_k(table(spark, sf_dir, "documents"), 10, ["doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_mixture_token_budget_sample_contract(spark, sf_dir):
    """Budgets respected per language, prefix rule (the cut happens at
    the first overflow in quality order), and quality-first ordering."""
    from rustcheatersdatapipeline_spark.plans.training import (
        _mixture_budgets,
        mixture_token_budget_sample,
    )

    rows = mixture_token_budget_sample(spark, sf_dir).collect()
    assert rows
    budgets = _mixture_budgets()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) <= set(budgets)
    for lang, lr in by_lang.items():
        total = sum(r["n_tokens"] for r in lr)
        assert total <= budgets[lang]
        assert total == lr[-1]["cum_tokens"]
        # admitted docs are a quality-ordered prefix: scores non-increasing
        qs = [r["q_scaled"] for r in sorted(lr, key=lambda r: r["cum_tokens"])]
        assert qs == sorted(qs, reverse=True)
