"""Mergeable sketches (functions/sketches.py): pure-Python identical-
definition replicas, LOSSLESS merge laws (integer row equality, not
"close enough"), estimate error envelopes, and CDC-incremental sketch
views over GoldStore."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.functions import sketches as S
from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore
from rustcheatersdatapipeline_spark.warehouse.views import IncrementalAggregateView


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll_rows(values_by_key):
    """Identical-definition replica of hll_rows."""
    out = {}
    for key, vals in values_by_key.items():
        regs = {}
        for v in vals:
            h = _py_hash60(v)
            reg = h % S.HLL_M
            w = h >> S.HLL_P
            wbits = S.HLL_HASH_BITS - S.HLL_P
            rank = (wbits + 1) if w == 0 else wbits - w.bit_length() + 1
            regs[reg] = max(regs.get(reg, 0), rank)
        out[key] = regs
    return out


def _collect_hll(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["source"], {})[r["reg"]] = r["rank"]
    return out


def test_hll_rows_match_python_replica(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    got = _collect_hll(S.hll_rows(docs, "text", ["source"]))
    raw = docs.select("source", "text").collect()
    by_key = {}
    for r in raw:
        by_key.setdefault(r["source"], []).append(r["text"])
    assert got == _py_hll_rows(by_key)


def test_hll_merge_is_lossless(spark, sf_dir):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) as exact rows."""
    docs = table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        S.hll_rows(a, "text", ["source"])
        .unionByName(S.hll_rows(b, "text", ["source"]))
        .groupBy("source", "reg")
        .agg(F.max("rank").alias("rank"))
    )
    assert _collect_hll(merged) == _collect_hll(S.hll_rows(docs, "text", ["source"]))


def test_hll_pack_and_packed_merge(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    rows = S.hll_rows(docs, "text", ["source"])
    packed = S.hll_pack(rows, ["source"])
    dense = {r["source"]: list(r["hll"]) for r in packed.collect()}
    sparse = _collect_hll(rows)
    for src, arr in dense.items():
        assert len(arr) == S.HLL_M
        assert {i: v for i, v in enumerate(arr) if v} == sparse[src]
    # element-wise-max aggregate over per-half packed sketches
    halves = S.hll_pack(
        S.hll_rows(
            docs.withColumn("half", (F.col("doc_id") % 2).cast("int")),
            "text",
            ["source", "half"],
        ),
        ["source", "half"],
    )
    remerged = halves.groupBy("source").agg(S.hll_merge_agg("hll"))
    assert {r["source"]: list(r["hll"]) for r in remerged.collect()} == dense


def test_hll_estimate_error_envelope(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    est = {
        r["source"]: r["est"]
        for r in S.hll_pack(S.hll_rows(docs, "text", ["source"]), ["source"])
        .select("source", S.hll_estimate("hll").alias("est"))
        .collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count_distinct("text").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    rsd = 1.04 / math.sqrt(S.HLL_M)
    for src, n in exact.items():
        assert abs(est[src] - n) <= 5 * rsd * n, (src, est[src], n)


def _py_dd_bucket(x: float) -> int:
    return math.ceil(math.log(x) / S.DD_LN_GAMMA)


def test_dd_rows_match_python_replica(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    got = {
        (r["source"], r["bucket"]): r["n_rows"]
        for r in S.dd_rows(docs, "n_chars", ["source"]).collect()
    }
    exp = {}
    for r in docs.select("source", "n_chars").collect():
        k = (r["source"], _py_dd_bucket(r["n_chars"]))
        exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_dd_merge_is_sum(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        S.dd_rows(a, "n_chars", ["source"])
        .unionByName(S.dd_rows(b, "n_chars", ["source"]))
        .groupBy("source", "bucket")
        .agg(F.sum("n_rows").alias("n_rows"))
    )
    full = S.dd_rows(docs, "n_chars", ["source"])
    as_dict = lambda df: {
        (r["source"], r["bucket"]): r["n_rows"] for r in df.collect()
    }
    assert as_dict(merged) == as_dict(full)


def test_dd_quantile_relative_error(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    rows = S.dd_rows(docs, "n_chars", ["source"])
    for q in (0.5, 0.9, 0.99):
        got = {
            r["source"]: r["value"]
            for r in S.dd_quantile(rows, ["source"], q).collect()
        }
        vals = {}
        for r in docs.select("source", "n_chars").collect():
            vals.setdefault(r["source"], []).append(r["n_chars"])
        for src, xs in vals.items():
            xs.sort()
            exact = xs[max(0, math.ceil(q * len(xs)) - 1)]
            assert abs(got[src] - exact) <= 2 * S.DD_ALPHA * exact, (q, src)


def test_dd_project_rejects_non_positive(spark):
    df = spark.createDataFrame([(1, 10), (2, 0)], "id long, x long")
    with pytest.raises(Exception, match="non-positive"):
        S.dd_project(df, "x", ["id"]).collect()


# ---- CDC-incremental sketch views --------------------------------------


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _hll_view(store):
    return IncrementalAggregateView(
        store,
        "docs",
        "hll_view",
        keys=["source", "reg"],
        maxes={"rank": "rank"},
        transform=lambda df: S.hll_project(df, "text", ["source"]),
    )


def test_incremental_hll_view_equals_batch_sketch(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    view = _hll_view(store)
    b1 = [(1, "a", "x1"), (2, "a", "x2"), (3, "b", "y1")]
    store.publish_append({"docs": _batch(spark, b1)}, store.current_version())
    assert view.refresh() == 3

    b2 = [(4, "a", "x3"), (5, "b", "y1"), (6, "c", "z1")]
    store.publish_append({"docs": _batch(spark, b2)}, store.current_version())
    # incremental fold must not rescan docs
    reads = []
    orig_read = store.read
    store.read = lambda name: reads.append(name) or orig_read(name)
    assert view.refresh() == 3
    store.read = orig_read
    assert "docs" not in reads

    stored = {
        (r["source"], r["reg"]): r["rank"]
        for r in store.read("hll_view").collect()
    }
    scratch = {
        (r["source"], r["reg"]): r["rank"]
        for r in S.hll_rows(_batch(spark, b1 + b2), "text", ["source"]).collect()
    }
    assert stored == scratch


def test_incremental_dd_view_equals_batch_sketch(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, source string, n long")
    view = IncrementalAggregateView(
        store,
        "docs",
        "dd_view",
        keys=["source", "bucket"],
        transform=lambda df: S.dd_project(df, "n", ["source"]),
    )
    b1 = [(1, "a", 100), (2, "a", 5000), (3, "b", 77)]
    b2 = [(4, "a", 102), (5, "b", 9)]
    store.publish_append({"docs": mk(b1)}, store.current_version())
    view.refresh()
    store.publish_append({"docs": mk(b2)}, store.current_version())
    view.refresh()
    stored = {
        (r["source"], r["bucket"]): r["n_rows"]
        for r in store.read("dd_view").collect()
    }
    scratch = {
        (r["source"], r["bucket"]): r["n_rows"]
        for r in S.dd_rows(mk(b1 + b2), "n", ["source"]).collect()
    }
    assert stored == scratch


def test_view_measure_name_collision_rejected(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    with pytest.raises(ValueError, match="collision"):
        IncrementalAggregateView(
            store, "docs", "v", keys=["k"], sums={"m": "a"}, maxes={"m": "b"}
        )
