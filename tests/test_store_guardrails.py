"""Publish-time row expectations + RESTORE (warehouse/persist.py).

The quality gate the reference enforces per-row in Postgres CHECKs and
per-batch in its assert tasks (DataQualityOperator) moves to the
storage boundary: a violating batch can never become a visible version,
and a bad version that DID land rolls back as a new commit.
"""

import pytest

from rustcheatersdatapipeline_spark.warehouse.persist import (
    ExpectationError,
    GoldStore,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, n int")


GOOD = [(1, "a", 5), (2, "b", 7)]


def test_expectations_pass_and_publish(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    v = store.publish(
        {"t": _df(spark, GOOD)},
        0,
        expectations={"t": ["n > 0", "v IS NOT NULL"]},
    )
    assert v == 1 and store.read("t").count() == 2


def test_violating_batch_never_becomes_visible(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    store.publish({"t": _df(spark, GOOD)}, 0)
    with pytest.raises(ExpectationError, match="n > 0"):
        store.publish(
            {"t": _df(spark, [(3, "c", -1)])},
            1,
            expectations={"t": ["n > 0"]},
        )
    # the store is untouched: version and rows unchanged
    assert store.current_version() == 1
    assert store.read("t").count() == 2


def test_null_predicate_counts_as_violation(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    df = spark.createDataFrame([(1, None, 5)], "k bigint, v string, n int")
    with pytest.raises(ExpectationError, match="violate"):
        store.publish({"t": df}, 0, expectations={"t": ["length(v) > 0"]})


def test_append_respects_expectations(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    v = store.publish_append({"t": _df(spark, GOOD)}, 0, expectations={"t": ["n > 0"]})
    with pytest.raises(ExpectationError):
        store.publish_append(
            {"t": _df(spark, [(9, "z", 0)])}, v, expectations={"t": ["n > 0"]}
        )
    assert store.read("t").count() == 2


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    v1 = store.publish({"t": _df(spark, GOOD)}, 0)
    good_rows = {tuple(r) for r in store.read("t").collect()}
    v2 = store.publish({"t": _df(spark, [(9, "oops", 1)])}, v1)
    assert store.read("t").count() == 1
    v3 = store.restore(v1)
    assert v3 == v2 + 1
    assert {tuple(r) for r in store.read("t").collect()} == good_rows
    # history moved forward: the bad version is still readable
    assert store.read_at("t", v2).count() == 1
    # and versions() advertises the whole chain
    assert store.versions() == [1, 2, 3]


def test_restore_selected_tables_only(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    v1 = store.publish({"a": _df(spark, GOOD), "b": _df(spark, GOOD)}, 0)
    v2 = store.publish(
        {"a": _df(spark, [(9, "x", 1)]), "b": _df(spark, [(9, "y", 1)])}, v1
    )
    store.restore(v1, tables=["a"])
    assert store.read("a").count() == 2  # rolled back
    assert store.read("b").count() == 1  # left at v2


def test_restore_vacuumed_target_fails_fast(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    v1 = store.publish({"t": _df(spark, GOOD)}, 0)
    store.publish({"t": _df(spark, [(9, "x", 1)])}, v1)
    store.vacuum(min_age_seconds=0.0)  # reclaims v1's dir
    with pytest.raises((FileNotFoundError, KeyError)):
        store.restore(v1)
    # nothing committed
    assert store.read("t").count() == 1


def test_ingest_sink_expectations_gate_the_crawl(spark, tmp_path):
    """A curation bug producing empty admitted docs must fail the
    PUBLISH, not poison the corpus: the sink forwards its expectations
    to the audit stage."""
    from rustcheatersdatapipeline_spark.streaming.ingest import CorpusIngestSink

    docs = spark.createDataFrame(
        [(1, "a real document with plenty of text", None, "http://a/1", 36),
         (2, "", None, "http://a/2", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CorpusIngestSink(store, k=9, expectations=["n_chars > 0"])
    with pytest.raises(ExpectationError, match="n_chars > 0"):
        sink(docs, batch_id=1)
    assert "corpus" not in store.current_manifest()["tables"]
    # the compliant slice publishes fine through the same sink
    ok = docs.filter("n_chars > 0")
    assert sink(ok, batch_id=2) == 1
    assert store.read("corpus").count() == 1


def test_ingest_sink_drop_mode_filters_and_counts(spark, tmp_path):
    """on_violation='drop': dirty rows never publish, never enter the
    dedup index, and are counted; the clean slice flows normally."""
    from rustcheatersdatapipeline_spark.streaming.ingest import CorpusIngestSink

    docs = spark.createDataFrame(
        [(1, "a real document with plenty of text", None, "http://a/1", 36),
         (2, "", None, "http://a/2", 0),
         (3, None, None, "http://a/3", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CorpusIngestSink(
        store, k=9, expectations=["n_chars > 0"], on_violation="drop"
    )
    assert sink(docs, batch_id=1) == 1
    assert sink.last_dropped == 2  # empty text + NULL predicate both drop
    assert store.read("corpus").count() == 1
    # dropped rows never entered the index: re-sending a NOW-valid doc 2
    # admits it (it was never indexed as seen)
    fixed = spark.createDataFrame(
        [(2, "doc two grew real content this crawl", None, "http://a/2", 37)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    assert sink(fixed, batch_id=2) == 1
    assert sink.last_dropped == 0


def test_on_violation_validated(spark, tmp_path):
    from rustcheatersdatapipeline_spark.streaming.ingest import CorpusIngestSink

    store = GoldStore(spark, str(tmp_path / "gold"))
    with pytest.raises(ValueError, match="fail|drop"):
        CorpusIngestSink(store, on_violation="warn")


def test_ingest_sink_drop_mode_unpersists_its_cache(spark, tmp_path):
    """drop-mode caches the batch to count violations; a long-running
    stream must not accumulate one pinned RDD per micro-batch.

    Asserts the sink's OWN storage delta (before vs after, across two
    micro-batches), not global-zero storage: the plan-cache registry
    legitimately pins one candidate-checkpoint generation per builder
    key until release(), so a global-zero assertion here would fail on
    unrelated, registry-owned blocks left by earlier tests (and before
    the registry it only passed by GC timing)."""
    from rustcheatersdatapipeline_spark.streaming.ingest import CorpusIngestSink

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(1, "a real document with plenty of text", None, "http://a/1", 36),
         (2, "", None, "http://a/2", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = CorpusIngestSink(
        store, k=9, expectations=["n_chars > 0"], on_violation="drop"
    )
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert sink(docs, batch_id=1) == 1
    sink(docs, batch_id=2)  # replayed batch: dedup-dropped, return not asserted
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) <= before
