"""GoldStore schema evolution (VERDICT r5 #5): additive columns append
cleanly (readers see NULL in pre-evolution dirs via the manifest-recorded
union schema — no mergeSchema footer scan); incompatible type changes are
rejected at audit/commit time, leaving the store untouched."""

import pytest

from rustcheatersdatapipeline_spark.warehouse.persist import (
    GoldStore,
    SchemaEvolutionError,
    TablePropertiesError,
)


def test_append_with_added_column_reads_both_eras(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    era1 = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    store.publish_append({"corpus": era1}, base_version=0)

    era2 = spark.createDataFrame(
        [(3, "gamma", "en")], "doc_id long, text string, lang string"
    )
    store.publish_append({"corpus": era2}, base_version=1)

    out = store.read("corpus")
    assert set(out.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in out.collect()}
    assert rows == {1: None, 2: None, 3: "en"}  # old era reads NULL

    # manifest carries the union schema — the read needs no mergeSchema
    entry = store.current_manifest()["tables"]["corpus"]
    names = [f["name"] for f in entry["schema"]["fields"]]
    assert names == ["doc_id", "text", "lang"]


def test_append_missing_column_is_allowed(spark, tmp_path):
    """The delta may also OMIT columns (they read as NULL for its rows)."""
    store = GoldStore(spark, str(tmp_path / "gold"))
    store.publish_append(
        {
            "corpus": spark.createDataFrame(
                [(1, "alpha", "en")], "doc_id long, text string, lang string"
            )
        },
        base_version=0,
    )
    store.publish_append(
        {"corpus": spark.createDataFrame([(2, "beta")], "doc_id long, text string")},
        base_version=1,
    )
    rows = {r["doc_id"]: r["lang"] for r in store.read("corpus").collect()}
    assert rows == {1: "en", 2: None}


def test_append_type_conflict_rejected_before_commit(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    store.publish_append(
        {"corpus": spark.createDataFrame([(1, "alpha")], "doc_id long, text string")},
        base_version=0,
    )
    v_before = store.current_version()
    bad = spark.createDataFrame([("oops", "beta")], "doc_id string, text string")
    with pytest.raises(SchemaEvolutionError, match="doc_id"):
        store.publish_append({"corpus": bad}, base_version=v_before)

    # nothing moved: version unchanged, table reads exactly the old rows
    assert store.current_version() == v_before
    assert [tuple(r) for r in store.read("corpus").collect()] == [(1, "alpha")]


def test_properties_are_immutable_once_set(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    df = spark.createDataFrame([(1, "a")], "doc_id long, digest string")
    store.publish_append(
        {"dedup_index": df}, base_version=0, properties={"dedup_index": {"k": 9}}
    )
    assert store.properties("dedup_index") == {"k": 9}

    # appending under a conflicting contract fails fast
    with pytest.raises(TablePropertiesError, match="k=7"):
        store.publish_append(
            {"dedup_index": df.selectExpr("doc_id + 1 as doc_id", "digest")},
            base_version=1,
            properties={"dedup_index": {"k": 7}},
        )
    # compaction (a replace publish) carries properties through
    store.compact("dedup_index")
    assert store.properties("dedup_index") == {"k": 9}
