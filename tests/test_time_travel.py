"""GoldStore snapshot reads (read_at): immutable data dirs make time
travel free until vacuum reclaims them — the Iceberg/Delta property."""

import pytest

from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "steam_id string, level int")


def test_read_at_returns_each_committed_snapshot(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    store.publish({"dim": _df(spark, [("a", 1)])}, base_version=0)
    store.publish({"dim": _df(spark, [("a", 1), ("b", 2)])}, base_version=1)
    store.publish_append({"dim": _df(spark, [("c", 3)])}, base_version=2)

    assert store.versions() == [1, 2, 3]
    assert {tuple(r) for r in store.read_at("dim", 1).collect()} == {("a", 1)}
    assert {tuple(r) for r in store.read_at("dim", 2).collect()} == {("a", 1), ("b", 2)}
    assert {tuple(r) for r in store.read_at("dim", 3).collect()} == {
        ("a", 1),
        ("b", 2),
        ("c", 3),
    }
    # current read equals the latest snapshot
    assert {tuple(r) for r in store.read("dim").collect()} == {
        tuple(r) for r in store.read_at("dim", 3).collect()
    }


def test_vacuum_invalidates_stale_snapshots_fast(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    store.publish({"dim": _df(spark, [("a", 1)])}, base_version=0)
    store.publish({"dim": _df(spark, [("z", 9)])}, base_version=1)  # full replace
    removed = store.vacuum(min_age_seconds=0)
    assert removed  # v1's dir is unreferenced by current → reclaimed
    # current is intact; the stale snapshot fails fast, not partially
    assert {tuple(r) for r in store.read("dim").collect()} == {("z", 9)}
    with pytest.raises(Exception):
        store.read_at("dim", 1).collect()
