"""Epoch shuffle + shard writer (operators/export.py)."""

import glob

import pyarrow.parquet as pq
import pytest

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.operators.export import (
    epoch_shuffle,
    write_training_shards,
)


def _read_order(path):
    """Replay the epoch permutation the way a data loader does: files in
    name order, rows in file order (pyarrow keeps physical row order)."""
    ids = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    return ids


def test_epoch_shuffle_is_deterministic_permutation(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    a, b, c = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "c")
    write_training_shards(docs, a, seed=1, key_cols=["doc_id"], num_partitions=4)
    write_training_shards(docs, b, seed=1, key_cols=["doc_id"], num_partitions=4)
    write_training_shards(docs, c, seed=2, key_cols=["doc_id"], num_partitions=4)

    oa, ob, oc = _read_order(a), _read_order(b), _read_order(c)
    want = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert oa == ob  # same seed → byte-identical epoch order
    assert sorted(oa) == want  # a true permutation, nothing lost
    assert oc != oa and sorted(oc) == want  # new seed → new permutation
    assert oa != sorted(oa)  # and it actually shuffles


def test_shard_row_cap(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, seed=7, key_cols=["doc_id"], rows_per_shard=40, num_partitions=4
    )
    files = glob.glob(f"{out}/part-*.parquet")
    sizes = [pq.ParquetFile(f).metadata.num_rows for f in files]
    assert max(sizes) <= 40
    assert sum(sizes) == docs.count()


def test_epoch_shuffle_plan_is_range_partitioned(spark, sf_dir):
    """The permutation must be a range shuffle + local sort — no global
    single-partition sort, no Python in the plan."""
    plan = (
        epoch_shuffle(table(spark, sf_dir, "documents"), 3, ["doc_id"], 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "Python" not in plan


def test_shard_manifest_counts_digests_and_determinism(spark, tmp_path):
    """Manifest row totals must equal the corpus, per-shard rows respect
    the cap, digests are order-independent but content-sensitive, and a
    same-seed rewrite reproduces the identical manifest."""
    import json

    from rustcheatersdatapipeline_spark.operators.export import (
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.range(1000).selectExpr("id", "id * 3 as v")
    p = str(tmp_path / "shards")
    write_training_shards(df, p, seed=7, key_cols=["id"], rows_per_shard=100)
    m = write_shard_manifest(spark, p)
    assert m["n_rows"] == 1000
    assert all(s["rows"] <= 100 and s["bytes"] > 0 for s in m["shards"])
    on_disk = json.load(open(f"{p}/_shard_manifest.json"))
    assert on_disk == m

    # same seed → identical shard CONTENTS (file names carry the
    # writer's UUID; rows/bytes/digests are the reproducible identity)
    write_training_shards(df, p, seed=7, key_cols=["id"], rows_per_shard=100)
    m_rerun = write_shard_manifest(spark, p)
    key = lambda s: (s["rows"], s["bytes"], s["digest"])
    assert sorted(map(key, m_rerun["shards"])) == sorted(map(key, m["shards"]))

    # content change → digest change (rows/bytes may coincide)
    df2 = spark.range(1000).selectExpr("id", "id * 3 + 1 as v")
    write_training_shards(df2, p, seed=7, key_cols=["id"], rows_per_shard=100)
    m2 = write_shard_manifest(spark, p)
    assert {s["digest"] for s in m2["shards"]} != {s["digest"] for s in m["shards"]}


@pytest.mark.parametrize("fmt", ["orc", "json"])
def test_shard_formats_round_trip(spark, tmp_path, fmt):
    """ORC and JSONL shards honor the same sizing + manifest contract
    as parquet, and read back with identical content."""
    from rustcheatersdatapipeline_spark.operators.export import (
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id bigint, text string"
    )
    out = str(tmp_path / f"shards_{fmt}")
    write_training_shards(df, out, seed=1, key_cols=["doc_id"],
                          rows_per_shard=20, num_partitions=4, fmt=fmt)
    man = write_shard_manifest(spark, out)
    assert man["format"] == fmt
    assert man["n_rows"] == 100
    assert all(s["rows"] <= 20 for s in man["shards"])
    back = spark.read.format(fmt).load(out)
    got = {(int(r["doc_id"]), r["text"]) for r in back.collect()}
    assert got == {(i, f"doc {i}") for i in range(100)}


def test_unknown_shard_format_rejected(spark, tmp_path):
    from rustcheatersdatapipeline_spark.operators.export import write_training_shards

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="unknown format"):
        write_training_shards(df, str(tmp_path / "s"), 1, ["doc_id"], fmt="csvx")
