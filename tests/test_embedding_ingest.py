"""Streaming embedding ingest (streaming/ingest.py EmbeddingIngestSink):
the vector twin of the corpus ingest — cross-batch near-dup vectors
dropped in flight, replays converge, deltas append."""

import numpy as np

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.streaming import EmbeddingIngestSink
from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore

SCHEMA = "vec_id long, embedding array<float>"


def _run_stream(spark, src_dir, ckpt, sink):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(f"{src_dir}/*")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_embedding_ingest_dedups_across_batches(spark, sf_dir, tmp_path):
    base = [
        (r["vec_id"], r["embedding"])
        for r in table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(10)
        .collect()
    ]
    src = tmp_path / "src"
    src.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = EmbeddingIngestSink(store, nplanes=8)

    # batch 1: 6 vectors, one exact in-batch duplicate
    b1 = base[:6] + [(900, base[0][1])]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    _run_stream(spark, src, tmp_path / "ck", sink)
    v1 = {r["vec_id"] for r in store.read("vectors").collect()}
    assert v1 == {v for v, _ in base[:6]}

    # batch 2: a verbatim re-delivery, a perturbed copy (cos ≈ 1), two fresh
    rng = np.random.default_rng(3)
    perturbed = [float(x) for x in np.array(base[1][1], dtype=np.float64) + 1e-3 * np.eye(len(base[1][1]))[0]]
    fresh_a = [float(x) for x in rng.normal(size=len(base[0][1]))]
    fresh_b = [float(x) for x in rng.normal(size=len(base[0][1]))]
    b2 = [(1000, base[2][1]), (1001, perturbed), (2001, fresh_a), (2002, fresh_b)]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    _run_stream(spark, src, tmp_path / "ck", sink)

    v2 = {r["vec_id"] for r in store.read("vectors").collect()}
    assert v2 == v1 | {2001, 2002}
    assert len(store.current_manifest()["tables"]["vectors"]["dirs"]) == 2  # appended

    # full replay converges (no growth, no error)
    _run_stream(spark, src, tmp_path / "ck_replay", sink)
    assert {r["vec_id"] for r in store.read("vectors").collect()} == v2
