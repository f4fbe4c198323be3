"""Streaming media ingest with incremental perceptual dedup
(streaming/ingest.py MediaIngestSink + operators/incremental.py media
path): exact re-uploads and JPEG re-encodes are dropped against the
persisted index, undecodable payloads stay exact-dedupable, the
Hamming-radius contract survives reopen, replays converge."""

import numpy as np
import pytest

from rustcheatersdatapipeline_spark.streaming.ingest import MediaIngestSink
from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore
from tests.test_jpeg_decode import encode_jpeg
from tests.test_phash import _textured
from tests.test_pixels_decode import encode_png

SCHEMA = "item_id long, payload binary"


def _run(spark, src, ckpt, sink):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(f"{src}/*")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_media_ingest_dedups_exact_and_perceptual(spark, tmp_path):
    imgs = {i: _textured(60 + i) for i in range(3)}
    pngs = {i: encode_png(img[..., None]) for i, img in imgs.items()}
    src = tmp_path / "src"
    src.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    sink = MediaIngestSink(store)

    # batch 1: three images + an exact in-batch duplicate + junk bytes
    b1 = [
        (1, bytearray(pngs[0])),
        (2, bytearray(pngs[1])),
        (3, bytearray(pngs[2])),
        (900, bytearray(pngs[0])),  # in-batch exact dup → min-id survivor
        (4, bytearray(b"\x00junk-payload")),  # undecodable, admitted
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    _run(spark, src, tmp_path / "ck", sink)

    media1 = {r["item_id"] for r in store.read("media").collect()}
    assert media1 == {1, 2, 3, 4}
    idx = {r["item_id"]: r for r in store.read("media_index").collect()}
    assert idx[4]["phash"] is None and idx[1]["phash"] is not None

    # batch 2: exact re-upload, JPEG re-encode (perceptual twin), junk
    # re-upload, and one genuinely new image
    jpg0, _ = encode_jpeg(imgs[0])
    new_img = _textured(77)
    b2 = [
        (10, bytearray(pngs[1])),  # exact re-upload → dropped
        (11, bytearray(jpg0)),  # re-encode of img 0 → near match, dropped
        (12, bytearray(b"\x00junk-payload")),  # exact junk re-upload → dropped
        (13, bytearray(encode_png(new_img[..., None]))),  # novel
    ]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    _run(spark, src, tmp_path / "ck", sink)

    media2 = {r["item_id"] for r in store.read("media").collect()}
    assert media2 == {1, 2, 3, 4, 13}
    assert store.read("media_index").count() == 5  # lockstep with media

    # full replay through a fresh checkpoint: pure no-op
    _run(spark, src, tmp_path / "ck_replay", sink)
    assert {r["item_id"] for r in store.read("media").collect()} == media2


def test_hamming_contract_persisted_and_enforced(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    store = GoldStore(spark, str(tmp_path / "gold"))
    img = _textured(5)
    spark.createDataFrame(
        [(1, bytearray(encode_png(img[..., None])))], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1"))
    _run(spark, src, tmp_path / "ck", MediaIngestSink(store, max_hamming=2))

    assert store.properties("media_index")["max_hamming"] == 2
    # adopting sink reads the stored radius
    assert MediaIngestSink(store).max_hamming == 2
    # conflicting explicit radius fails fast
    with pytest.raises(ValueError, match="max_hamming=2"):
        MediaIngestSink(store, max_hamming=3)
