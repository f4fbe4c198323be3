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


def test_mp3_certification_sweep_self_arms(spark, tmp_path, monkeypatch):
    """VERDICT r12 #5: every ingested MPEG-audio payload is
    bit-accounting-scored in flight and its per-Huffman-table tallies
    land atomically in the ``mp3_certification`` table — so the first
    real ESC-coded MP3 certifies or refutes the repair-derived tables
    with zero manual action. An injected synthetic ESC stream (encoded
    with a stand-in table 16, certified by the UNpatched build) must
    record quarantined tallies for the ESC id it selects; a clean
    stream records exact granules; non-audio payloads record nothing."""
    import rustcheatersdatapipeline_spark.functions.mp3 as M
    from tests.mp3enc import encode_mp3
    from tests.test_mp3 import _esc_frames, _frames_mono, _gr

    # clean stream: transcribed tables only -> exact/slack evidence
    # (two frames: the payload sniffer requires >= 2 agreeing frames)
    vals = [0] * 576
    vals[0] = 1
    g = _gr(**{"is": vals, "table_select": [1, 1, 1], "big_end": 2})
    clean_buf = encode_mp3(
        _frames_mono(g, _gr(), g, _gr()), rate=48000, bitrate=96000
    )
    # ESC stream: encoded with table 13's arrays standing in for the
    # untranscribed base-16 family (driver-side patch, undone before
    # ingest — the certifying Python workers run the real build, which
    # quarantines table 21's granules)
    t13 = M.HUFFMAN_TABLES[13]
    dec13 = (M._build_huff_decoder(t13[1], t13[2]), 16)
    for base in (16, 24):
        monkeypatch.setitem(M.HUFFMAN_TABLES, base, t13)
        monkeypatch.setitem(M._PAIR_DECODERS, base, dec13)
    esc_buf = encode_mp3(_esc_frames(table=21), rate=44100, bitrate=40000)
    monkeypatch.undo()

    img = _textured(42)
    rows = [
        (1, bytearray(encode_png(img[..., None]))),  # image: no cert row
        (2, bytearray(b"\x00junk")),                 # junk: no cert row
        (3, bytearray(clean_buf)),
        (4, bytearray(esc_buf)),
    ]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    store = GoldStore(spark, str(tmp_path / "gold"))
    _run(spark, src, tmp_path / "ck", MediaIngestSink(store))

    assert {r["item_id"] for r in store.read("media").collect()} == {1, 2, 3, 4}
    cert = {
        (r["item_id"], r["table_id"]): r
        for r in store.read("mp3_certification").collect()
    }
    assert {k[0] for k in cert} == {"3", "4"}  # only the MPEG payloads

    # clean stream: stream-level row + table-1 tallies, all exact/slack
    s3 = cert[("3", None)]
    assert s3["n_granules"] == 4 and s3["overrun"] == 0
    assert s3["quarantined"] == 0 and s3["parse_error"] is None
    assert cert[("3", 1)]["exact"] + cert[("3", 1)]["slack"] >= 1

    # ESC stream: every granule selected table 21 (absent from the
    # build) -> quarantined, recorded against that table id
    s4 = cert[("4", None)]
    assert s4["esc_granules"] == 16 and s4["quarantined"] == 16
    assert s4["overrun"] == 0
    assert cert[("4", 21)]["quarantined"] == 16
    assert cert[("4", 21)]["exact"] == 0

    # the harness contract rides the manifest as table properties
    props = store.properties("mp3_certification")
    assert "13" in props["builtin_tables"].split(",")
    assert "16" not in props["builtin_tables"].split(",")

    # the aggregated verdict frame over the accumulated tallies
    from rustcheatersdatapipeline_spark.streaming.ingest import (
        mp3_certification_report,
    )

    rep = {
        r["table_id"]: r
        for r in mp3_certification_report(store, min_exact=1).collect()
    }
    assert rep[21]["verdict"] == "armed"  # selected but absent from build
    assert rep[21]["quarantined"] == 16 and rep[21]["overrun"] == 0
    assert rep[1]["verdict"] == "certified"  # exact landings, no overrun
    assert rep[1]["overrun"] == 0
    # default threshold: the same evidence is only 'insufficient'
    rep_strict = {
        r["table_id"]: r for r in mp3_certification_report(store).collect()
    }
    assert rep_strict[1]["verdict"] == "insufficient"

    # replay through a fresh checkpoint: pure no-op, no duplicate rows
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    _run(spark, src, tmp_path / "ck2", MediaIngestSink(store))
    assert store.read("mp3_certification").count() == len(cert)
    # the certification cache is released per batch (r13 review): the
    # replay must not leave any extra pinned RDD behind
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before


def test_mp3_certification_report_all_verdicts(spark, tmp_path):
    """The verdict rules over synthetic tallies: refuted (any overrun,
    even alongside exacts), certified (>= min_exact, zero overruns),
    armed (quarantines only), insufficient (too few exacts); rows from
    parse-failed streams (table_id NULL) are excluded."""
    from rustcheatersdatapipeline_spark.streaming.ingest import (
        MediaIngestSink,
        mp3_certification_report,
    )

    store = GoldStore(spark, str(tmp_path / "gold"))
    cols = [f.split(" ")[0] for f in MediaIngestSink.CERT_SCHEMA.split(", ")]
    rows = [
        # (item, table, n, exact, slack, overrun, quarantined, ...)
        # consistent overruns (5/10, >= refute_min and >= refute_rate)
        ("a", 12, 10, 4, 1, 5, 0, None, None, None, None, None),   # refuted
        # heavy exact evidence + ONE stray overrun (a bit-corrupted
        # crawled file) must NOT refute (r13 review)
        ("a", 1, 100, 96, 4, 0, 0, None, None, None, None, None),  # certified
        ("b", 1, 40, 31, 8, 1, 0, None, None, None, None, None),
        ("b", 16, 6, 0, 0, 0, 6, None, None, None, None, None),    # armed
        ("b", 5, 4, 2, 2, 0, 0, None, None, None, None, None),     # insufficient
        ("c", None, 0, 0, 0, 0, 0, 0, 0, 0, 0, "MP3: lost frame sync"),
    ]
    frame = spark.createDataFrame(
        [dict(zip(cols, r)) for r in rows], MediaIngestSink.CERT_SCHEMA
    )
    store.publish({"mp3_certification": frame}, store.current_version())

    rep = {
        r["table_id"]: r["verdict"]
        for r in mp3_certification_report(store, min_exact=64).collect()
    }
    assert rep == {12: "refuted", 1: "certified", 16: "armed", 5: "insufficient"}
