"""Oracle tests for the analytics queries (multimodal + sessionize),
plus the multimodal stub contract."""

import pytest

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.functions.multimodal import (
    featurize_media,
    media_table,
)
from rustcheatersdatapipeline_spark.plans import analytics as A

from .helpers import assert_matches_oracle


_ALL_QUERIES = {**A.SPARK_QUERIES, **A.TESTS_ONLY_QUERIES}
_ALL_ORACLES = {**A.ORACLE_SQL, **A.TESTS_ONLY_ORACLE_SQL}


@pytest.mark.parametrize("name", sorted(_ALL_ORACLES))
def test_analytics_matches_oracle(spark, ddb, sf_dir, name):
    df = _ALL_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ddb, _ALL_ORACLES[name], name)


def test_multimodal_checksum_is_byte_based_for_non_ascii(spark, tmp_path):
    """The fake decode sums UTF-8 BYTES; the oracle must too. A
    code-point oracle (ord per char) agrees on ASCII and silently
    diverges on anything else — pinned here with multi-byte text."""
    import duckdb

    rows = [
        (1, "plain ascii text"),
        (2, "héllo wörld — naïve café"),
        (3, "日本語のテキスト ✓"),
        (4, "emoji 🎉🚀 and ½ fractions"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    path = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    df = A.multimodal_features(spark, str(tmp_path))
    assert_matches_oracle(df, con, A.ORACLE_SQL["multimodal_features"], "multimodal_nonascii")
    # and the checksum really is the byte sum
    got = {r["item_id"]: r["checksum"] for r in df.collect()}
    for doc_id, text in rows:
        assert got[doc_id] == sum(text.encode("utf-8")), doc_id


def test_real_decode_quarantines_non_media_payloads(spark, sf_dir):
    """fake=False is a REAL header decode since round 5: payloads that
    are neither PNG nor WAV quarantine as octet-stream with NULL
    dimensions (never a task failure); full pixel decode remains the
    explicit decode_pixels stub (tests/test_multimodal_real_decode.py)."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    media = media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text/plain")
    out = featurize_media(media, fake=False).limit(5).collect()
    assert all(
        r["mime"] == "application/octet-stream"
        and r["width"] is None
        and r["n_frames"] == 0
        for r in out
    )


def test_funnel_drops_on_planted_chains(spark):
    """The synthetic corpus converts fully (every user does everything
    constantly) — plant chains where the strict ordering actually
    bites: out-of-order steps must not advance the funnel."""
    from datetime import datetime

    from rustcheatersdatapipeline_spark.plans.analytics import funnel_frame

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: clean view < click < purchase — all 3 steps
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: click BEFORE its first view — stops at step 1
        (2, t(2), "view"), (2, t(1), "click"),
        # u3: purchase before the click — steps 1-2 only
        (3, t(1), "view"), (3, t(3), "click"), (3, t(2), "purchase"),
        # u4: no view at all — contributes to nothing
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, ts, et) for u, ts, et in rows],
        "user_id bigint, ts timestamp, event_type string",
    )
    got = {r["step"]: r["n_users"] for r in funnel_frame(ev).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_resample_fills_planted_gaps(spark, sf_dir):
    """Every grid cell is populated, the grid is contiguous per user,
    and filled values equal the most recent observation."""
    from rustcheatersdatapipeline_spark.plans.analytics import events_resample_hourly

    rows = events_resample_hourly(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["h"], r["value_ffill"]))
    assert by_user
    for u, cells in by_user.items():
        hs = [h for h, _ in cells]
        assert hs == list(range(min(hs), max(hs) + 1)), u  # contiguous grid
        assert all(v is not None for _, v in cells), u  # first cell observed
