"""JSONL corpus interchange (sources/jsonl.py): pinned-schema read with
quarantine, sized shard write, round trip through the documents table."""

import glob
import gzip
import json

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.sources.jsonl import (
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_read_quarantines_corrupt_and_textless_lines(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}),
        '{"doc_id": 2, "text": "gam',  # torn line
        json.dumps({"doc_id": 3, "lang": "en", "source": "web"}),  # no text
        json.dumps({"doc_id": 4, "text": "delta", "lang": "de", "source": "book"}),
        "not json at all",
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")

    good, quarantine = read_documents_jsonl(spark, str(p))
    got = {r["doc_id"]: r for r in good.collect()}
    assert set(got) == {1, 4}
    assert got[1]["n_chars"] == len("alpha beta")
    assert quarantine.count() == 3  # torn + textless + junk


def test_roundtrip_documents_table(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    out = str(tmp_path / "shards")
    write_documents_jsonl(docs, out, rows_per_shard=64)

    files = glob.glob(f"{out}/part-*.json")
    assert files
    # shard size cap holds
    for f in files:
        with open(f) as fh:
            assert sum(1 for _ in fh) <= 64

    good, quarantine = read_documents_jsonl(spark, out)
    assert quarantine.count() == 0
    want = sorted((r["doc_id"], r["text"]) for r in docs.collect())
    got = sorted((r["doc_id"], r["text"]) for r in good.collect())
    assert got == want


def test_gzip_roundtrip(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    out = str(tmp_path / "gz")
    write_documents_jsonl(docs, out, rows_per_shard=1000, compression="gzip")
    gz = glob.glob(f"{out}/part-*.json.gz")
    assert gz
    with gzip.open(gz[0], "rt") as fh:
        json.loads(next(fh))  # genuinely gzipped JSONL
    good, _ = read_documents_jsonl(spark, out)
    assert good.count() == docs.count()


def test_quarantine_carries_original_raw_line_and_no_cache_leak(spark, tmp_path):
    """ADVICE r5: (a) the quarantine 'raw' must be the verbatim input
    line even for schema-valid-but-textless records (not a re-serialized
    struct); (b) repeated reads must not leak entries into the session's
    block-manager cache."""
    textless = json.dumps({"doc_id": 3, "lang": "en", "source": "web"})
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha", "lang": "en", "source": "web"}),
        textless,
        "not json at all",
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")

    spark.catalog.clearCache()
    good, quarantine = read_documents_jsonl(spark, str(p))
    raws = {r["raw"] for r in quarantine.collect()}
    assert textless in raws  # verbatim, byte-for-byte
    assert "not json at all" in raws
    assert good.count() == 1
    # nothing pinned: the read path needs no .cache() workaround
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
