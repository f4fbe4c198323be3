"""Distributed BPE training vs a sequential reference implementation:
the merge sequences must match exactly (same corpus, same tie-break)."""

import pytest
import duckdb

from rustcheatersdatapipeline_spark.plans.training import bpe_train

N_MERGES = 12


def _py_bpe(word_counts: dict[str, int], n: int):
    syms = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n):
        pc: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        merges.append((rank, left, right, merged, c))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    return merges


@pytest.mark.slow
def test_bpe_train_matches_sequential_reference(spark, sf_dir):
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(spark, sf_dir, n_merges=N_MERGES).collect()
    ]

    con = duckdb.connect()
    rows = con.execute(
        "SELECT w, COUNT(*) FROM (SELECT unnest(list_filter(string_split(text, ' '), "
        f"x -> x <> '')) AS w FROM read_parquet('{sf_dir}/documents.parquet')) GROUP BY w"
    ).fetchall()
    want = _py_bpe(dict(rows), N_MERGES)

    assert got == want and len(got) == N_MERGES


def test_bpe_encode_matches_sequential_apply(spark, sf_dir):
    """Encoding with the learned merges (one lazy plan, chained codegen
    folds) must equal the sequential per-word merge application."""
    from rustcheatersdatapipeline_spark.catalog import table
    from rustcheatersdatapipeline_spark.plans.training import bpe_encode

    trained = bpe_train(spark, sf_dir, n_merges=8)
    merges = [(r["left"], r["right"]) for r in trained.collect()]

    docs = table(spark, sf_dir, "documents").limit(50)
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).select("doc_id", "tokens", "n_bpe_tokens").collect()
    }

    def encode_word(w):
        s = list(w)
        for left, right in merges:
            out = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            s = out
        return s

    for r in docs.select("doc_id", "text").collect():
        toks = [t for w in r["text"].split(" ") if w for t in encode_word(w)]
        assert got[r["doc_id"]] == (toks, len(toks)), r["doc_id"]
