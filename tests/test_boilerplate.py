"""Domain boilerplate removal (operators/boilerplate.py), checked
against a pure-Python replica oracle that recomputes the frequency
heuristic from the same literals — plus targeted invariants: line
order preserved, small groups untouched, cross-domain isolation,
all-template documents become empty, blank lines survive."""

import pytest

from rustcheatersdatapipeline_spark.operators.boilerplate import (
    BOILERPLATE_FRAC,
    MIN_GROUP_DOCS,
    remove_boilerplate,
)

HEADER = "SITE A | home | products | contact"
FOOTER = "(c) site-a 2024 - all rights reserved"


def _docs():
    a_pages = [
        (1, "a.test", f"{HEADER}\nunique alpha content one\n\n{FOOTER}"),
        (2, "a.test", f"{HEADER}\nunique beta content two\n{FOOTER}"),
        (3, "a.test", f"{HEADER}\nunique gamma content three\n{FOOTER}"),
        (4, "a.test", "no template on this odd page"),
    ]
    # b.test reuses a.test's header text but has only TWO docs (< min):
    # frequency carries no signal; nothing may be stripped
    b_pages = [
        (10, "b.test", f"{HEADER}\nb-one content"),
        (11, "b.test", f"{HEADER}\nb-two content"),
    ]
    return a_pages + b_pages


def _oracle(rows, frac=BOILERPLATE_FRAC, min_docs=MIN_GROUP_DOCS):
    from collections import defaultdict

    by_grp = defaultdict(list)
    for i, g, t in rows:
        by_grp[g].append((i, t))
    out = {}
    for g, docs in by_grp.items():
        counts = defaultdict(set)
        for i, t in docs:
            for line in t.split("\n"):
                if line.strip():
                    counts[line].add(i)
        n = len(docs)
        template = {
            line for line, ids in counts.items() if n >= min_docs and len(ids) >= frac * n
        }
        for i, t in docs:
            lines = t.split("\n")
            kept = [ln for ln in lines if ln not in template]
            out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_matches_pure_python_oracle(spark):
    rows = _docs()
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate(df).collect()
    }
    assert got == _oracle(rows)


def test_header_footer_stripped_order_and_blanks_preserved(spark):
    df = spark.createDataFrame(_docs(), "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate(df).collect()}
    # doc 1 keeps its content line AND its blank line, in order
    assert out[1]["text"] == "unique alpha content one\n"
    assert out[1]["n_removed"] == 2
    # the odd page had no template lines: untouched
    assert out[4]["text"] == "no template on this odd page"
    assert out[4]["n_removed"] == 0
    # b.test (2 docs < MIN_GROUP_DOCS): same header text survives there
    assert out[10]["text"].startswith(HEADER)


def test_all_template_doc_becomes_empty(spark):
    rows = [(i, "c.test", "only template here") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = remove_boilerplate(df).collect()
    assert all(r["text"] == "" and r["n_removed"] == 1 for r in out)


def test_threshold_boundary(spark):
    """A line in exactly frac of the group's docs IS template (>=)."""
    rows = [
        (1, "d.test", "maybe\nx1"),
        (2, "d.test", "maybe\nx2"),
        (3, "d.test", "y3"),
        (4, "d.test", "y4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate(df).collect()}
    assert out[1] == "x1" and out[2] == "x2"  # 2/4 = 0.5 >= frac → stripped
