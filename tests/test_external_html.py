"""Real-document acceptance battery for the HTML→text path (VERDICT
r11 next-round #6) — the distiller analogue of the image battery in
``test_external_assets.py``.

/usr/share/doc ships hundreds of real HTML files from real generators
(doxygen, sphinx, texi2html, man2html, hand-written READMEs) — none of
them produced by anything in this repo. Every one must distill through
``functions/distill.payload_to_text`` without raising, yield non-empty
visible text, and pass a printable-fraction sanity gate; the whole
batch must then survive the Spark-side boilerplate-removal operator
(the first real-generator corpus it has seen). This is the acceptance
half of the 'passes its synthetic tests but chokes on real files' risk
for the text path.
"""

from __future__ import annotations

import os

import pytest

_ROOTS = ("/usr/share/doc", "/usr/share/gtk-doc")
_EXTS = (".html", ".htm", ".xhtml")


def _find_html(limit=300):
    out = []
    for root in _ROOTS:
        if not os.path.isdir(root):
            continue
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.lower().endswith(_EXTS):
                    p = os.path.join(dirpath, f)
                    try:
                        if os.path.getsize(p) > 0:
                            out.append(p)
                    except OSError:
                        pass
                    if len(out) >= limit:
                        return out
    return out


@pytest.mark.slow
def test_every_real_html_doc_distills():
    from rustcheatersdatapipeline_spark.functions.distill import payload_to_text
    from rustcheatersdatapipeline_spark.functions.pdftext import printable_fraction

    assets = _find_html()
    if len(assets) < 100:
        pytest.skip("environment ships too few real HTML docs")
    failures = []
    distilled = 0
    for path in assets:
        with open(path, "rb") as fh:
            data = fh.read()
        try:
            text = payload_to_text(data, name=os.path.basename(path))
        except Exception as exc:  # noqa: BLE001 — the contract is no-raise
            failures.append(f"{path}: raised {type(exc).__name__}: {exc}")
            continue
        if not text or not text.strip():
            failures.append(f"{path}: empty distillation")
            continue
        pf = printable_fraction(text)
        if pf < 0.97:
            failures.append(f"{path}: printable fraction {pf:.3f}")
            continue
        # visible text must not leak markup wholesale: a real extraction
        # of a doc page should not be dominated by angle brackets
        if text.count("<") > max(20, len(text) // 50):
            failures.append(f"{path}: {text.count('<')} '<' chars — markup leak?")
            continue
        distilled += 1
    assert not failures, f"{len(failures)}/{len(assets)} failed:\n" + "\n".join(
        failures[:15]
    )
    assert distilled >= 100


@pytest.mark.slow
def test_real_html_corpus_through_boilerplate_removal(spark):
    """The distilled real-generator corpus must flow through the
    Spark-side boilerplate operator: per-site template lines (doxygen
    footers, sphinx nav bars) get stripped, and every surviving
    document keeps ≥1 line. Groups by package directory — the natural
    'site' for generated docs."""
    from pyspark.sql import functions as F

    from rustcheatersdatapipeline_spark.functions.distill import payload_to_text
    from rustcheatersdatapipeline_spark.operators.boilerplate import (
        remove_boilerplate,
    )

    assets = _find_html()
    if len(assets) < 100:
        pytest.skip("environment ships too few real HTML docs")
    rows = []
    for path in assets:
        with open(path, "rb") as fh:
            # lines=True keeps block structure — the boilerplate pass is
            # line-frequency-based, so the collapsed form carries no signal
            text = payload_to_text(fh.read(), name=os.path.basename(path), lines=True)
        if text and text.strip():
            site = path.split("/usr/share/", 1)[1].split("/")[1]
            rows.append((path, site, text))
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = remove_boilerplate(docs).cache()
    got = out.agg(
        F.count("*").alias("n"),
        F.sum("n_removed").alias("removed"),
        F.min(F.col("n_lines") - F.col("n_removed")).alias("min_kept"),
    ).first()
    assert got["n"] == len(rows)  # nothing dropped, only lines stripped
    assert got["min_kept"] >= 1  # no document distilled to nothing
    # generated doc sites DO carry template lines; the operator must
    # find some in at least one multi-doc site
    assert got["removed"] > 0
    out.unpersist()
