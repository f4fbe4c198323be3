"""Physical-plan regression guards: pushdown, pruning, broadcast, and
partial aggregation must survive future refactors (the 100 TB
properties, asserted mechanically)."""

import io
import contextlib

import pytest

from rustcheatersdatapipeline_spark.plans import queries as Q


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_projection_prunes_scan(spark, sf_dir):
    p = _plan(Q.q1(spark, sf_dir))
    assert "l_quantity" in p
    assert "l_extendedprice" not in p  # unneeded column never read


def test_filter_pushed_to_parquet(spark, sf_dir):
    p = _plan(Q.q4(spark, sf_dir))
    assert "StringContains(p_name,green)" in p  # PushedFilters reached the scan


def test_multiway_join_broadcasts_dims(spark, sf_dir):
    p = _plan(Q.q15(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # dims must never sort-merge


def test_groupby_partial_aggregates(spark, sf_dir):
    p = _plan(Q.q22(spark, sf_dir))
    assert "partial_count" in p  # map-side combine before the exchange


def test_topk_plans_take_ordered(spark, sf_dir):
    p = _plan(Q.q23(spark, sf_dir))
    assert "TakeOrderedAndProject" in p  # top-k, not global sort


@pytest.mark.parametrize("qname", ["q2", "q3", "q5"])
def test_predicates_reach_scans(spark, sf_dir, qname):
    p = _plan(Q.SPARK_QUERIES[qname](spark, sf_dir))
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
