"""A1-A8 insight queries over the fixture-built gold warehouse."""

import datetime

import pytest

from rustcheatersdatapipeline_spark.pipeline import run_batch
from rustcheatersdatapipeline_spark.plans.insights import INSIGHTS

from .fixtures import write_fixtures


@pytest.fixture(scope="module")
def gold(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bronze_ins")
    write_fixtures(d)
    res = run_batch(spark, str(d), datetime.datetime(2022, 1, 15, 12, 0, 0))
    assert res.succeeded
    return {k: v.cache() for k, v in res.gold.items()}


def test_all_insights_run(gold):
    for name, fn in INSIGHTS.items():
        rows = fn(gold).collect()
        assert len(rows) > 0, name
        assert "cnt" in rows[0].asDict(), name


def test_bans_per_country_values(gold):
    rows = INSIGHTS["a1_bans_per_country"](gold).collect()
    # fixtures: player 1 is US, player 2 has no country (null bucket)
    assert {(r["loc_country_code"], r["cnt"]) for r in rows} == {("US", 1), (None, 1)}


def test_modal_steam_level(gold):
    row = INSIGHTS["a2_modal_steam_level"](gold).collect()[0]
    assert row["steam_level"] == 42 and row["cnt"] == 1


def test_top_owned_games(gold):
    rows = INSIGHTS["a6_top_owned_games"](gold).collect()
    assert [r["name"] for r in rows] == ["Counter-Strike 2", "Rust"]
