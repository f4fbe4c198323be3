"""Golden-behavior tests for the 16 silver transforms (SURVEY.md §5.2.2)."""

import datetime

import pytest

from rustcheatersdatapipeline_spark.schemas import BRONZE_SCHEMAS
from rustcheatersdatapipeline_spark.transforms.builders import (
    DIM_TRANSFORMS,
    FACT_TRANSFORMS,
    achievement_dim,
    achievement_fact,
    badges_dim,
    badges_fact,
    bans_fact,
    game_dim,
    game_playing_banned_fact,
    player_dim,
)

from .fixtures import write_fixtures

INTERVAL_END = datetime.datetime(2022, 1, 15, 12, 0, 0)


@pytest.fixture(scope="module")
def bronze(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bronze")
    paths = write_fixtures(d)
    return {
        name: spark.read.schema(BRONZE_SCHEMAS[name]).json(path)
        for name, path in paths.items()
    }


def test_all_transforms_run_and_project(bronze):
    expected_cols = {
        "achievement_dim": ["name", "description"],
        "badges_dim": ["badge_id", "app_id", "community_item_id", "xp", "level"],
        "relationship_dim": ["relationship"],
        "game_dim": ["game_id", "name", "has_community_visible_stats"],
        "stats_dim": ["name"],
        "group_dim": ["group_id"],
        "player_dim": [
            "steam_id", "created_at", "community_vis_state", "profile_state",
            "persona_name", "avatar_hash", "persona_state", "comment_permission",
            "real_name", "primary_clan_id", "loc_country_code", "loc_state_code",
            "loc_city_id",
        ],
        "friend_dim": ["steam_id"],
        "achievement_fact": ["steam_id", "name", "game_name", "unlock_ts"],
        "badges_fact": [
            "steam_id", "badge_id", "app_id", "community_item_id", "xp", "level",
            "completion_time", "scarcity", "steam_level",
        ],
        "bans_fact": [
            "steam_id", "last_ban_date", "num_vac_bans", "num_game_bans",
            "community_banned", "economy_ban", "vac_banned",
        ],
        "friends_fact": ["steam_id", "friend_steam_id", "friend_since", "relationship"],
        "game_playing_banned_fact": ["steam_id", "game_id", "date"],
        "game_playtime_fact": [
            "steam_id", "game_id", "date", "playtime_windows_mins",
            "playtime_mac_mins", "playtime_linux_mins", "playtime_two_weeks_mins",
        ],
        "groups_fact": ["steam_id", "group_id", "date"],
        "stats_fact": ["name", "steam_id", "game", "date", "value"],
    }
    for name, (fn, src) in {**DIM_TRANSFORMS, **FACT_TRANSFORMS}.items():
        df = fn(bronze[src], INTERVAL_END)
        assert df.columns == expected_cols[name], name
        df.collect()  # must execute without error


def test_achievement_dim_conditional_overwrite(bronze):
    rows = {r["name"]: r["description"] for r in achievement_dim(bronze["player_achievements"]).collect()}
    # P9: empty description replaced by name (reference dims.py:29)
    assert rows["First Kill"] == "First Kill"
    assert rows["Wood Chopper"] == "Chop a tree"
    assert len(rows) == 3  # achieved=0 rows still land in the dim


def test_achievement_fact_filters_unachieved(bronze):
    rows = achievement_fact(bronze["player_achievements"]).collect()
    assert sorted(r["name"] for r in rows) == ["First Kill", "Wood Chopper"]
    assert all(r["steam_id"] == 76561198000000001 for r in rows)
    assert all(r["game_name"] == "Rust" for r in rows)
    assert rows[0]["unlock_ts"].year == 2020


def test_badges_fillna_and_meta_level(bronze):
    dim = {r["badge_id"]: r for r in badges_dim(bronze["player_steam_badges"]).collect()}
    assert dim[1]["app_id"] == -1 and dim[1]["community_item_id"] == -1  # P10 fillna
    fact = badges_fact(bronze["player_steam_badges"]).collect()
    assert all(r["steam_level"] == 42 for r in fact)  # meta carry (P2)
    assert {r["completion_time"] for r in fact if r["badge_id"] == 1} == {None}  # 0 → null


def test_bans_fact_date_arithmetic(bronze):
    rows = {r["steam_id"]: r for r in bans_fact(bronze["player_bans"], INTERVAL_END).collect()}
    # P14: interval_end - DaysSinceLastBan days (reference facts.py:213-216)
    assert rows[76561198000000001]["last_ban_date"] == INTERVAL_END - datetime.timedelta(days=10)
    assert rows[76561198000000002]["last_ban_date"] == INTERVAL_END


def test_player_dim_dedup_deterministic(bronze):
    rows = {r["steam_id"]: r for r in player_dim(bronze["player_summaries"]).collect()}
    assert len(rows) == 2
    # survivor pinned by ordering (persona_name asc): 'private_person' < 'private_person_dup'
    assert rows[76561198000000002]["persona_name"] == "private_person"
    # optional absent fields → typed nulls (subsumes reference ensure-columns)
    assert rows[76561198000000002]["loc_country_code"] is None


def test_game_playing_banned_only_ingame(bronze):
    rows = game_playing_banned_fact(bronze["player_summaries"], INTERVAL_END).collect()
    assert [(r["steam_id"], r["game_id"]) for r in rows] == [(76561198000000001, 252490)]


def test_game_dim_fillna_visible_stats(bronze):
    rows = {r["game_id"]: r for r in game_dim(bronze["player_owned_games"]).collect()}
    assert rows[730]["has_community_visible_stats"] is False  # absent → default
    assert rows[252490]["has_community_visible_stats"] is True


def test_private_profiles_never_crash_nor_leak_rows(bronze):
    # P16: absent arrays (private profiles) yield zero rows after null-drop,
    # not job failures (reference repairs at dims.py:94-96 etc.)
    for name, (fn, src) in {**DIM_TRANSFORMS, **FACT_TRANSFORMS}.items():
        df = fn(bronze[src], INTERVAL_END)
        key = df.columns[0]
        assert df.filter(df[key].isNull()).count() == 0, name
