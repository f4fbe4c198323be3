"""The 16 dim/fact silver builders (SURVEY.md §3.2).

Each mirrors one reference transform
(dags/scripts/rust_twitter_steam_dims.py / rust_twitter_steam_facts.py)
as ONE lazy DataFrame expression: flatten (P1/P2) → clean (P8-P13) →
dedup (D1) → project (P3). Catalyst collapses everything before the
dedup into a single stage; the deterministic keyed dedup is the only
shuffle (SURVEY.md §3.2 "Spark mapping").

Signature: ``f(bronze_df, interval_end=None) -> DataFrame``.
``interval_end`` (a datetime) is the batch stamp the reference injects
from the Airflow data interval (facts.py:151,373,447,450,513) and the
anchor for P14 date arithmetic (facts.py:213-216).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cleaning import conditional_overwrite, drop_null_rows, epoch_to_ts
from ..operators.dedup import keyed_dedup
from ..operators.flatten import explode_wrapper


def _nonzero_ts(col: str):
    """Steam uses unlocktime/completion_time 0 for 'never' — null it
    before epoch conversion (matches pandas NaT on invalid)."""
    return F.when(F.col(col) > 0, epoch_to_ts(col)).otherwise(F.lit(None))


# --------------------------------------------------------------------------
# dims (reference rust_twitter_steam_dims.py)
# --------------------------------------------------------------------------

def achievement_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:14-77 (transform_achievements_dim)."""
    df = explode_wrapper(
        bronze, ["responses", "playerstats", "achievements"], outer=True
    ).select("name", "description")
    df = conditional_overwrite(df, "description", "name")  # dims.py:29
    df = drop_null_rows(df, ["name"])  # dims.py:33
    return keyed_dedup(df, ["name", "description"])  # dims.py:43


def badges_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:85-183 (transform_badges_dim)."""
    df = explode_wrapper(bronze, ["responses", "response", "badges"], outer=True)
    df = df.select(
        F.col("badgeid").cast("long").alias("badge_id"),
        F.coalesce(F.col("appid"), F.lit(-1)).cast("long").alias("app_id"),  # dims.py:115
        F.coalesce(F.col("communityitemid"), F.lit("-1")).cast("long").alias(
            "community_item_id"
        ),
        F.col("xp").cast("int").alias("xp"),
        F.col("level").cast("int").alias("level"),
    )
    df = drop_null_rows(df, ["badge_id"])  # dims.py:112
    return keyed_dedup(df, ["badge_id", "app_id", "community_item_id", "xp", "level"])


def relationship_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:190-237 (transform_relationship_dim)."""
    df = explode_wrapper(
        bronze, ["responses", "friendslist", "friends"], outer=True
    ).select("relationship")
    df = drop_null_rows(df, ["relationship"])
    return keyed_dedup(df, ["relationship"])  # dims.py:202


def game_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:245-325 (transform_game_dim)."""
    df = explode_wrapper(bronze, ["responses", "response", "games"], outer=True)
    df = df.select(
        F.col("appid").cast("long").alias("game_id"),
        F.col("name").alias("name"),
        F.coalesce(F.col("has_community_visible_stats"), F.lit(False)).alias(
            "has_community_visible_stats"
        ),  # dims.py:269-273 fillna 0
    )
    df = drop_null_rows(df, ["game_id", "name"])  # dims.py:266
    return keyed_dedup(df, ["game_id", "name"])  # dims.py:291


def stats_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:333-403 (transform_stats_dim)."""
    df = explode_wrapper(
        bronze, ["responses", "playerstats", "stats"], outer=True
    ).select("name")
    df = drop_null_rows(df, ["name"])  # dims.py:356
    return keyed_dedup(df, ["name"])  # dims.py:359


def group_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:410-452 (transform_group_dim)."""
    df = explode_wrapper(bronze, ["responses", "response", "groups"], outer=True)
    df = df.select(F.col("gid").cast("long").alias("group_id")).transform(lambda d: drop_null_rows(d, d.columns))
    return keyed_dedup(df, ["group_id"])  # dims.py:425


def player_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:459-579 (transform_player_dim).

    13-column profile projection with epoch conversion (dims.py:495-497),
    Int64 casts (dims.py:519-530), and steam_id dedup (dims.py:533).
    Optional fields are nullable in the bronze schema, subsuming the
    ensure-columns repair (dims.py:482-492).
    """
    df = explode_wrapper(bronze, ["responses", "response", "players"], outer=True)
    df = df.select(
        F.col("steamid").cast("long").alias("steam_id"),
        epoch_to_ts("timecreated").alias("created_at"),
        F.col("communityvisibilitystate").cast("int").alias("community_vis_state"),
        F.col("profilestate").cast("int").alias("profile_state"),
        F.col("personaname").alias("persona_name"),
        F.col("avatarhash").alias("avatar_hash"),
        F.col("personastate").cast("int").alias("persona_state"),
        F.col("commentpermission").cast("int").alias("comment_permission"),
        F.col("realname").alias("real_name"),
        F.col("primaryclanid").cast("long").alias("primary_clan_id"),
        F.col("loccountrycode").alias("loc_country_code"),
        F.col("locstatecode").alias("loc_state_code"),
        F.col("loccityid").cast("int").alias("loc_city_id"),
    )
    df = drop_null_rows(df, ["steam_id"])
    return keyed_dedup(df, ["steam_id"])  # dims.py:533


def friend_dim(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_dims.py:587-643 (transform_friend_dim)."""
    df = explode_wrapper(bronze, ["responses", "friendslist", "friends"], outer=True)
    df = df.select(F.col("steamid").cast("long").alias("steam_id")).transform(lambda d: drop_null_rows(d, d.columns))
    return keyed_dedup(df, ["steam_id"])  # dims.py:612


# --------------------------------------------------------------------------
# facts (reference rust_twitter_steam_facts.py)
# --------------------------------------------------------------------------

def achievement_fact(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_facts.py:14-90 (transform_achievement_fact)."""
    df = explode_wrapper(
        bronze,
        ["responses", "playerstats", "achievements"],
        meta={"steam_id_raw": "queried_steam_id", "game_name": "playerstats.gameName"},
        outer=True,
    )
    df = df.filter(F.col("achieved") == 1)  # facts.py:28
    return df.select(
        F.col("steam_id_raw").cast("long").alias("steam_id"),
        F.col("name"),
        F.col("game_name"),
        _nonzero_ts("unlocktime").alias("unlock_ts"),  # facts.py:31-33
    )


def badges_fact(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_facts.py:565-671 (transform_badges_fact)."""
    df = explode_wrapper(
        bronze,
        ["responses", "response", "badges"],
        meta={
            "steam_id_raw": "queried_steam_id",
            "steam_level_raw": "response.player_level",  # facts.py:577-582
        },
        outer=True,
    )
    df = df.select(
        F.col("steam_id_raw").cast("long").alias("steam_id"),
        F.col("badgeid").cast("long").alias("badge_id"),
        F.coalesce(F.col("appid"), F.lit(-1)).cast("long").alias("app_id"),  # facts.py:596
        F.coalesce(F.col("communityitemid"), F.lit("-1")).cast("long").alias(
            "community_item_id"
        ),
        F.col("xp").cast("int").alias("xp"),
        F.col("level").cast("int").alias("level"),
        _nonzero_ts("completion_time").alias("completion_time"),  # facts.py:600-602
        F.col("scarcity").cast("int").alias("scarcity"),
        F.col("steam_level_raw").cast("int").alias("steam_level"),  # facts.py:608
    )
    return df.transform(lambda d: drop_null_rows(d, ["steam_id", "badge_id"]))  # facts.py:593,631


def bans_fact(bronze: DataFrame, interval_end: _dt.datetime | None = None) -> DataFrame:
    """reference rust_twitter_steam_facts.py:203-286 (transform_bans_fact).

    P14 date arithmetic: last_ban_date = interval_end − DaysSinceLastBan
    days (facts.py:213-216) — a codegen'd timestampadd, not a row-wise
    Python lambda.
    """
    df = explode_wrapper(bronze, ["responses", "players"], outer=True)
    end = F.lit(interval_end).cast("timestamp")
    return (
        df.select(
            F.col("SteamId").cast("long").alias("steam_id"),
            (end - F.make_interval(days=F.col("DaysSinceLastBan"))).alias(
                "last_ban_date"
            ),
            F.col("NumberOfVACBans").cast("long").alias("num_vac_bans"),
            F.col("NumberOfGameBans").cast("long").alias("num_game_bans"),
            F.col("CommunityBanned").alias("community_banned"),
            F.col("EconomyBan").alias("economy_ban"),
            F.col("VACBanned").alias("vac_banned"),
        )
        .transform(lambda d: drop_null_rows(d, ["steam_id"]))
    )


def friends_fact(bronze: DataFrame, interval_end=None) -> DataFrame:
    """reference rust_twitter_steam_facts.py:284-351 (transform_friends_fact)."""
    df = explode_wrapper(
        bronze,
        ["responses", "friendslist", "friends"],
        meta={"steam_id_raw": "queried_steam_id"},
        outer=True,
    )
    return (
        df.select(
            F.col("steam_id_raw").cast("long").alias("steam_id"),
            F.col("steamid").cast("long").alias("friend_steam_id"),
            epoch_to_ts("friend_since").alias("friend_since"),  # facts.py:298-300
            F.col("relationship"),
        )
        .transform(lambda d: drop_null_rows(d, ["steam_id", "friend_steam_id"]))
    )


def game_playing_banned_fact(
    bronze: DataFrame, interval_end: _dt.datetime | None = None
) -> DataFrame:
    """reference rust_twitter_steam_facts.py:491-558
    (transform_game_playing_banned_fact): players in-game at ban time."""
    df = explode_wrapper(bronze, ["responses", "response", "players"], outer=True)
    return (
        df.filter(F.col("gameid").isNotNull() & (F.col("gameid") != "NaN"))  # facts.py:526
        .select(
            F.col("steamid").cast("long").alias("steam_id"),
            F.col("gameid").cast("long").alias("game_id"),
            F.lit(interval_end).cast("timestamp").alias("date"),  # facts.py:513
        )
        .transform(lambda d: drop_null_rows(d, ["steam_id"]))  # facts.py:516
    )


def game_playtime_fact(
    bronze: DataFrame, interval_end: _dt.datetime | None = None
) -> DataFrame:
    """reference rust_twitter_steam_facts.py:92-196 (transform_game_playtime_fact)."""
    df = explode_wrapper(
        bronze,
        ["responses", "response", "games"],
        meta={"steam_id_raw": "queried_steam_id"},
        outer=True,
    )
    return (
        df.select(
            F.col("steam_id_raw").cast("long").alias("steam_id"),
            F.col("appid").cast("long").alias("game_id"),
            F.lit(interval_end).cast("timestamp").alias("date"),  # facts.py:151
            F.coalesce(F.col("playtime_windows_forever"), F.lit(0))
            .cast("long")
            .alias("playtime_windows_mins"),  # facts.py:115-123
            F.coalesce(F.col("playtime_mac_forever"), F.lit(0))
            .cast("long")
            .alias("playtime_mac_mins"),
            F.coalesce(F.col("playtime_linux_forever"), F.lit(0))
            .cast("long")
            .alias("playtime_linux_mins"),
            F.coalesce(F.col("playtime_2weeks"), F.lit(0))
            .cast("long")
            .alias("playtime_two_weeks_mins"),
        )
        .transform(lambda d: drop_null_rows(d, ["steam_id", "game_id"]))  # facts.py:112
    )


def groups_fact(bronze: DataFrame, interval_end: _dt.datetime | None = None) -> DataFrame:
    """reference rust_twitter_steam_facts.py:355-415 (transform_groups_fact)."""
    df = explode_wrapper(
        bronze,
        ["responses", "response", "groups"],
        meta={"steam_id_raw": "queried_steam_id"},
        outer=True,
    )
    return (
        df.select(
            F.col("steam_id_raw").cast("long").alias("steam_id"),
            F.col("gid").cast("long").alias("group_id"),
            F.lit(interval_end).cast("timestamp").alias("date"),  # facts.py:373
        )
        .transform(lambda d: drop_null_rows(d, ["steam_id", "group_id"]))
    )


def stats_fact(bronze: DataFrame, interval_end: _dt.datetime | None = None) -> DataFrame:
    """reference rust_twitter_steam_facts.py:420-486 (transform_stats_fact)."""
    df = explode_wrapper(
        bronze,
        ["responses", "playerstats", "stats"],
        meta={"steam_id_raw": "queried_steam_id"},
        outer=True,
    )
    return (
        df.select(
            F.col("name"),
            F.col("steam_id_raw").cast("long").alias("steam_id"),
            F.lit("Rust").alias("game"),  # facts.py:447
            F.lit(interval_end).cast("timestamp").alias("date"),  # facts.py:450
            F.col("value").cast("float").alias("value"),
        )
        .transform(lambda d: drop_null_rows(d, ["steam_id", "name"]))
    )


DIM_TRANSFORMS = {
    "achievement_dim": (achievement_dim, "player_achievements"),
    "badges_dim": (badges_dim, "player_steam_badges"),
    "relationship_dim": (relationship_dim, "player_friendlists"),
    "game_dim": (game_dim, "player_owned_games"),
    "stats_dim": (stats_dim, "player_stats"),
    "group_dim": (group_dim, "player_subscribed_groups"),
    "player_dim": (player_dim, "player_summaries"),
    "friend_dim": (friend_dim, "player_friendlists"),
}

FACT_TRANSFORMS = {
    "achievement_fact": (achievement_fact, "player_achievements"),
    "badges_fact": (badges_fact, "player_steam_badges"),
    "bans_fact": (bans_fact, "player_bans"),
    "friends_fact": (friends_fact, "player_friendlists"),
    "game_playing_banned_fact": (game_playing_banned_fact, "player_summaries"),
    "game_playtime_fact": (game_playtime_fact, "player_owned_games"),
    "groups_fact": (groups_fact, "player_subscribed_groups"),
    "stats_fact": (stats_fact, "player_stats"),
}
