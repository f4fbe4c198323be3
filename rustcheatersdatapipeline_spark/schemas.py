"""Bronze StructType contracts for the reference's raw JSON zone.

The reference infers schemas with pd.json_normalize and then repairs
drift defensively (SURVEY.md §1.4: reference
dags/scripts/rust_twitter_steam_dims.py:94-96,107-109,482-492). The
engine instead pins explicit nullable schemas — absent keys read as
null, absent arrays explode_outer to a null row — which subsumes the
reference's repair code (P11/P16) at plan time.

Shapes derive from the reference's record_path/meta flattening args and
drift repairs, catalogued in FIXTURES.md §A (citations there).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


#: A1 — twitter timeline extract (reference helpers.py:40-48)
TWITTER_TIMELINE = _s(
    _f(
        "steam_profile_urls",
        ArrayType(
            _s(
                _f("profile_name_at_ban", StringType()),
                _f("profile_url", StringType()),
                _f("tweet_created_time", StringType()),
            )
        ),
    ),
    _f(
        "debug",
        _s(
            _f("extract_start_datetime", StringType()),
            _f("extract_end_datetime", StringType()),
            _f("logical_execution_datetime", StringType()),
        ),
    ),
)

_PLAYER_SUMMARY = _s(
    _f("steamid", StringType()),
    _f("communityvisibilitystate", IntegerType()),
    _f("profilestate", IntegerType()),
    _f("personaname", StringType()),
    _f("avatarhash", StringType()),
    _f("personastate", IntegerType()),
    _f("timecreated", LongType()),
    # optional per profile (reference rust_twitter_steam_dims.py:482-492)
    _f("commentpermission", IntegerType()),
    _f("realname", StringType()),
    _f("primaryclanid", StringType()),
    _f("loccountrycode", StringType()),
    _f("locstatecode", StringType()),
    _f("loccityid", IntegerType()),
    _f("gameid", StringType()),
)

#: A2 — GetPlayerSummaries, batched (no queried_steam_id)
PLAYER_SUMMARIES = _s(
    _f(
        "responses",
        ArrayType(_s(_f("response", _s(_f("players", ArrayType(_PLAYER_SUMMARY)))))),
    )
)

#: A3 — GetFriendList, per-id (reference rust_twitter_steam_dims.py:192-196)
PLAYER_FRIENDLISTS = _s(
    _f(
        "responses",
        ArrayType(
            _s(
                _f("queried_steam_id", StringType()),
                _f(
                    "friendslist",
                    _s(
                        _f(
                            "friends",
                            ArrayType(
                                _s(
                                    _f("steamid", StringType()),
                                    _f("relationship", StringType()),
                                    _f("friend_since", LongType()),
                                )
                            ),
                        )
                    ),
                ),
            )
        ),
    )
)

#: A4 — GetPlayerBans, batched (reference rust_twitter_steam_facts.py:210-232)
PLAYER_BANS = _s(
    _f(
        "responses",
        ArrayType(
            _s(
                _f(
                    "players",
                    ArrayType(
                        _s(
                            _f("SteamId", StringType()),
                            _f("CommunityBanned", BooleanType()),
                            _f("VACBanned", BooleanType()),
                            _f("NumberOfVACBans", IntegerType()),
                            _f("DaysSinceLastBan", IntegerType()),
                            _f("NumberOfGameBans", IntegerType()),
                            _f("EconomyBan", StringType()),
                        )
                    ),
                )
            )
        ),
    )
)

#: A5 — GetUserGroupList, per-id (reference rust_twitter_steam_dims.py:410-412)
PLAYER_GROUPS = _s(
    _f(
        "responses",
        ArrayType(
            _s(
                _f("queried_steam_id", StringType()),
                _f("response", _s(_f("groups", ArrayType(_s(_f("gid", StringType())))))),
            )
        ),
    )
)

#: A6 — GetPlayerAchievements, per-id (reference rust_twitter_steam_dims.py:21-23)
PLAYER_ACHIEVEMENTS = _s(
    _f(
        "responses",
        ArrayType(
            _s(
                _f("queried_steam_id", StringType()),
                _f(
                    "playerstats",
                    _s(
                        _f("gameName", StringType()),
                        _f(
                            "achievements",
                            ArrayType(
                                _s(
                                    _f("apiname", StringType()),
                                    _f("achieved", IntegerType()),
                                    _f("unlocktime", LongType()),
                                    _f("name", StringType()),
                                    _f("description", StringType()),
                                )
                            ),
                        ),
                    ),
                ),
            )
        ),
    )
)

#: A7 — GetUserStatsForGame, per-id (reference rust_twitter_steam_dims.py:341-350)
PLAYER_STATS = _s(
    _f(
        "responses",
        ArrayType(
            _s(
                _f("queried_steam_id", StringType()),
                _f(
                    "playerstats",
                    _s(
                        _f(
                            "stats",
                            ArrayType(
                                _s(_f("name", StringType()), _f("value", DoubleType()))
                            ),
                        )
                    ),
                ),
            )
        ),
    )
)

#: A8 — GetOwnedGames, per-id (reference rust_twitter_steam_dims.py:253-260)
OWNED_GAMES = _s(
    _f(
        "responses",
        ArrayType(
            _s(
                _f("queried_steam_id", StringType()),
                _f(
                    "response",
                    _s(
                        _f(
                            "games",
                            ArrayType(
                                _s(
                                    _f("appid", IntegerType()),
                                    _f("name", StringType()),
                                    _f("has_community_visible_stats", BooleanType()),
                                    _f("playtime_windows_forever", IntegerType()),
                                    _f("playtime_mac_forever", IntegerType()),
                                    _f("playtime_linux_forever", IntegerType()),
                                    _f("playtime_2weeks", IntegerType()),
                                    _f("playtime_forever", IntegerType()),
                                )
                            ),
                        )
                    ),
                ),
            )
        ),
    )
)

#: A9 — GetBadges, per-id (reference rust_twitter_steam_dims.py:94-101)
STEAM_BADGES = _s(
    _f(
        "responses",
        ArrayType(
            _s(
                _f("queried_steam_id", StringType()),
                _f(
                    "response",
                    _s(
                        _f(
                            "badges",
                            ArrayType(
                                _s(
                                    _f("badgeid", IntegerType()),
                                    _f("appid", IntegerType()),
                                    _f("communityitemid", StringType()),
                                    _f("xp", IntegerType()),
                                    _f("level", IntegerType()),
                                    _f("completion_time", LongType()),
                                    _f("scarcity", IntegerType()),
                                )
                            ),
                        ),
                        _f("player_level", IntegerType()),
                    ),
                ),
            )
        ),
    )
)

BRONZE_SCHEMAS: dict[str, StructType] = {
    "twitter_timeline": TWITTER_TIMELINE,
    "player_summaries": PLAYER_SUMMARIES,
    "player_friendlists": PLAYER_FRIENDLISTS,
    "player_bans": PLAYER_BANS,
    "player_subscribed_groups": PLAYER_GROUPS,
    "player_achievements": PLAYER_ACHIEVEMENTS,
    "player_stats": PLAYER_STATS,
    "player_owned_games": OWNED_GAMES,
    "player_steam_badges": STEAM_BADGES,
}
