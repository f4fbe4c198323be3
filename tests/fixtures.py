"""Synthetic bronze JSON fixtures shaped like the reference's raw zone
(FIXTURES.md §A), including the drift cases the reference repairs:
private profiles with absent inner arrays, missing optional fields,
empty-string descriptions, unlocktime=0 sentinels."""

from __future__ import annotations

import json

FIXTURES: dict[str, dict] = {
    "player_achievements": {
        "responses": [
            {
                "queried_steam_id": "76561198000000001",
                "playerstats": {
                    "gameName": "Rust",
                    "achievements": [
                        {
                            "apiname": "KILL",
                            "achieved": 1,
                            "unlocktime": 1600000000,
                            "name": "First Kill",
                            "description": "",
                        },
                        {
                            "apiname": "CHOP",
                            "achieved": 1,
                            "unlocktime": 1600000100,
                            "name": "Wood Chopper",
                            "description": "Chop a tree",
                        },
                        {
                            "apiname": "NOPE",
                            "achieved": 0,
                            "unlocktime": 0,
                            "name": "Not Yet",
                            "description": "Locked",
                        },
                    ],
                },
            },
            # private profile: playerstats absent entirely
            {"queried_steam_id": "76561198000000002"},
        ]
    },
    "player_steam_badges": {
        "responses": [
            {
                "queried_steam_id": "76561198000000001",
                "response": {
                    "badges": [
                        {
                            "badgeid": 13,
                            "appid": 252490,
                            "communityitemid": "170000000000001",
                            "xp": 100,
                            "level": 2,
                            "completion_time": 1600000200,
                            "scarcity": 5000,
                        },
                        # optional appid/communityitemid absent
                        {
                            "badgeid": 1,
                            "xp": 50,
                            "level": 1,
                            "completion_time": 0,
                            "scarcity": 100,
                        },
                    ],
                    "player_level": 42,
                },
            },
            {"queried_steam_id": "76561198000000002", "response": {}},
        ]
    },
    "player_friendlists": {
        "responses": [
            {
                "queried_steam_id": "76561198000000001",
                "friendslist": {
                    "friends": [
                        {
                            "steamid": "76561198000000010",
                            "relationship": "friend",
                            "friend_since": 1500000000,
                        },
                        {
                            "steamid": "76561198000000011",
                            "relationship": "friend",
                            "friend_since": 1500000100,
                        },
                    ]
                },
            },
            {"queried_steam_id": "76561198000000002"},
        ]
    },
    "player_bans": {
        "responses": [
            {
                "players": [
                    {
                        "SteamId": "76561198000000001",
                        "CommunityBanned": False,
                        "VACBanned": True,
                        "NumberOfVACBans": 1,
                        "DaysSinceLastBan": 10,
                        "NumberOfGameBans": 0,
                        "EconomyBan": "none",
                    },
                    {
                        "SteamId": "76561198000000002",
                        "CommunityBanned": True,
                        "VACBanned": False,
                        "NumberOfVACBans": 0,
                        "DaysSinceLastBan": 0,
                        "NumberOfGameBans": 2,
                        "EconomyBan": "banned",
                    },
                ]
            }
        ]
    },
    "player_subscribed_groups": {
        "responses": [
            {
                "queried_steam_id": "76561198000000001",
                "response": {"groups": [{"gid": "103582791429521412"}, {"gid": "42"}]},
            },
            {"queried_steam_id": "76561198000000002", "response": {}},
        ]
    },
    "player_stats": {
        "responses": [
            {
                "queried_steam_id": "76561198000000001",
                "playerstats": {
                    "stats": [
                        {"name": "kills", "value": 250.0},
                        {"name": "deaths", "value": 300.5},
                    ]
                },
            },
            {"queried_steam_id": "76561198000000002", "playerstats": {}},
        ]
    },
    "player_owned_games": {
        "responses": [
            {
                "queried_steam_id": "76561198000000001",
                "response": {
                    "games": [
                        {
                            "appid": 252490,
                            "name": "Rust",
                            "has_community_visible_stats": True,
                            "playtime_windows_forever": 6000,
                            "playtime_mac_forever": 0,
                            "playtime_linux_forever": 0,
                            "playtime_2weeks": 600,
                            "playtime_forever": 6000,
                        },
                        # optional fields absent
                        {
                            "appid": 730,
                            "name": "Counter-Strike 2",
                            "playtime_windows_forever": 100,
                            "playtime_mac_forever": 0,
                            "playtime_linux_forever": 0,
                            "playtime_forever": 100,
                        },
                    ]
                },
            },
            {"queried_steam_id": "76561198000000002", "response": {}},
        ]
    },
    "player_summaries": {
        "responses": [
            {
                "response": {
                    "players": [
                        {
                            "steamid": "76561198000000001",
                            "communityvisibilitystate": 3,
                            "profilestate": 1,
                            "personaname": "cheater_one",
                            "avatarhash": "abcdef",
                            "personastate": 1,
                            "timecreated": 1400000000,
                            "commentpermission": 1,
                            "realname": "Some Name",
                            "primaryclanid": "103582791429521412",
                            "loccountrycode": "US",
                            "locstatecode": "WA",
                            "loccityid": 3961,
                            "gameid": "252490",
                        },
                        # minimal profile: optional fields absent
                        {
                            "steamid": "76561198000000002",
                            "communityvisibilitystate": 1,
                            "profilestate": 1,
                            "personaname": "private_person",
                            "avatarhash": "123456",
                            "personastate": 0,
                            "timecreated": 1410000000,
                        },
                        # duplicate steam_id (exercises D1 dedup)
                        {
                            "steamid": "76561198000000002",
                            "communityvisibilitystate": 1,
                            "profilestate": 1,
                            "personaname": "private_person_dup",
                            "avatarhash": "123456",
                            "personastate": 0,
                            "timecreated": 1410000000,
                        },
                    ]
                }
            }
        ]
    },
}


def write_fixtures(dirpath) -> dict[str, str]:
    """Write each fixture as a single-line JSON file; returns name→path."""
    out = {}
    for name, payload in FIXTURES.items():
        p = str(dirpath / f"{name}.json")
        with open(p, "w") as fh:
            fh.write(json.dumps(payload))
        out[name] = p
    return out
