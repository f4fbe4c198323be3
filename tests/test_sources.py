"""Rate-limited source tests with a fake transport (no network;
SURVEY.md §5.2 'recorded-fixture tests, no live APIs')."""

import pytest

from rustcheatersdatapipeline_spark.sources.steam import (
    HttpError,
    RateLimiter,
    SteamFetcher,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def now(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def make_fetcher(transport, interval=0.5):
    clk = FakeClock()
    limiter = RateLimiter(interval=interval, clock=clk.now, sleeper=clk.sleep)
    return SteamFetcher(transport=transport, limiter=limiter), clk


def test_rate_limit_enforced():
    calls = []
    f, clk = make_fetcher(lambda ep, p: calls.append(p) or {"response": {}})
    f.fetch("player_owned_games", ["1", "2", "3"], {"key": "k"})
    assert len(calls) == 3
    # 3 calls → ≥ 2 waits of 0.5s between them (token bucket)
    assert sum(clk.sleeps) >= 1.0


def test_batched_endpoint_chunks_100():
    seen = []
    f, _ = make_fetcher(lambda ep, p: seen.append(p["steamids"]) or {"players": []})
    f.fetch("player_bans", [str(i) for i in range(250)], {"key": "k"})
    assert [len(s.split(",")) for s in seen] == [100, 100, 50]


def test_per_id_provenance_tagging():
    f, _ = make_fetcher(lambda ep, p: {"response": {"games": []}})
    doc = f.fetch("player_owned_games", ["11", "22"], {"key": "k"})
    assert [r["queried_steam_id"] for r in doc["responses"]] == ["11", "22"]


def test_private_profile_quarantined_not_fatal():
    def transport(ep, p):
        if p["steamid"] == "22":
            raise HttpError(401, "private")
        return {"response": {}}

    f, _ = make_fetcher(transport)
    doc = f.fetch("player_owned_games", ["11", "22", "33"], {"key": "k"})
    assert len(doc["responses"]) == 2
    assert f.quarantine == [("player_owned_games", "22", 401)]


def test_429_retries_then_succeeds():
    attempts = []

    def transport(ep, p):
        attempts.append(1)
        if len(attempts) < 3:
            raise HttpError(429)
        return {"response": {}}

    f, clk = make_fetcher(transport)
    doc = f.fetch("player_owned_games", ["11"], {"key": "k"})
    assert len(doc["responses"]) == 1 and len(attempts) == 3
    assert any(s >= 1.0 for s in clk.sleeps)  # backoff slept


def test_param_validation_fails_fast():
    f, _ = make_fetcher(lambda ep, p: {})
    with pytest.raises(ValueError, match="missing required params"):
        f.validate("player_achievements", {"key": "k"})
    with pytest.raises(ValueError, match="unknown endpoint"):
        f.validate("nope", {})


def test_vanity_url_resolution():
    def transport(ep, p):
        assert ep == "resolve_vanity"
        return {"response": {"success": 1, "steamid": "76561198000000042"}}

    f, _ = make_fetcher(transport)
    assert (
        f.resolve_profile_url("https://steamcommunity.com/id/somevanity/", "k")
        == "76561198000000042"
    )
    assert (
        f.resolve_profile_url("http://steamcommunity.com/profiles/76561198000000001/", "k")
        == "76561198000000001"
    )
