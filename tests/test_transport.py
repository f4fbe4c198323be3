"""HTTP transport adapters: URL/auth/pagination/error mapping with a
fake opener — no sockets (reference parity: SteamToS3Operator.py
HttpHook GETs and helpers.py tweepy Paginator)."""

import io
import json
import urllib.error
import urllib.parse

import pytest

from rustcheatersdatapipeline_spark.sources.steam import HttpError, SteamFetcher, RateLimiter
from rustcheatersdatapipeline_spark.sources.transport import (
    TwitterTimelinePages,
    UrllibTransport,
)


class FakeOpener:
    def __init__(self, responses):
        self.responses = responses  # url-substring -> bytes | Exception
        self.calls = []

    def __call__(self, req, timeout):
        self.calls.append((req.full_url, dict(req.headers), timeout))
        for frag, resp in self.responses:
            if frag in req.full_url:
                if isinstance(resp, Exception):
                    raise resp
                return io.BytesIO(resp)
        raise AssertionError(f"unexpected URL {req.full_url}")


def _http_error(code):
    return urllib.error.HTTPError("u", code, "boom", {}, io.BytesIO(b""))


def test_steam_url_construction_and_json():
    op = FakeOpener([("GetPlayerBans", json.dumps({"players": []}).encode())])
    t = UrllibTransport(opener=op)
    out = t("player_bans", {"key": "k", "steamids": "1,2"})
    assert out == {"players": []}
    url, headers, timeout = op.calls[0]
    assert url.startswith("https://api.steampowered.com/ISteamUser/GetPlayerBans/v1/?")
    q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
    assert q == {"key": ["k"], "steamids": ["1,2"]}
    assert timeout == 10.0


def test_steam_error_mapping():
    t = UrllibTransport(
        opener=FakeOpener(
            [
                ("GetPlayerBans", _http_error(429)),
                ("GetPlayerSummaries", urllib.error.URLError("refused")),
                ("GetFriendList", b"<html>gateway junk</html>"),
            ]
        )
    )
    with pytest.raises(HttpError) as e:
        t("player_bans", {"key": "k", "steamids": "1"})
    assert e.value.status == 429
    with pytest.raises(HttpError) as e:
        t("player_summaries", {"key": "k", "steamids": "1"})
    assert e.value.status == 0
    with pytest.raises(HttpError) as e:
        t("player_friendlists", {"key": "k", "steamid": "1"})
    assert e.value.status == 502
    with pytest.raises(ValueError, match="unknown endpoint"):
        t("nope", {})


def test_transport_plugs_into_fetcher_quarantine():
    """End-to-end through SteamFetcher: a 401 private profile flows into
    the quarantine list (S7), exactly like the fixture transports."""
    op = FakeOpener([("GetPlayerAchievements", _http_error(401))])
    fetcher = SteamFetcher(
        transport=UrllibTransport(opener=op),
        limiter=RateLimiter(interval=0, sleeper=lambda s: None),
    )
    out = fetcher.fetch(
        "player_achievements", ["76561"], {"key": "k", "appid": "252490"}
    )
    assert out["responses"] == []
    assert fetcher.quarantine == [("player_achievements", "76561", 401)]


def test_twitter_pagination_and_auth(spark):
    p1 = json.dumps(
        {"data": [{"id": "1", "text": "a", "author_id": "9",
                   "created_at": "2021-08-02T00:10:00Z", "entities": {}}],
         "meta": {"next_token": "tok2"}}
    ).encode()
    p2 = json.dumps(
        {"data": [{"id": "2", "text": "b", "author_id": "9",
                   "created_at": "2021-08-02T00:20:00Z", "entities": {}}],
         "meta": {}}
    ).encode()

    class Seq:
        def __init__(self):
            self.n = 0
            self.calls = []

        def __call__(self, req, timeout):
            self.calls.append(req)
            self.n += 1
            return io.BytesIO(p1 if self.n == 1 else p2)

    op = Seq()
    pages = TwitterTimelinePages(
        bearer_token="B", user_id="9",
        start_time="2021-08-02T00:00:00Z", end_time="2021-08-02T01:00:00Z",
        opener=op,
    )
    got = list(pages())
    assert [t["id"] for page in got for t in page] == ["1", "2"]
    first, second = op.calls
    assert first.get_header("Authorization") == "Bearer B"
    q1 = urllib.parse.parse_qs(urllib.parse.urlparse(first.full_url).query)
    assert q1["exclude"] == ["replies,retweets"]
    assert q1["max_results"] == ["100"]
    assert "pagination_token" not in q1
    q2 = urllib.parse.parse_qs(urllib.parse.urlparse(second.full_url).query)
    assert q2["pagination_token"] == ["tok2"]
    # and the pages feed timeline_to_df unchanged
    from rustcheatersdatapipeline_spark.sources.twitter import timeline_to_df

    df = timeline_to_df(spark, got)
    assert df.count() == 2


def test_twitter_max_pages_bounds_runaway():
    always = json.dumps(
        {"data": [{"id": "1"}], "meta": {"next_token": "again"}}
    ).encode()
    pages = TwitterTimelinePages(
        bearer_token="B", user_id="9", start_time="s", end_time="e",
        max_pages=7, opener=lambda req, timeout: io.BytesIO(always),
    )
    assert len(list(pages())) == 7
