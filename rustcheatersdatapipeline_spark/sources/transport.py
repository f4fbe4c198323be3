"""Live HTTP transport adapters — the ONE documented network boundary.

Every connector in this engine is injected with a transport callable
and is tested against recorded fixtures; this module supplies the
single production implementation of each contract, built on stdlib
``urllib`` (the sandbox has no requests/tweepy, and the engine's rule
is: the network seam is an injectable ``opener`` so everything above
it — URL construction, auth, pagination, error mapping — is unit-
tested without sockets).

Reference parity:

- ``UrllibTransport`` replaces the Airflow ``HttpHook`` GETs of
  /root/reference/dags/custom_operators/SteamToS3Operator.py:42-119
  (endpoint paths from dags/rust_twitter_steam_pipeline.py:81-192,
  public Steam Web API routes) and conforms to
  ``SteamFetcher.transport(endpoint, params) -> dict``.
- ``TwitterTimelinePages`` replaces the tweepy ``Paginator`` loop of
  dags/scripts/helpers.py:21-43 (Twitter API v2
  ``GET /2/users/:id/tweets`` with bearer auth, time-window params and
  ``next_token`` pagination) and conforms to the ``pages`` argument of
  ``twitter.timeline_to_df``.

Rate limiting stays where it lives today (``RateLimiter`` inside
``SteamFetcher`` — S8); these adapters do transport only.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from .steam import ENDPOINTS, HttpError

#: engine endpoint name → public Steam Web API route (the reference
#: DAG's endpoint strings, rust_twitter_steam_pipeline.py:81-192)
ENDPOINT_PATHS: dict[str, str] = {
    "player_summaries": "ISteamUser/GetPlayerSummaries/v0002/",
    "player_friendlists": "ISteamUser/GetFriendList/v1/",
    "player_bans": "ISteamUser/GetPlayerBans/v1/",
    "player_subscribed_groups": "ISteamUser/GetUserGroupList/v1/",
    "player_achievements": "ISteamUserStats/GetPlayerAchievements/v1/",
    "player_stats": "ISteamUserStats/GetUserStatsForGame/v2/",
    "player_owned_games": "IPlayerService/GetOwnedGames/v1/",
    "player_steam_badges": "IPlayerService/GetBadges/v1/",
    "resolve_vanity": "ISteamUser/ResolveVanityURL/v0001/",
}


def _default_opener(req: urllib.request.Request, timeout: float):
    return urllib.request.urlopen(req, timeout=timeout)  # pragma: no cover


@dataclass
class UrllibTransport:
    """``SteamFetcher.transport`` over stdlib urllib.

    GETs ``<base_url><route>?<urlencoded params>``; 2xx JSON bodies are
    parsed and returned, HTTP errors map to :class:`HttpError` (status
    preserved, so the fetcher's 429-retry and 401-quarantine logic
    applies unchanged), network failures map to ``HttpError(0)``, and a
    2xx non-JSON body maps to ``HttpError(502)`` (upstream proxy junk —
    quarantinable, never a crash)."""

    base_url: str = "https://api.steampowered.com/"
    timeout: float = 10.0
    opener: Callable = _default_opener
    headers: dict = field(default_factory=lambda: {"Accept": "application/json"})

    def url_for(self, endpoint: str, params: dict) -> str:
        if endpoint not in ENDPOINTS or endpoint not in ENDPOINT_PATHS:
            raise ValueError(f"unknown endpoint: {endpoint}")
        qs = urllib.parse.urlencode(params)
        return f"{self.base_url}{ENDPOINT_PATHS[endpoint]}?{qs}"

    def __call__(self, endpoint: str, params: dict) -> dict:
        req = urllib.request.Request(
            self.url_for(endpoint, params), headers=dict(self.headers)
        )
        try:
            resp = self.opener(req, self.timeout)
            body = resp.read()
        except urllib.error.HTTPError as e:
            raise HttpError(e.code, str(e.reason)) from e
        except urllib.error.URLError as e:
            raise HttpError(0, str(e.reason)) from e
        try:
            return json.loads(body)
        except (ValueError, UnicodeDecodeError) as e:
            raise HttpError(502, f"non-JSON body: {e}") from e


@dataclass
class TwitterTimelinePages:
    """Callable yielding timeline pages for ``timeline_to_df``.

    Each iteration GETs one page of ``/2/users/{user_id}/tweets``
    (bearer-token header; ``exclude=replies,retweets``,
    ``max_results=100``, ``tweet.fields`` and the
    ``start_time``/``end_time`` interval — the reference Paginator's
    exact request shape) and yields the page's ``data`` list; paging
    follows ``meta.next_token`` until the API stops returning one.
    ``max_pages`` bounds a runaway pagination loop."""

    bearer_token: str
    user_id: str
    start_time: str
    end_time: str
    base_url: str = "https://api.twitter.com/"
    timeout: float = 10.0
    max_pages: int = 1000
    opener: Callable = _default_opener

    def _page(self, next_token: str | None) -> dict:
        params = {
            "exclude": "replies,retweets",
            "max_results": 100,
            "tweet.fields": "id,text,author_id,entities,created_at",
            "start_time": self.start_time,
            "end_time": self.end_time,
        }
        if next_token:
            params["pagination_token"] = next_token
        url = (
            f"{self.base_url}2/users/{urllib.parse.quote(self.user_id)}/tweets?"
            + urllib.parse.urlencode(params)
        )
        req = urllib.request.Request(
            url, headers={"Authorization": f"Bearer {self.bearer_token}"}
        )
        try:
            return json.loads(self.opener(req, self.timeout).read())
        except urllib.error.HTTPError as e:
            raise HttpError(e.code, str(e.reason)) from e
        except urllib.error.URLError as e:
            raise HttpError(0, str(e.reason)) from e

    def __call__(self) -> Iterator[list[dict]]:
        token = None
        for _ in range(self.max_pages):
            page = self._page(token)
            data = [self._to_paginator_shape(t) for t in page.get("data") or []]
            if data:
                yield data
            token = (page.get("meta") or {}).get("next_token")
            if not token:
                return

    @staticmethod
    def _to_paginator_shape(tweet: dict) -> dict:
        """The v2 API returns ``created_at`` as an ISO-8601 string;
        tweepy's Paginator (the shape ``timeline_to_df`` consumes)
        hands back datetimes — convert to match that contract."""
        out = dict(tweet)
        ts = out.get("created_at")
        if isinstance(ts, str):
            from datetime import datetime

            out["created_at"] = datetime.fromisoformat(ts.replace("Z", "+00:00"))
        return out
