"""Rate-limited Steam API source (SURVEY.md §2.1 S5-S10, §4.3.1).

The reference serializes all Steam calls on one Celery worker with
``time.sleep(0.5)`` after every request
(reference dags/custom_operators/SteamToS3Operator.py:57,73,87,115) and
chains the 8 endpoint tasks sequentially to respect the global API
budget (rust_twitter_steam_pipeline.py:201-213).

Spark parallelism is the enemy of a global rate limit, so ingestion is
deliberately NOT scaled out (SURVEY.md §7.3.4): a driver-side fetcher
with a token-bucket throttle materializes raw JSON into the bronze zone;
the relational engine stays fully parallel downstream. The HTTP
transport is injected (callable) — production would pass a
requests-based callable; tests pass a recorded/fake transport. No live
network IO exists in this module.

Error policy (S7): HTTP 429 → bounded retry with backoff (reference
:109-111); any other HTTP error (401 = private profile) → the id is
routed to a quarantine list instead of failing the batch.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field

#: endpoint → required request params (S10 validation,
#: reference SteamToS3Operator.py:121-127,141-196)
ENDPOINTS: dict[str, dict] = {
    "player_summaries": {"required": ("key", "steamids"), "batched": True},
    "player_bans": {"required": ("key", "steamids"), "batched": True},
    "player_friendlists": {"required": ("key", "steamid"), "batched": False},
    "player_subscribed_groups": {"required": ("key", "steamid"), "batched": False},
    "player_achievements": {"required": ("key", "steamid", "appid"), "batched": False},
    "player_stats": {"required": ("key", "steamid", "appid"), "batched": False},
    "player_owned_games": {"required": ("key", "steamid"), "batched": False},
    "player_steam_badges": {"required": ("key", "steamid"), "batched": False},
}

BATCH_SIZE = 100  # reference SteamToS3Operator.py:45-46


class HttpError(Exception):
    def __init__(self, status: int, msg: str = ""):
        super().__init__(f"HTTP {status} {msg}")
        self.status = status


@dataclass
class RateLimiter:
    """Token bucket enforcing the global 1-request-per-``interval``
    budget (S8). ``clock``/``sleeper`` injectable for tests."""

    interval: float = 0.5  # reference: time.sleep(0.5) per call
    clock: Callable[[], float] = time.monotonic
    sleeper: Callable[[float], None] = time.sleep
    _next_ok: float = field(default=0.0, init=False)

    def acquire(self) -> None:
        now = self.clock()
        if now < self._next_ok:
            self.sleeper(self._next_ok - now)
            now = self._next_ok
        self._next_ok = now + self.interval


@dataclass
class SteamFetcher:
    """Driver-side bronze fetcher.

    ``transport(endpoint, params) -> dict`` performs one HTTP GET and
    returns parsed JSON; raises :class:`HttpError` on non-2xx.
    """

    transport: Callable[[str, dict], dict]
    limiter: RateLimiter = field(default_factory=RateLimiter)
    max_retries: int = 3
    backoff: float = 1.0
    quarantine: list[tuple[str, str, int]] = field(default_factory=list)

    def _call(self, endpoint: str, params: dict) -> dict | None:
        """One throttled call with 429-retry and S7 quarantine."""
        for attempt in range(self.max_retries + 1):
            self.limiter.acquire()
            try:
                return self.transport(endpoint, params)
            except HttpError as e:
                if e.status == 429 and attempt < self.max_retries:
                    self.limiter.sleeper(self.backoff * (attempt + 1))
                    continue
                if e.status == 429:
                    raise  # budget exhausted — fail the batch (reference re-raises)
                # non-429 (401 private profile etc.): quarantine, skip row
                self.quarantine.append(
                    (endpoint, str(params.get("steamid") or params.get("steamids")), e.status)
                )
                return None
        return None

    def validate(self, endpoint: str, params: dict) -> None:
        """S10 fail-fast param validation (plan-time, before any call)."""
        spec = ENDPOINTS.get(endpoint)
        if spec is None:
            raise ValueError(f"unknown endpoint: {endpoint}")
        missing = [p for p in spec["required"] if p not in params]
        if missing:
            raise ValueError(f"{endpoint}: missing required params {missing}")

    def resolve_profile_url(self, url: str, key: str) -> str | None:
        """S9 vanity-URL resolution (reference SteamToS3Operator.py:63-78):
        ``/profiles/<id>`` split directly; ``/id/<vanity>`` via the
        ResolveVanityURL endpoint (throttled like any call)."""
        if "/id/" in url:  # S18 containment predicate (:37-39)
            vanity = url.rstrip("/").split("/id/")[-1]
            resp = self._call("resolve_vanity", {"key": key, "vanityurl": vanity})
            if resp is None:
                return None
            r = resp.get("response", {})
            return r.get("steamid") if r.get("success") == 1 else None
        tail = url.split("/profiles/")
        return tail[1].strip("/") if len(tail) == 2 else None

    def fetch(self, endpoint: str, steam_ids: list[str], params: dict) -> dict:
        """Fetch one endpoint for all ids → the bronze wrapper document
        ``{"responses": [...]}`` (reference SteamToS3Operator.py:129-234).

        Batched endpoints take 100 ids/request (S5); per-id endpoints tag
        each response with ``queried_steam_id`` provenance (S6).
        """
        self.validate(endpoint, {**params, "steamids": "x", "steamid": "x", "appid": params.get("appid", "x")})
        responses: list[dict] = []
        if ENDPOINTS[endpoint]["batched"]:
            for i in range(0, len(steam_ids), BATCH_SIZE):
                chunk = steam_ids[i : i + BATCH_SIZE]
                resp = self._call(endpoint, {**params, "steamids": ",".join(chunk)})
                if resp is not None:
                    responses.append(resp)
        else:
            for sid in steam_ids:
                resp = self._call(endpoint, {**params, "steamid": sid})
                if resp is not None:
                    responses.append({**resp, "queried_steam_id": sid})
        return {"responses": responses}

    def write_bronze(self, doc: dict, path: str) -> str:
        """S4 raw sink: one JSON document per (endpoint, interval)."""
        with open(path, "w") as fh:
            fh.write(json.dumps(doc))
        return path
