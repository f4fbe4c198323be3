"""Session-scoped lifecycle registry for plan-level ``.cache()`` handles.

The training plans cache small, dictionary- or candidate-sized
intermediates (shingle tables, MinHash/SimHash signatures, PPJoin
prefixes, verified pair sets) because Catalyst does not reuse an
exchange across the two sides of a self-join. Before r13 each builder
invocation called ``.cache()`` on a fresh DataFrame and never released
it, so a long-lived session sweeping many tables/SFs accumulated
executor storage with no eviction policy beyond Spark's storage-level
LRU (VERDICT r12 "what's wrong" #3).

This registry gives every such handle an owner and a release path:

- ``cached(spark, sf_dir, key, build)`` memoizes the built DataFrame
  per (session, corpus identity, key). Re-invoking the same builder in
  the same session returns the SAME cached DataFrame — no second
  CacheManager entry, no "Asked to cache already cached data" churn —
  and builders with identical intermediates (the Jaccard and
  containment shingle tables) now genuinely share one cache.
- ``release(spark[, sf_dir])`` unpersists every registered handle in
  scope (all scopes when omitted), the explicit end-of-sweep eviction
  a multi-corpus session needs.

Corpus identity follows ``catalog.table``'s discipline: the scope key
includes (path, mtime_ns, size) of the tables the plan derives from,
so a test that rewrites a table in place gets a fresh cache — and the
registry auto-evicts the stale generation's handles at that moment
instead of leaking them.

State lives ON the session object (never a module dict keyed by
``id(spark)``) for the same object-identity reasons documented in
``catalog.py``.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Hashable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_REG_ATTR = "_rcdp_plan_cache_registry"


def _table_identity(sf_dir: str, tables: tuple[str, ...]) -> tuple[Any, ...]:
    """File-system identity of the source tables a cached plan derives
    from (same (path, mtime_ns, size) key as catalog.table's scan
    memoization). Unstat-able paths contribute their name only — the
    cache then keys on sf_dir alone, which is still correct for the
    immutable driver test data."""
    ident: list[Any] = []
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(path)
            ident.append((name, st.st_mtime_ns, st.st_size))
        except OSError:
            ident.append((name,))
    return tuple(ident)


def _registry(spark: SparkSession) -> dict:
    reg = getattr(spark, _REG_ATTR, None)
    if reg is None:
        reg = {}
        setattr(spark, _REG_ATTR, reg)
    return reg


def cached(
    spark: SparkSession,
    sf_dir: str,
    key: Hashable,
    build: Callable[[], DataFrame],
    *,
    tables: tuple[str, ...] = ("documents",),
) -> DataFrame:
    """Memoized ``build().cache()`` handle, registered per
    (session, sf_dir + table identity, key).

    ``build`` runs (and the result is cached) at most once per scope;
    later calls return the same DataFrame object. When the scope's
    table identity changes (in-place rewrite), the stale generation's
    handles are unpersisted before the fresh one is built.
    """
    reg = _registry(spark)
    ident = _table_identity(sf_dir, tables)
    scope = (sf_dir, ident)
    # auto-evict stale generations of the same sf_dir (rewritten table)
    for other in [s for s in reg if s[0] == sf_dir and s != scope]:
        for df in reg.pop(other).values():
            df.unpersist(blocking=False)
    bucket = reg.setdefault(scope, {})
    if key not in bucket:
        bucket[key] = build().cache()
    return bucket[key]


def release(
    spark: SparkSession, sf_dir: str | None = None, *, blocking: bool = True
) -> int:
    """Unpersist and forget every registered handle for ``sf_dir``
    (every scope when None). Returns the number of handles released."""
    reg = _registry(spark)
    scopes = [s for s in reg if sf_dir is None or s[0] == sf_dir]
    n = 0
    for scope in scopes:
        for df in reg.pop(scope).values():
            df.unpersist(blocking=blocking)
            n += 1
    return n


def registered(spark: SparkSession, sf_dir: str | None = None) -> list[tuple]:
    """(scope, key) pairs currently held — introspection for tests."""
    reg = _registry(spark)
    return [
        (scope, key)
        for scope, bucket in reg.items()
        if sf_dir is None or scope[0] == sf_dir
        for key in bucket
    ]
