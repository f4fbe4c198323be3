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
- ``checkpointed(spark, sf_dir, key, build)`` is the ownership
  discipline for ``localCheckpoint()`` intermediates (bounded tables
  that feed two plan subtrees where neither ReuseExchange nor AQE
  stage reuse fires): a localCheckpoint persists its blocks as a
  persistent RDD that ``DataFrame.unpersist`` does NOT own, so
  without a registry every builder invocation would strand one RDD
  until driver GC. Unlike ``cached`` it does NOT memoize across
  invocations — a checkpoint is a materialization of one invocation's
  plan, and reusing it would make a repeat invocation (e.g. a later
  bench rep) skip the checkpointed computation entirely instead of
  re-running it. Each call rebuilds, REPLACES the previous generation
  under the same key (dropping its blocks immediately), and registers
  the new handle so ``release`` owns it at end of sweep.
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


class _Handle:
    """A registered plan intermediate: the DataFrame plus the RDD ids
    only the SparkContext can unpersist (localCheckpoint blocks)."""

    __slots__ = ("df", "rdd_ids")

    def __init__(self, df: DataFrame, rdd_ids: frozenset[int] = frozenset()):
        self.df = df
        self.rdd_ids = rdd_ids

    def unpersist(self, spark: SparkSession, blocking: bool) -> None:
        self.df.unpersist(blocking=blocking)
        if self.rdd_ids:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in self.rdd_ids:
                jrdd = jmap.get(rid)
                if jrdd is not None:
                    jrdd.unpersist(blocking)


def _scoped_bucket(spark: SparkSession, sf_dir: str, tables: tuple[str, ...]) -> dict:
    reg = _registry(spark)
    ident = _table_identity(sf_dir, tables)
    scope = (sf_dir, ident)
    # auto-evict stale generations: same sf_dir, same table NAMES, but a
    # different stat identity (the table was rewritten in place). Scopes
    # over a different table set (e.g. embeddings- vs documents-derived
    # plans of one corpus) are sibling scopes, not stale generations —
    # evicting them would drop every memoized cache of the other family
    # each time a builder from this one runs (a 3× regression on the
    # near-dup queries when embed_neardup_cosine ran between them).
    names = tuple(t[0] for t in ident)
    for other in [
        s
        for s in reg
        if s[0] == sf_dir and s != scope and tuple(t[0] for t in s[1]) == names
    ]:
        for handle in reg.pop(other).values():
            handle.unpersist(spark, blocking=False)
    return reg.setdefault(scope, {})


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
    bucket = _scoped_bucket(spark, sf_dir, tables)
    if key not in bucket:
        bucket[key] = _Handle(build().cache())
    return bucket[key].df


def checkpointed(
    spark: SparkSession,
    sf_dir: str,
    key: Hashable,
    build: Callable[[], DataFrame],
    *,
    tables: tuple[str, ...] = ("documents",),
) -> DataFrame:
    """Registry-owned ``build().localCheckpoint()`` handle.

    NOT memoized: ``build`` runs on every call (a repeat invocation —
    e.g. a later bench rep — must re-do the checkpointed computation,
    not replay the first rep's blocks). The previous generation under
    the same key is unpersisted before the fresh checkpoint is built,
    so repeat invocations hold ONE generation of blocks instead of
    stranding one per call until driver GC; ``release`` drops the
    last one at end of sweep. The returned DataFrame is only valid
    until the next call with the same key (or ``release``) — callers
    materialize their result within the invocation, which every
    builder here does.

    NOTE (ADVICE r13): ``localCheckpoint`` is EAGER, so builders that
    route an intermediate through here execute Spark jobs at
    DataFrame-CONSTRUCTION time — ``queries()[name](spark, sf_dir)``
    materializes the checkpointed subtrees before any action (explain/
    plan-dump flows included), and runtime errors in those subtrees
    surface at build time instead of action time. Affected builders:
    bm25_search / hybrid_search_rrf (bm25 postings), the Jaccard/
    MinHash verify path, embed_neardup_cosine's pack pass, and the
    iterative graph/trainer operators' per-round checkpoints.

    The checkpoint's persistent RDD id is read off the LogicalRDD the
    checkpoint plans to (with a before/after ``getPersistentRDDs``
    diff as fallback), so the registry — not driver GC — owns the
    blocks.
    """
    bucket = _scoped_bucket(spark, sf_dir, tables)
    old = bucket.pop(key, None)
    if old is not None:
        old.unpersist(spark, blocking=False)
    before = _persistent_rdd_ids(spark)
    df = build().localCheckpoint()
    ids: set[int] = set()
    try:
        ids.add(_analyzed_rdd_id(df))
    except Exception:  # noqa: BLE001 — internal accessor; diff covers it
        # the diff can include persistent RDDs that ``build`` itself
        # registered (e.g. a cached() handle built inside it); the
        # checkpoint RDD is created LAST — after build() returns — so
        # with the documented single-threaded build discipline it is
        # exactly the max new id. Attributing the whole diff would let
        # a later replace()/release() of THIS handle unpersist blocks
        # owned by another (ADVICE r13).
        diff = _persistent_rdd_ids(spark) - before
        if diff:
            ids.add(max(diff))
    bucket[key] = _Handle(df, frozenset(ids))
    return df


def _analyzed_rdd_id(df: DataFrame) -> int:
    """The checkpoint's own persistent RDD id, read off the LogicalRDD
    the checkpointed DataFrame plans to (internal accessor — callers
    fall back to a getPersistentRDDs diff when it breaks)."""
    return int(df._jdf.queryExecution().analyzed().rdd().id())


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in jmap.keySet().toArray()}


def release(
    spark: SparkSession, sf_dir: str | None = None, *, blocking: bool = True
) -> int:
    """Unpersist and forget every registered handle for ``sf_dir``
    (every scope when None). Returns the number of handles released."""
    reg = _registry(spark)
    scopes = [s for s in reg if sf_dir is None or s[0] == sf_dir]
    n = 0
    for scope in scopes:
        for handle in reg.pop(scope).values():
            handle.unpersist(spark, blocking=blocking)
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
