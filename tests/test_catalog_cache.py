"""Catalog session-cache identity (VERDICT r10 "What's wrong" #1).

The configured flag / scan cache used to live in module dicts keyed on
``id(spark)``; CPython recycles ids after GC, so a collected session's
id could alias a fresh session — silently skipping
``_ensure_session_confs`` (host-timezone timestamps: a wrong-answer
path) or returning a DataFrame bound to a dead session.  The fix moves
the state onto the session object itself, whose lifetime and identity
can never alias.  Sub-sessions (``spark.newSession()``) are the unit
here: they share the JVM context (so "stopping" one means dropping the
last Python reference) but carry independent session state, which is
exactly the granularity the caches key on.
"""

import gc

from rustcheatersdatapipeline_spark import catalog
from rustcheatersdatapipeline_spark.catalog import table


def test_collected_session_cannot_alias_a_fresh_one(spark, sf_dir):
    s1 = spark.newSession()
    df1 = table(s1, sf_dir, "region")
    assert getattr(s1, catalog._CONF_ATTR, False)
    assert getattr(s1, catalog._CACHE_ATTR, None)
    assert df1 is table(s1, sf_dir, "region")  # memoized within a session

    del s1, df1
    gc.collect()  # per-session state dies with the session — no global map

    # A brand-new session — even one landing on the recycled id — must
    # get the engine confs applied and a fresh plan, never a cached one.
    s2 = spark.newSession()
    assert not getattr(s2, catalog._CONF_ATTR, False)
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    df2 = table(s2, sf_dir, "region")
    assert s2.conf.get("spark.sql.session.timeZone") == "UTC"
    assert df2.sparkSession is s2


def test_plan_cache_is_per_session_not_shared(spark, sf_dir):
    s1, s2 = spark.newSession(), spark.newSession()
    d1, d2 = table(s1, sf_dir, "nation"), table(s2, sf_dir, "nation")
    assert d1 is not d2
    assert d1.sparkSession is s1 and d2.sparkSession is s2
