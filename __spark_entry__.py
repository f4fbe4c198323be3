"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rustcheatersdatapipeline_spark.plans import analytics as _an  # noqa: E402
from rustcheatersdatapipeline_spark.plans import queries as _q  # noqa: E402
from rustcheatersdatapipeline_spark.plans import retrieval as _rt  # noqa: E402
from rustcheatersdatapipeline_spark.plans import training as _tr  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the A1 'bans per country'
    insight shape (join + group-by + ordered count) from SURVEY.md §2.6."""
    return _q.q25(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Exactly 50 declared entries (24 + 8 + 17 + 1): composite queries
    carry the operators whose standalone builders moved to the modules'
    TESTS_ONLY suites (same oracle compare, run by pytest).
    """
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_q.SPARK_QUERIES)
    out.update(_an.SPARK_QUERIES)
    out.update(_tr.SPARK_QUERIES)
    out.update(_rt.SPARK_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    out: dict[str, str] = {}
    out.update(_q.ORACLE_SQL)
    out.update(_an.ORACLE_SQL)
    out.update(_tr.ORACLE_SQL)
    out.update(_rt.ORACLE_SQL)
    return out
