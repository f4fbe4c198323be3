"""SURVEY.md §2.9 declared queries Q1-Q30 — the reference-parity contract.

Each ``q*`` builder takes ``(spark, sf_dir)`` and returns a lazy DataFrame
expressed with the DataFrame API (Catalyst plans the physical strategy).
``ORACLE_SQL`` holds the semantically-equivalent DuckDB SQL the driver
runs side-by-side; column names/types are aligned between both engines.

Determinism rules (SURVEY.md §2.9 / BASELINE.md):
- UTC session timezone in both engines.
- Every query ends with a total ``ORDER BY``.
- Aggregated floats are computed on DECIMAL(18,2) casts.
- Timestamps cross the comparison boundary as formatted UTC strings.
- Double→integer casts go through ``floor`` in BOTH engines: DuckDB's
  ``CAST(DOUBLE AS BIGINT)`` rounds-to-nearest while Spark/Java truncates,
  so the raw cast is not portable (events.value is fractional).

Reference-parity citations: each query names the SURVEY.md §2 operator row
it exercises; those rows cite the reference file:line.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, IntegerType
from pyspark.sql.window import Window

from ..catalog import table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1-Q11: scans, projections, filters, row-level transforms (§2.2)
# --------------------------------------------------------------------------

def q1(spark, sf_dir):
    """P3 scan + projection, P12 dtype cast in one pass (reference
    dags/scripts/rust_twitter_steam_dims.py:535-551, :128-137).

    l_quantity is integral-valued, so truncation == rounding for the
    cast; the general fractional case is pinned by floor (see module
    docstring). The standalone cast variant lives on as q8 in the
    tests-only suite.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q2(spark, sf_dir):
    """S2/P6 conjunctive filter (reference dags/scripts/helpers.py:35-39)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


def q3(spark, sf_dir):
    """P7 inequality + IN predicate (reference rust_twitter_steam_facts.py:526)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter((F.col("c_mktsegment") != "BUILDING") & F.col("c_nationkey").isin(1, 2, 3))
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q4(spark, sf_dir):
    """P18 containment / LIKE (reference SteamToS3Operator.py:37-39).

    Substring chosen to match ~250 rows at sf0.01 so the oracle compare
    is non-vacuous (two engines agreeing on an empty set proves nothing).
    """
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
        .orderBy("p_partkey")
    )


def q5(spark, sf_dir):
    """P8 null-drop + P10 null-fill in one pass (reference
    rust_twitter_steam_dims.py:33, :115-116).

    The raw test tables contain no nulls (every column fully populated
    at every SF), so nulls are derived with NULLIF to make both ops
    non-vacuous: MACHINERY rows are dropped through the null path and
    BUILDING rows are filled to 'UNKNOWN'. Uses the engine's
    drop_null_rows (IsNotNull conjunction), not na.drop —
    AtLeastNNonNulls never pushes to the parquet scan.
    """
    from ..operators.cleaning import drop_null_rows

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("nullif(c_mktsegment, 'MACHINERY')").alias("seg_drop"),
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg_fill"),
    )
    return (
        drop_null_rows(base, ["seg_drop"])
        .select("c_custkey", F.coalesce(F.col("seg_fill"), F.lit("UNKNOWN")).alias("seg"))
        .orderBy("c_custkey")
    )


def q6(spark, sf_dir):
    """P10 null-fill (reference rust_twitter_steam_dims.py:115-116)."""
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("bal"))
        .orderBy("c_custkey")
    )


def q7(spark, sf_dir):
    """P9 conditional overwrite (reference rust_twitter_steam_dims.py:29)."""
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.when(F.col("p_brand") == "", F.col("p_name"))
            .otherwise(F.col("p_brand"))
            .alias("brand"),
        )
        .orderBy("p_partkey")
    )


def q8(spark, sf_dir):
    """P12 dtype cast (reference rust_twitter_steam_dims.py:128-137).

    l_quantity is integral-valued, so truncation == rounding here; the
    general fractional case is pinned by floor (see module docstring).
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q9(spark, sf_dir):
    """P13 epoch→timestamp formatting + P19/J10 time-of-day projection
    (reference rust_twitter_steam_facts.py:31-33, sql_queries.py:21).

    No Spark TIME type → 'HH:mm:ss' string contract (SURVEY.md §7.3).
    """
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.date_format(
                F.timestamp_seconds(F.floor(F.col("value")).cast("long")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("ts_s"),
            F.date_format(F.col("ts"), "HH:mm:ss").alias("tod"),
        )
        .orderBy("event_id")
    )


def q10(spark, sf_dir):
    """P14 date arithmetic (reference rust_twitter_steam_facts.py:213-216)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.date_format(F.date_sub(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
                "d30"
            ),
        )
        .orderBy("o_orderkey")
    )


def q11(spark, sf_dir):
    """P17 string split/extract (reference helpers.py:42-43)."""
    return (
        _t(spark, sf_dir, "part")
        .select("p_partkey", F.split(F.col("p_type"), " ").getItem(0).alias("t1"))
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# Q12-Q14: dedup / distinct / assertions (§2.3)
# --------------------------------------------------------------------------

def q12(spark, sf_dir):
    """D1 keyed dedup with deterministic survivor (reference rust_twitter_steam_dims.py:533).

    pandas drop_duplicates keeps first-in-file-order; the engine pins the
    survivor with an explicit row_number ordering (SURVEY.md §7.3.3).
    """
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey")
        .orderBy("c_nationkey")
    )


def q13(spark, sf_dir):
    """D1 distinct (§2.3)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


def q14(spark, sf_dir):
    """D2 duplicate-row assertion as a query (reference rust_twitter_steam_dims.py:49-50)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber"))).alias(
            "dup_cnt"
        )
    )


# --------------------------------------------------------------------------
# Q15-Q18: joins (§2.4) and anti-join upsert semantics (§2.5)
# --------------------------------------------------------------------------

def q15(spark, sf_dir):
    """J1/J5 multi-way inner equi-join (reference sql_queries.py:20-29).

    Hint policy: nation is bounded (25 rows at any SF) → explicit
    broadcast hint; customer scales with the population → hinted only
    by the FACT of its on-disk size (catalog.broadcast_if_small) —
    static estimator broadcasts are disabled engine-wide (session.py),
    and AQE takes over from runtime stage sizes once the table outgrows
    the cap.
    """
    from ..catalog import broadcast_if_small

    o = _t(spark, sf_dir, "orders")
    c = broadcast_if_small(_t(spark, sf_dir, "customer"), sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "c_name", "n_name")
        .orderBy("o_orderkey")
    )


def q16(spark, sf_dir):
    """J2 composite-key join (reference sql_queries.py:57-64, 5-col key).

    Self-join: one side carries a fact-based broadcast hint
    (catalog.broadcast_if_small) — compile-time-broadcastable exactly
    while the table's true bytes fit, shuffle join (AQE-decided) the
    moment lineitem outgrows the cap."""
    from ..catalog import broadcast_if_small

    li = _t(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = broadcast_if_small(li.alias("b"), sf_dir, "lineitem")
    return (
        a.join(b, on=["l_orderkey", "l_linenumber", "l_partkey"])
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q17(spark, sf_dir):
    """J9 expression-key (date) join + P14 date arithmetic (reference
    sql_queries.py:28-29, rust_twitter_steam_facts.py:213-216)."""
    o = _t(spark, sf_dir, "orders")
    dd = (
        o.select(F.col("o_orderdate").cast("date").alias("full_date"))
        .distinct()
    )
    return (
        o.join(
            F.broadcast(dd),
            F.col("o_orderdate").cast("date") == dd.full_date,
        )
        .select(
            "o_orderkey",
            F.date_format("full_date", "yyyy-MM-dd").alias("full_date"),
            F.date_format(F.date_sub(F.col("full_date"), 30), "yyyy-MM-dd").alias("d30"),
        )
        .orderBy("o_orderkey")
    )


def q18(spark, sf_dir):
    """D11 insert-if-absent = left-anti join (reference LoadDimsOperator.py:25-28).

    The 'existing' side is the customers holding finished ('F') orders —
    modeling the already-loaded slice of a dimension — so the anti-join
    returns the genuinely-absent keys (71 rows at sf0.01, non-vacuous;
    the round-1 orders⟕customer direction matched zero rows because every
    FK resolves).
    """
    c = _t(spark, sf_dir, "customer")
    loaded = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return (
        c.join(loaded, c.c_custkey == loaded.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Q19-Q21: upsert / surrogate keys / date dim (§2.5)
# --------------------------------------------------------------------------

def q19(spark, sf_dir):
    """D12 upsert latest-wins (reference sql_queries.py:95-101)."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
        .orderBy("user_id", "event_type")
    )


def q20(spark, sf_dir):
    """D14 surrogate-key generation (reference data_warehouse.sql:25 sequences).

    Deterministic row_number over the natural key — NOT
    monotonically_increasing_id, which is partition-layout-dependent
    (SURVEY.md §7.3.1).
    """
    return (
        _t(spark, sf_dir, "nation")
        .select("n_name")
        .distinct()
        .select(
            "n_name",
            F.row_number().over(Window.orderBy("n_name")).alias("nation_sk"),
        )
        .orderBy("nation_sk")
    )


def q21(spark, sf_dir):
    """D15 date-dimension derivation (reference data_warehouse.sql:65-74)."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderdate").cast("date").alias("full_date")).distinct()
    return (
        d.select(
            F.date_format("full_date", "yyyy-MM-dd").alias("full_date"),
            F.dayofmonth("full_date").cast(IntegerType()).alias("day"),
            F.month("full_date").cast(IntegerType()).alias("month"),
            F.year("full_date").cast(IntegerType()).alias("year"),
            F.date_format("full_date", "EEEE").alias("week_day"),
        )
        .orderBy("full_date")
    )


# --------------------------------------------------------------------------
# Q22-Q28: aggregations / sorts / limits / unions (§2.6, §2.7)
# --------------------------------------------------------------------------

def q22(spark, sf_dir):
    """A1/A8 group-by count (reference README.md:40,74-80)."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("c_nationkey")
    )


def q23(spark, sf_dir):
    """A3/A6 top-k with tiebreak (reference README.md:44-50) — Catalyst
    plans TakeOrderedAndProject, no full sort."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "c_mktsegment")
        .limit(3)
    )


def q24(spark, sf_dir):
    """A5 histogram binning (reference README.md:54)."""
    return (
        _t(spark, sf_dir, "customer")
        .select(F.floor(F.col("c_acctbal") / 1000).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


def q25(spark, sf_dir):
    """A1 join+agg: bans-per-country shape (reference README.md:40)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "n_name")
    )


def q26(spark, sf_dir):
    """D13 union of batches (reference: hourly UNION ALL accumulation)."""
    o = _t(spark, sf_dir, "orders")
    even = o.filter(F.col("o_orderkey") % 2 == 0).select(F.col("o_orderkey").alias("x"))
    odd = o.filter(F.col("o_orderkey") % 2 == 1).select(F.col("o_orderkey").alias("x"))
    return even.unionByName(odd).orderBy("x")


def q27(spark, sf_dir):
    """Exact decimal aggregation (A-class sums; determinism rule)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q28(spark, sf_dir):
    """§2.7 tumbling 1h window, batch form (reference helpers.py:35-39).

    Uses the streaming-grade window() operator (not date_trunc) so the
    same expression works under readStream; start is compared as a
    formatted UTC string per the determinism rules.
    """
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("h"), "cnt")
        .orderBy("h")
    )


def q29(spark, sf_dir):
    """P1 explode/unnest (reference rust_twitter_steam_dims.py:21-23)."""
    return (
        _t(spark, sf_dir, "part")
        .select("p_partkey", F.explode(F.split(F.col("p_type"), " ")).alias("t"))
        .orderBy("p_partkey", "t")
    )


def q30(spark, sf_dir):
    """J10 time-of-day projection (reference sql_queries.py:21; no Spark
    TIME type → 'HH:mm:ss' string contract, SURVEY.md §7.3)."""
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", F.date_format(F.col("ts"), "HH:mm:ss").alias("tod"))
        .orderBy("event_id")
    )


#: Query numbers folded into composite declared queries (their operators
#: stay driver-verified there; the standalone builders stay in the
#: tests-only suite below): q6→q5 (P10), q8→q1 (P12), q10→q17 (P14),
#: q30→q9 (P19/J10), q22→q25 (A1/A8: plain groupBy-count is a strict
#: sub-shape of q25's join+groupBy+count and q27's multi-agg), q24→q27
#: (A5: the bucketed histogram is the same agg shape). The two declared
#: slots freed in r10 went to the flagship LLM-pipeline operators
#: ``hybrid_search_rrf`` (plans/retrieval.py) and
#: ``mixture_token_budget_sample`` (plans/training.py); the r11 slot
#: (q14, a strict sub-shape of q13's D1/D2 dedup-assertion family) went
#: to ``dedup_cluster`` (plans/training.py) so graph iteration is
#: represented in the declared surface; the r12 slot (q12 → q19: both
#: are the row_number-window D1 deterministic-survivor shape, q19's
#: composite key + DESC tiebreak ordering a strict superset of q12's
#: mechanics) went to ``dedup_spans`` (plans/training.py) so
#: passage-level exact dedup — the Lee et al. exact-substring family —
#: is driver-verified; in r13 that same slot rotated to
#: ``dedup_substrings`` (the true-granularity stride-1 form strictly
#: supersedes the fixed-grid span semantics) with ``dedup_spans``
#: folding into training's tests-only suite. The driver's correctness
#: gate records at most 50 entries, so the declared surface is kept at
#: exactly 50 — coverage is preserved by compositing, not dropping.
_TESTS_ONLY = (6, 8, 10, 12, 14, 22, 24, 30)

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    f"q{i}": globals()[f"q{i}"] for i in range(1, 31) if i not in _TESTS_ONLY
}

TESTS_ONLY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    f"q{i}": globals()[f"q{i}"] for i in _TESTS_ONLY
}


ORACLE_SQL: dict[str, str] = {
    "q1": (
        "SELECT l_orderkey, l_linenumber, l_quantity, CAST(l_quantity AS BIGINT) AS q "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    "q2": "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000 ORDER BY o_orderkey",
    "q3": "SELECT c_custkey FROM customer WHERE c_mktsegment <> 'BUILDING' AND c_nationkey IN (1,2,3) ORDER BY c_custkey",
    "q4": "SELECT p_partkey FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey",
    "q5": (
        "SELECT c_custkey, COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg "
        "FROM customer WHERE NULLIF(c_mktsegment, 'MACHINERY') IS NOT NULL ORDER BY c_custkey"
    ),
    "q7": "SELECT p_partkey, CASE WHEN p_brand = '' THEN p_name ELSE p_brand END AS brand FROM part ORDER BY p_partkey",
    "q9": (
        "SELECT event_id, strftime(make_timestamp(CAST(FLOOR(value) AS BIGINT) * 1000000), "
        "'%Y-%m-%d %H:%M:%S') AS ts_s, strftime(ts, '%H:%M:%S') AS tod "
        "FROM events ORDER BY event_id"
    ),
    "q11": "SELECT p_partkey, split_part(p_type, ' ', 1) AS t1 FROM part ORDER BY p_partkey",
    "q13": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "q15": (
        "SELECT o_orderkey, c_name, n_name FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey ORDER BY o_orderkey"
    ),
    "q16": (
        "SELECT a.l_orderkey, a.l_linenumber FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber "
        "AND a.l_partkey = b.l_partkey ORDER BY a.l_orderkey, a.l_linenumber"
    ),
    "q17": (
        "WITH dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS full_date FROM orders) "
        "SELECT o_orderkey, strftime(dd.full_date, '%Y-%m-%d') AS full_date, "
        "strftime(CAST(dd.full_date - INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS d30 "
        "FROM orders JOIN dd "
        "ON CAST(o_orderdate AS DATE) = dd.full_date ORDER BY o_orderkey"
    ),
    "q18": (
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL) "
        "ORDER BY c_custkey"
    ),
    "q19": (
        "SELECT user_id, event_type, value FROM (SELECT user_id, event_type, value, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) rn "
        "FROM events) WHERE rn = 1 ORDER BY user_id, event_type"
    ),
    "q20": (
        "SELECT n_name, CAST(ROW_NUMBER() OVER (ORDER BY n_name) AS INTEGER) AS nation_sk "
        "FROM (SELECT DISTINCT n_name FROM nation) ORDER BY nation_sk"
    ),
    "q21": (
        "SELECT strftime(d, '%Y-%m-%d') AS full_date, CAST(EXTRACT(DAY FROM d) AS INTEGER) AS day, "
        "CAST(EXTRACT(MONTH FROM d) AS INTEGER) AS month, "
        "CAST(EXTRACT(YEAR FROM d) AS INTEGER) AS year, dayname(d) AS week_day "
        "FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders) ORDER BY full_date"
    ),
    "q23": (
        "SELECT c_mktsegment, cnt FROM (SELECT c_mktsegment, COUNT(*) cnt FROM customer "
        "GROUP BY c_mktsegment) ORDER BY cnt DESC, c_mktsegment LIMIT 3"
    ),
    "q25": (
        "SELECT n_name, COUNT(*) AS cnt FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY cnt DESC, n_name"
    ),
    "q26": (
        "SELECT x FROM (SELECT o_orderkey AS x FROM orders WHERE o_orderkey % 2 = 0 "
        "UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 1) ORDER BY x"
    ),
    "q27": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, "
        "COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    "q28": (
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h, COUNT(*) AS cnt "
        "FROM events GROUP BY 1 ORDER BY h"
    ),
    "q29": (
        "SELECT p_partkey, u.t FROM part, UNNEST(string_split(p_type, ' ')) AS u(t) "
        "ORDER BY p_partkey, u.t"
    ),
}

#: Oracles for the tests-only builders — same compare, run by pytest
#: (tests/test_queries_oracle.py) instead of the driver.
TESTS_ONLY_ORACLE_SQL: dict[str, str] = {
    "q12": (
        "SELECT c_nationkey, c_custkey FROM (SELECT c_nationkey, c_custkey, "
        "ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) rn FROM customer) "
        "WHERE rn = 1 ORDER BY c_nationkey"
    ),
    "q14": "SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS dup_cnt FROM lineitem",
    "q6": "SELECT c_custkey, COALESCE(c_acctbal, 0.0) AS bal FROM customer ORDER BY c_custkey",
    "q22": "SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "q24": (
        "SELECT CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bucket, COUNT(*) AS cnt "
        "FROM customer GROUP BY 1 ORDER BY bucket"
    ),
    "q8": (
        "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS q "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"
    ),
    "q10": (
        "SELECT o_orderkey, strftime(CAST(o_orderdate - INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS d30 "
        "FROM orders ORDER BY o_orderkey"
    ),
    "q30": "SELECT event_id, strftime(ts, '%H:%M:%S') AS tod FROM events ORDER BY event_id",
}
