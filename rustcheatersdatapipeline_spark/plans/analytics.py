"""Additional pipeline analytics queries: multimodal featurization and
gap-based sessionization.

Both are oracle-paired like everything in plans/: the multimodal query
proves the binary-column + mapInPandas plumbing end-to-end (the oracle
recomputes the deterministic fake decode in SQL); sessionization is the
classic stateful per-key operator expressed with window functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.multimodal import featurize_media, media_table

SESSION_GAP_MIN = 30


def multimodal_features(spark, sf_dir):
    """Binary media pipeline over Arrow batches (mapInPandas).

    documents.text is encoded to a binary payload (standing in for
    image/audio bytes — the container has no codecs, see
    functions/multimodal.py), featurized by the deterministic fake
    decode, and projected with the frame-sample list as a CSV string so
    the comparison is array-free.
    """
    docs = table(spark, sf_dir, "documents")
    media = media_table(docs, "doc_id", F.encode(F.col("text"), "UTF-8"), "text/plain")
    feats = featurize_media(media, fake=True, frame_step=2)
    return feats.select(
        "item_id",
        "mime",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        F.concat_ws(",", F.transform(F.col("sampled_frames"), lambda x: x.cast("string"))).alias(
            "sampled_frames"
        ),
        "checksum",
    ).orderBy("item_id")


def events_sessionize(spark, sf_dir):
    """Gap-based sessionization: a new session starts when a user is idle
    > 30 minutes. lag + running-sum windows — one shuffle on user_id,
    arbitrarily parallel across users at any scale."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_s").over(w).alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


def events_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per event type (p50/p90/p99).

    Spark ``percentile`` and DuckDB ``quantile_cont`` share the linear
    interpolation formula over the two straddling sorted values, so the
    doubles match bit-for-bit (probed, not assumed). Exact percentile
    sorts within each group; the approx_percentile sketch is the
    100 TB alternative when exactness isn't contractual.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
            F.percentile("value", 0.99).alias("p99"),
        )
        .orderBy("event_type")
    )


def events_rollup(spark, sf_dir):
    """ROLLUP aggregation: per (event_type, value-bucket) counts with
    subtotal and grand-total rows. Beyond the reference's surface (it
    has no grouping sets — SURVEY.md §2 intro) but standard engine
    capability; nulls mark the rollup levels, ordered NULLS FIRST in
    both engines for determinism."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.floor(F.col("value") / 100).alias("vbucket"))
        .rollup("event_type", "vbucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("vbucket").asc_nulls_first()
        )
    )


def events_pivot(spark, sf_dir):
    """PIVOT: event counts per user-id-decile with one column per event
    type (explicit value list → deterministic schema; nulls filled 0 to
    match conditional-aggregation semantics)."""
    ev = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    p = (
        ev.select((F.col("user_id") % 10).alias("decile"), "event_type")
        .groupBy("decile")
        .pivot("event_type", types)
        .count()
    )
    return p.select(
        "decile", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).orderBy("decile")


def events_asof_join(spark, sf_dir):
    """As-of join — an operator Spark lacks natively, composed from
    union + window (the scalable pattern: one shuffle on the key, no
    range-join explosion).

    For every 'purchase' event, attach the most recent 'view' by the
    same user at ts ≤ purchase ts. Right side is pre-deduped to one row
    per (user, ts) (max event_id) so the match is unique-deterministic.
    The union-window trick: tag right rows, sort (ts, right-first) per
    user, carry the last non-null right id forward — at 100 TB this is
    one partitioned sort, versus the quadratic naive range join. Oracle:
    DuckDB's native ASOF LEFT JOIN over the same deduped inputs.
    """
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("l_id")
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_id"))
    )
    tagged = right.select(
        "user_id", "ts", "r_id", F.lit(None).cast("long").alias("l_id"), F.lit(1).alias("is_r")
    ).unionByName(
        left.select("user_id", "ts", F.lit(None).cast("long").alias("r_id"), "l_id", F.lit(0).alias("is_r"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("asof_r", F.last("r_id", ignorenulls=True).over(w))
        .filter(F.col("is_r") == 0)
        .select("l_id", F.col("asof_r").alias("r_id"))
        .orderBy("l_id")
    )


def events_session_attribution(spark, sf_dir):
    """Equi+range (interval containment) join: attribute every event to
    its session from ``events_sessionize``.

    The join key is the user (equi) plus ts ∈ [session_start,
    session_end] (range) — Catalyst plans a hash/sort-merge join on
    user_id with the range predicate evaluated inline, so there is no
    quadratic interval explosion; at 100 TB both sides co-partition on
    user_id. Output: events per session re-counted via the attribution
    path — equals n_events from sessionization by construction, which
    makes the oracle a strong cross-check of BOTH operators.
    """
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    # r14 (§2.4 remove shuffles outright): both join sides consume ONE
    # shared (user_id, ts) projection so the probe side's Exchange is a
    # ReusedExchange of the window side's — the pre-r14 shape shuffled
    # the events table TWICE (once for the session windows, once for
    # the attribution probe; Exchange 3→2, Scan parquet 2→1 in
    # plans/r14). Two details make the subtrees canonically identical:
    # (a) the explicit not-null filter matches what the range join
    #     infers on the probe side (isnotnull(ts)/isnotnull(user_id));
    #     on the window side it only drops rows a window over nullable
    #     keys would route to the NULL partition — no such rows exist
    #     (events.ts/user_id carry no NULLs at any SF);
    # (b) the windows order by ts alone, not (ts, event_id), so the
    #     probe's column set matches. Tie order cannot reach the
    #     output: among equal-ts rows only the first carries a nonzero
    #     new_s, the running sum gives every tie row the SAME
    #     session_id either way, and sessions aggregate to identical
    #     (s_user, session_id, t0, t1) rows (collect-compared old vs
    #     new at sf0.001/sf0.01/sf0.1; oracle green).
    base = ev.select("user_id", "ts").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = base.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = (
        flagged.select("user_id", "ts", F.sum("new_s").over(w).alias("session_id"))
        .groupBy(F.col("user_id").alias("s_user"), "session_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    joined = base.join(
        sess,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("ts") >= F.col("t0"))
        & (F.col("ts") <= F.col("t1")),
    )
    return (
        joined.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_attributed"))
        .orderBy("user_id", "session_id")
    )


def events_unpivot(spark, sf_dir):
    """UNPIVOT/melt: the inverse of events_pivot — wide per-type count
    columns back to long (decile, event_type, cnt) rows via stack()."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = events_pivot(spark, sf_dir)
    stack_expr = "stack({n}, {args}) as (event_type, cnt)".format(
        n=len(types), args=", ".join(f"'{t}', {t}" for t in types)
    )
    return (
        wide.selectExpr("decile", stack_expr)
        .filter(F.col("cnt") > 0)  # empty cells exist only in the wide form
        .orderBy("decile", "event_type")
    )


def events_scd2(spark, sf_dir):
    """SCD-2 value history per (user_id, event_type): one row per value
    change with half-open validity intervals (warehouse.writers.scd2_build;
    the incremental merge path is scd2_apply, property-tested in
    tests/test_warehouse.py). Timestamps are formatted for the compare;
    interval semantics live in the raw lead/lag program."""
    from ..warehouse.writers import scd2_build

    ev = table(spark, sf_dir, "events")
    hist = scd2_build(ev, ["user_id", "event_type"], "value", "ts")
    return hist.select(
        "user_id",
        "event_type",
        "value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    ).orderBy("user_id", "event_type", "valid_from", "value")


SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_features": multimodal_features,
    "events_sessionize": events_sessionize,
    "events_quantiles": events_quantiles,
    "events_rollup": events_rollup,
    "events_pivot": events_pivot,
    "events_asof_join": events_asof_join,
    "events_session_attribution": events_session_attribution,
    "events_unpivot": events_unpivot,
}

ORACLE_SQL: dict[str, str] = {
    # checksum is BYTE-based on both sides: Spark's fake decode sums the
    # UTF-8 buffer, so the oracle sums hex(encode(text)) byte pairs —
    # ord() over code points would silently diverge on non-ASCII text.
    "multimodal_features": (
        "WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n, "
        "hex(encode(text)) AS hx, text FROM documents), "
        # bound derived from the corpus (not a fixed cap) so an
        # oversized payload fails the compare loudly instead of
        # silently truncating the checksum (ADVICE r12 class)
        "pos AS (SELECT unnest(generate_series(1, "
        "(SELECT GREATEST(max(octet_length(encode(text))), 1) FROM documents))) AS i), "
        "ch AS (SELECT doc_id, "
        "CAST(SUM(('0x' || substring(hx, 2 * i - 1, 2))::BIGINT) AS BIGINT) AS checksum "
        "FROM b JOIN pos ON i <= n GROUP BY doc_id) "
        "SELECT b.doc_id AS item_id, 'text/plain' AS mime, CAST(n AS INT) AS n_bytes, "
        "CAST(16 + n % 64 AS INT) AS width, CAST(16 + (n // 64) % 64 AS INT) AS height, "
        "CAST(1 + n % 8 AS INT) AS n_frames, "
        "array_to_string(range(0, CAST(1 + n % 8 AS INT), 2), ',') AS sampled_frames, "
        "ch.checksum FROM b JOIN ch ON b.doc_id = ch.doc_id ORDER BY item_id"
    ),
    "events_sessionize": (
        "WITH flagged AS (SELECT user_id, ts, event_id, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        f"OR ts > lag(ts) OVER w + INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT user_id, ts, CAST(SUM(new_s) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS session_id FROM flagged) "
        "SELECT user_id, session_id, COUNT(*) AS n_events, "
        "strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start, "
        "strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end "
        "FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"
    ),
    "events_quantiles": (
        "SELECT event_type, COUNT(*) AS cnt, "
        "quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90, "
        "quantile_cont(value, 0.99) AS p99 "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    "events_rollup": (
        "SELECT event_type, CAST(FLOOR(value / 100) AS BIGINT) AS vbucket, COUNT(*) AS cnt "
        "FROM events GROUP BY ROLLUP (event_type, vbucket) "
        "ORDER BY event_type NULLS FIRST, vbucket NULLS FIRST"
    ),
    "events_pivot": (
        "SELECT user_id % 10 AS decile, "
        "COUNT(*) FILTER (WHERE event_type = 'click') AS click, "
        "COUNT(*) FILTER (WHERE event_type = 'error') AS \"error\", "
        "COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase, "
        "COUNT(*) FILTER (WHERE event_type = 'signup') AS signup, "
        "COUNT(*) FILTER (WHERE event_type = 'view') AS \"view\" "
        "FROM events GROUP BY 1 ORDER BY decile"
    ),
    "events_asof_join": (
        "WITH l AS (SELECT user_id, ts, event_id AS l_id FROM events WHERE event_type = 'purchase'), "
        "r AS (SELECT user_id, ts, MAX(event_id) AS r_id FROM events WHERE event_type = 'view' "
        "GROUP BY user_id, ts) "
        "SELECT l.l_id, r.r_id FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND l.ts >= r.ts ORDER BY l_id"
    ),
    "events_session_attribution": (
        "WITH flagged AS (SELECT user_id, ts, event_id, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        f"OR ts > lag(ts) OVER w + INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT user_id AS s_user, session_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM "
        "(SELECT user_id, ts, CAST(SUM(new_s) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
        "AS session_id FROM flagged) GROUP BY s_user, session_id) "
        "SELECT e.user_id, s.session_id, COUNT(*) AS n_attributed "
        "FROM events e JOIN sess s ON e.user_id = s.s_user AND e.ts >= s.t0 AND e.ts <= s.t1 "
        "GROUP BY e.user_id, s.session_id ORDER BY e.user_id, s.session_id"
    ),
    "events_unpivot": (
        "SELECT user_id % 10 AS decile, event_type, COUNT(*) AS cnt FROM events "
        "GROUP BY 1, 2 ORDER BY decile, event_type"
    ),
}

def events_sliding_counts(spark, sf_dir):
    """Sliding-window aggregation (§2.7 family): 2-hour windows sliding
    every hour — each event contributes to exactly two windows. Spark's
    ``window(ts, '2 hours', '1 hour')`` handles this natively (epoch-
    aligned starts); the oracle reproduces the identical assignment by
    emitting each event into ``date_trunc('hour', ts)`` and the hour
    before it. Scales like any keyed agg: one shuffle on window start,
    map-side partial counts; in streaming form the same window
    expression runs under a watermark with state = #open windows
    (count parity pinned in tests/test_streaming.py — exact
    count_distinct is batch-only in streams, use
    approx_count_distinct there)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("user_id").alias("users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("h_start"),
            "cnt",
            "users",
        )
        .orderBy("h_start")
    )


#: funnel step chain: first view → first click AFTER it → first
#: purchase after that (strict ordering, ties broken by the strict
#: inequality itself — a same-instant event does not advance the chain)
FUNNEL_STEPS = ("view", "click", "purchase")
#: retention cohort anchor (the corpus starts 2024-01-01); weeks are
#: integer day-diffs div 7 — identical arithmetic in both engines, no
#: locale/week-start semantics involved
RETENTION_ANCHOR = "2024-01-01"


def events_funnel(spark, sf_dir):
    """Ordered conversion funnel: users whose FIRST view precedes a
    click that precedes a purchase. Three chained conditional-min
    aggregates (each a hash aggregate on user_id; the join back is
    user-keyed, co-partitioned with the aggregate) — no window over the
    full event stream, no per-user state. Output: (step, step_type,
    n_users), monotone non-increasing."""
    return funnel_frame(table(spark, sf_dir, "events"))


def funnel_frame(ev: DataFrame) -> DataFrame:
    u1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    parts = []
    for i, (df, st) in enumerate(zip((u1, u2, u3), FUNNEL_STEPS), start=1):
        parts.append(
            df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
                F.lit(i).cast("int").alias("step"),
                F.lit(st).alias("step_type"),
                "n_users",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("step")


def events_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by FIRST-ACTIVITY week,
    counted in every later week they return. (cohort_week, week_offset,
    n_users) — the classic product-analytics triangle. Two hash
    aggregates + one user-keyed join; weeks are integer day-diffs from
    a fixed anchor div 7, so the bucketing is pure arithmetic in both
    engines."""
    ev = table(spark, sf_dir, "events")
    # integer div, not /7-then-cast: DuckDB CAST(double) ROUNDS while
    # Spark truncates (the recorded cross-engine gotcha)
    wk = F.expr(f"datediff(to_date(ts), date '{RETENTION_ANCHOR}') div 7").cast("int")
    active = ev.select("user_id", wk.alias("week")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def events_props_rollup(spark, sf_dir):
    """Semi-structured rollup: the ``props`` column is a JSON payload
    (the reference's raw API blobs, §1.2) — extract ``$.k`` with the
    engine's JSON path function (JVM-side, no UDF), bucket it, and
    aggregate per (event_type, bucket). Sums stay integer (exact,
    order-independent); the JSON parse happens inside the scan
    projection, so the plan is one hash aggregate over a codegen
    extract."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", F.expr("k div 10").cast("int").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type", "k_bucket")
    )


def events_resample_hourly(spark, sf_dir):
    """Time-series regularization: each user's irregular event stream
    resampled onto an hourly grid between their first and last event,
    with the ``value`` forward-filled from the latest observation — the
    gap-filling primitive every downstream window/asof consumer wants a
    regular grid for.

    Shape: one (user, hour) hash aggregate for the last observation per
    cell, a per-user ``sequence`` explode for the grid (array-local, no
    shuffle), one user-keyed join, and one running ``last(ignorenulls)``
    window — state bounded by the grid, never the event count. The
    filled value is a bit-copied observation (no arithmetic), so the
    oracle compare is exact on doubles."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        # ts reads as TIMESTAMP_NTZ; the cast interprets it in the
        # session TZ (UTC), exactly how the oracle's epoch_us sees it
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("h"),
        "value",
        "ts",
        "event_id",
    )
    w_last = Window.partitionBy("user_id", "h").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    obs = (
        e.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("user_id", "h", "value")
    )
    span = e.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    w_fill = Window.partitionBy("user_id").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        grid.join(obs, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.last("value", ignorenulls=True).over(w_fill).alias("value_ffill"),
        )
        .orderBy("user_id", "h")
    )


TESTS_ONLY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_scd2": events_scd2,
    "events_sliding_counts": events_sliding_counts,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "events_props_rollup": events_props_rollup,
    "events_resample_hourly": events_resample_hourly,
}

TESTS_ONLY_ORACLE_SQL: dict[str, str] = {
    "events_funnel": (
        "WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
        f"WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id), "
        "u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
        f"JOIN u1 USING (user_id) WHERE e.event_type = '{FUNNEL_STEPS[1]}' "
        "AND e.ts > u1.t1 GROUP BY e.user_id), "
        "u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
        f"JOIN u2 USING (user_id) WHERE e.event_type = '{FUNNEL_STEPS[2]}' "
        "AND e.ts > u2.t2 GROUP BY e.user_id) "
        f"SELECT CAST(1 AS INT) AS step, '{FUNNEL_STEPS[0]}' AS step_type, CAST(COUNT(*) AS BIGINT) AS n_users FROM u1 "
        f"UNION ALL SELECT CAST(2 AS INT), '{FUNNEL_STEPS[1]}', CAST(COUNT(*) AS BIGINT) FROM u2 "
        f"UNION ALL SELECT CAST(3 AS INT), '{FUNNEL_STEPS[2]}', CAST(COUNT(*) AS BIGINT) FROM u3 "
        "ORDER BY step"
    ),
    "events_resample_hourly": (
        "WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS h, value, ts, event_id "
        "FROM events), "
        "obs AS (SELECT user_id, h, value FROM "
        "(SELECT user_id, h, value, ROW_NUMBER() OVER "
        "(PARTITION BY user_id, h ORDER BY ts DESC, event_id DESC) AS rn FROM e) "
        "WHERE rn = 1), "
        "span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM e GROUP BY user_id), "
        "grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span), "
        "j AS (SELECT g.user_id, g.h, o.value FROM grid g "
        "LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h) "
        "SELECT user_id, h, last_value(value IGNORE NULLS) OVER "
        "(PARTITION BY user_id ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS value_ffill FROM j ORDER BY user_id, h"
    ),
    "events_props_rollup": (
        "WITH k AS (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k "
        "FROM events) "
        "SELECT event_type, CAST(k // 10 AS INT) AS k_bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, CAST(SUM(k) AS BIGINT) AS sum_k "
        "FROM k WHERE k IS NOT NULL "
        "GROUP BY event_type, k_bucket ORDER BY event_type, k_bucket"
    ),
    "events_retention": (
        "WITH active AS (SELECT DISTINCT user_id, "
        f"CAST(date_diff('day', DATE '{RETENTION_ANCHOR}', CAST(ts AS DATE)) // 7 AS INT) AS week "
        "FROM events), "
        "cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM active GROUP BY user_id) "
        "SELECT cohort_week, a.week - c.cohort_week AS week_offset, "
        "CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM active a JOIN cohort c USING (user_id) "
        "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"
    ),
    "events_scd2": (
        "WITH ordered AS (SELECT user_id, event_type, value, ts, "
        "LAG(value) OVER w AS prev FROM events "
        "WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, value)), "
        "ch AS (SELECT user_id, event_type, value, ts FROM ordered "
        "WHERE prev IS NULL OR value <> prev), "
        "v AS (SELECT user_id, event_type, value, ts, "
        "LEAD(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, value) AS ts_to "
        "FROM ch) "
        "SELECT user_id, event_type, value, "
        "strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from, "
        "strftime(ts_to, '%Y-%m-%d %H:%M:%S') AS valid_to, "
        "CASE WHEN ts_to IS NULL THEN 1 ELSE 0 END AS is_current "
        "FROM v ORDER BY user_id, event_type, valid_from, value"
    ),
    "events_sliding_counts": (
        "WITH assigned AS ("
        "SELECT date_trunc('hour', ts) AS h, user_id FROM events "
        "UNION ALL "
        "SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS h, user_id FROM events) "
        "SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS h_start, "
        "COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS users "
        "FROM assigned GROUP BY h ORDER BY h_start"
    ),
}
