"""Z-order layout (operators/layout.py): correctness (pure permutation)
and the data-skipping win it exists for (tighter per-file min/max on
EVERY indexed column vs a linear sort)."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rustcheatersdatapipeline_spark.catalog import table
from rustcheatersdatapipeline_spark.operators.layout import (
    write_zordered,
    zorder_value,
)


def _file_ranges(path, cols):
    """Per-file (min, max) of each column from parquet footer stats —
    what a scan's file/row-group pruning consults."""
    import glob

    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        rng = {}
        for c in cols:
            ci = schema_names.index(c)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            rng[c] = (min(mins), max(maxs))
        out.append(rng)
    return out


def test_zorder_is_a_permutation(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    out = str(tmp_path / "z")
    write_zordered(ev, ["user_id", "event_id"], out, num_files=8)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    want = sorted(r["event_id"] for r in ev.collect())
    assert got == want
    assert "_zvalue" not in spark.read.parquet(out).columns


def test_zvalue_is_codegen_not_udf(spark, sf_dir):
    """The z-value must stay JVM-side: no BatchEvalPython / Arrow eval
    in the plan."""
    plan = (
        zorder_value(table(spark, sf_dir, "events"), ["user_id", "event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_zorder_prunes_both_columns(spark, sf_dir, tmp_path):
    """A linear sort by ts leaves user_id striped across every file —
    a user_id-only range predicate prunes NOTHING there, while z-order
    must prune it; and z-order must still prune a ts-only predicate
    (trading some single-column resolution for coverage of both)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    n_files = 8
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zord")
    (
        ev.repartitionByRange(n_files, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.parquet(linear)
    )
    write_zordered(ev, ["user_id", "ts_us"], zpath, num_files=n_files)

    # median-centered narrow predicate on both dimensions
    row = ev.agg(
        F.expr("percentile_approx(user_id, 0.5)").alias("mu"),
        F.expr("percentile_approx(ts_us, 0.5)").alias("mt"),
        F.max("user_id").alias("xu"),
        F.min("user_id").alias("nu"),
        F.max("ts_us").alias("xt"),
        F.min("ts_us").alias("nt"),
    ).collect()[0]
    u_lo, u_hi = row["mu"], row["mu"] + (row["xu"] - row["nu"]) // 8
    t_lo, t_hi = row["mt"], row["mt"] + (row["xt"] - row["nt"]) // 8

    def candidates(path, col, lo, hi):
        n = 0
        for rng in _file_ranges(path, [col]):
            cl, ch = rng[col]
            if ch >= lo and cl <= hi:
                n += 1
        return n

    # user_id-only predicate: the dimension linear-by-ts CANNOT prune
    lin_u = candidates(linear, "user_id", u_lo, u_hi)
    z_u = candidates(zpath, "user_id", u_lo, u_hi)
    assert lin_u == n_files  # striped: every file is a candidate
    assert z_u < lin_u, (z_u, lin_u)

    # ts-only predicate: z-order must still skip some files
    z_t = candidates(zpath, "ts_us", t_lo, t_hi)
    assert z_t < n_files, z_t

    # and the layouts agree on the actual answer
    pred = (
        (F.col("user_id") >= u_lo)
        & (F.col("user_id") <= u_hi)
        & (F.col("ts_us") >= t_lo)
        & (F.col("ts_us") <= t_hi)
    )
    got = spark.read.parquet(zpath).filter(pred).count()
    want = ev.filter(pred).count()
    assert got == want > 0


def test_zorder_all_null_column_does_not_collapse_partitioning(spark, tmp_path):
    """ADVICE r5: NULL min/max (all-null column) or NULL values must map
    to rank 0, never a NULL _zvalue — a NULL z-value would funnel every
    row into one range partition and silently destroy clustering."""
    df = spark.range(1000).select(
        F.col("id").alias("a"), F.lit(None).cast("double").alias("b")
    )
    z = zorder_value(df, ["a", "b"])
    assert z.filter(F.col("_zvalue").isNull()).count() == 0
    # column a still clusters: files cover disjoint a-ranges
    out = str(tmp_path / "znull")
    write_zordered(df, ["a", "b"], out, num_files=4)
    ranges = _file_ranges(out, ["a"])
    assert len(ranges) > 1
    spans = sorted((r["a"][0], r["a"][1]) for r in ranges)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2
