"""Declarative table constraints stored in the GoldStore manifest.

Reference parity: the warehouse DDL declares NOT NULL / PRIMARY KEY /
FOREIGN KEY on its dims and facts
(/root/reference/database_build/data_warehouse.sql) and Postgres
enforces them at load time. Here the declaration is a stored table
property (``declare_constraints``) enforced at every later
publish/append/merge — ALTER TABLE semantics: existing rows are
validated when the constraint is declared, each batch is validated
before its commit, and a violation leaves the store untouched."""

import pytest

from rustcheatersdatapipeline_spark.warehouse.persist import (
    ConstraintError,
    ExpectationError,
    GoldStore,
)

DIM = "nation_dim"
FACT = "ban_fact"


def _dim(spark, keys):
    return spark.createDataFrame([(k, f"n{k}") for k in keys], "nation_sk int, name string")


def _fact(spark, rows):
    return spark.createDataFrame(rows, "ban_sk int, nation_sk int, days int")


FACT_CONS = {
    "not_null": ["ban_sk"],
    "check": ["days >= 0"],
    "primary_key": ["ban_sk"],
    "foreign_keys": [
        {"columns": ["nation_sk"], "ref_table": DIM, "ref_columns": ["nation_sk"]}
    ],
}


def _store(spark, tmp_path):
    store = GoldStore(spark, str(tmp_path / "gold"))
    store.publish(
        {DIM: _dim(spark, [1, 2]), FACT: _fact(spark, [(10, 1, 5), (11, 2, 0)])},
        base_version=0,
    )
    return store


@pytest.mark.slow
def test_declare_and_getter_metadata_only(spark, tmp_path):
    store = _store(spark, tmp_path)
    v = store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    assert v == 2
    assert store.constraints(FACT) == FACT_CONS
    assert store.constraints(DIM) == {}
    # data untouched by the metadata commit
    assert store.read(FACT).count() == 2
    store.validate_constraints(FACT)  # clean


@pytest.mark.slow
def test_declare_validates_existing_rows(spark, tmp_path):
    store = _store(spark, tmp_path)
    # existing fact rows have days 5/0, neither a nation_sk: declaring
    # days as a foreign key must fail the existing-rows validation
    bad = dict(FACT_CONS, foreign_keys=[
        {"columns": ["days"], "ref_table": DIM, "ref_columns": ["nation_sk"]}
    ])
    with pytest.raises(ConstraintError, match="foreign key"):
        store.declare_constraints({FACT: bad}, base_version=1)
    assert store.current_version() == 1  # nothing committed
    with pytest.raises(ConstraintError, match="check|violate"):
        store.declare_constraints(
            {FACT: {"check": ["days > 3"]}}, base_version=1
        )
    with pytest.raises(ConstraintError, match="unknown table"):
        store.declare_constraints({"nope": {"not_null": ["x"]}}, base_version=1)


def test_publish_enforces_each_constraint_kind(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    base = store.current_version()
    # not_null (rides the expectation audit)
    with pytest.raises(ExpectationError, match="ban_sk IS NOT NULL"):
        store.publish(
            {FACT: spark.sql("SELECT CAST(NULL AS INT) ban_sk, 1 nation_sk, 1 days")},
            base_version=base,
        )
    # check
    with pytest.raises(ExpectationError, match="days >= 0"):
        store.publish({FACT: _fact(spark, [(12, 1, -4)])}, base_version=base)
    # primary key duplicate
    with pytest.raises(ConstraintError, match="duplicate primary key"):
        store.publish(
            {FACT: _fact(spark, [(12, 1, 3), (12, 2, 4)])}, base_version=base
        )
    # foreign key orphan
    with pytest.raises(ConstraintError, match="no match in 'nation_dim'"):
        store.publish({FACT: _fact(spark, [(12, 99, 3)])}, base_version=base)
    # store untouched by all four rejections
    assert store.current_version() == base
    assert store.read(FACT).count() == 2
    # a valid batch commits, and the declaration survives the replace
    store.publish({FACT: _fact(spark, [(20, 1, 7)])}, base_version=base)
    assert store.constraints(FACT) == FACT_CONS


@pytest.mark.slow
def test_fk_resolves_against_staged_sibling_dim(spark, tmp_path):
    """Dims + facts published in ONE batch: the fact's FK must validate
    against the dim being published, not the stale stored dim — the
    reference's ordered dims-then-facts load in a single transaction."""
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    base = store.current_version()
    store.publish(
        {DIM: _dim(spark, [1, 2, 3]), FACT: _fact(spark, [(30, 3, 1)])},
        base_version=base,
    )
    assert store.read(FACT).count() == 1
    # but without the new dim in the batch, key 4 is an orphan
    with pytest.raises(ConstraintError, match="no match"):
        store.publish(
            {FACT: _fact(spark, [(31, 4, 1)])},
            base_version=store.current_version(),
        )


def test_append_enforces_pk_against_existing_rows(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    base = store.current_version()
    with pytest.raises(ConstraintError, match="already exists"):
        store.publish_append({FACT: _fact(spark, [(10, 1, 9)])}, base_version=base)
    with pytest.raises(ConstraintError, match="no match"):
        store.publish_append({FACT: _fact(spark, [(40, 77, 9)])}, base_version=base)
    assert store.current_version() == base
    v = store.publish_append({FACT: _fact(spark, [(40, 2, 9)])}, base_version=base)
    assert store.read(FACT).count() == 3
    assert store.constraints(FACT) == FACT_CONS  # carried through append
    assert v == store.current_version()


def test_merge_enforces_on_source_delta(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    with pytest.raises(ConstraintError, match="days >= 0"):
        store.merge(FACT, _fact(spark, [(10, 1, -1)]), ["ban_sk"], mode="upsert")
    with pytest.raises(ConstraintError, match="no match"):
        store.merge(FACT, _fact(spark, [(10, 55, 1)]), ["ban_sk"], mode="upsert")
    # updating an existing key is legal for merge (unlike append)
    store.merge(FACT, _fact(spark, [(10, 2, 8)]), ["ban_sk"], mode="upsert")
    got = {tuple(r) for r in store.read(FACT).collect()}
    assert (10, 2, 8) in got and len(got) == 2
    assert store.constraints(FACT) == FACT_CONS  # carried through merge


def test_constraints_survive_optimize_and_validate_detects_tamper(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    base = store.current_version()
    for i in range(3):
        base = store.publish_append(
            {FACT: _fact(spark, [(100 + i, 1, i)])}, base_version=base
        )
    store.optimize(FACT)
    assert store.constraints(FACT) == FACT_CONS
    store.validate_constraints(FACT)
    # shrinking the dim under the fact's feet is now REJECTED at publish
    # time by the parent-side audit (r10, reference Postgres parity) ...
    with pytest.raises(ConstraintError, match="orphan foreign key"):
        store.publish(
            {DIM: _dim(spark, [1])}, base_version=store.current_version()
        )
    # ... so drift can only arrive through audit-free metadata paths
    # (single-table restore / external tampering) — validate_constraints
    # is the recheck tool that catches it after the fact
    v_consistent = store.current_version()
    store.publish(
        {DIM: _dim(spark, [1]), FACT: _fact(spark, [(300, 1, 4)])},
        base_version=v_consistent,
    )
    store.restore(v_consistent, tables=[FACT])  # facts referencing key 2 return
    with pytest.raises(ConstraintError, match="no match"):
        store.validate_constraints(FACT)


def test_append_fk_sees_prior_plus_appended_dim_rows(spark, tmp_path):
    """Appending dim delta + fact delta in one batch: the fact's FK must
    resolve against prior dim rows UNION the appended delta — a fact
    referencing an old dim key must not become a false orphan."""
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    base = store.current_version()
    store.publish_append(
        {
            DIM: _dim(spark, [5]),  # delta only carries the NEW key
            FACT: _fact(spark, [(50, 5, 1), (51, 1, 2)]),  # new + OLD key
        },
        base_version=base,
    )
    assert store.read(FACT).count() == 4
    # a key in neither prior nor delta still rejects
    with pytest.raises(ConstraintError, match="no match"):
        store.publish_append(
            {DIM: _dim(spark, [6]), FACT: _fact(spark, [(60, 7, 1)])},
            base_version=store.current_version(),
        )


def test_streaming_merge_sink_fails_batch_on_violation(spark, tmp_path):
    """A MergeUpsertSink trigger whose batch violates a declared
    constraint fails that micro-batch (stream surfaces the error) and
    the store keeps its pre-batch state — a poison batch can never
    commit through the streaming path either."""
    import json

    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from rustcheatersdatapipeline_spark.streaming.ingest import MergeUpsertSink

    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    v_before = store.current_version()
    rows_before = {tuple(r) for r in store.read(FACT).collect()}

    drop = tmp_path / "cdc"
    drop.mkdir()
    (drop / "bad.jsonl").write_text(
        json.dumps({"ban_sk": 50, "nation_sk": 999, "days": 1})  # FK orphan
    )
    sink = MergeUpsertSink(store, FACT, ["ban_sk"])
    q = (
        spark.readStream.schema("ban_sk int, nation_sk int, days int")
        .json(str(drop))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises((StreamingQueryException, Py4JJavaError)) as e:
        q.awaitTermination(300)
    assert "no match" in str(e.value) or "ConstraintError" in str(e.value)
    assert store.current_version() == v_before
    assert {tuple(r) for r in store.read(FACT).collect()} == rows_before


def test_parent_delete_rejects_when_it_would_orphan_children(spark, tmp_path):
    """merge(mode="delete") on a table OTHER tables declare FKs against
    must audit the reverse direction: deleting a referenced dim key is
    rejected (the reference's Postgres REFERENCES does the same), while
    deleting an unreferenced key commits normally."""
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    # add a dim key no fact references, so one delete can succeed
    store.publish_append(
        {DIM: _dim(spark, [9])}, base_version=store.current_version()
    )
    v = store.current_version()
    # fact rows reference nation_sk 1 and 2: deleting key 1 would orphan
    with pytest.raises(ConstraintError, match="orphan foreign key"):
        store.merge(
            DIM, spark.createDataFrame([(1,)], "nation_sk int"),
            ["nation_sk"], mode="delete",
        )
    assert store.current_version() == v  # store untouched
    assert store.read(DIM).count() == 3
    # deleting the unreferenced key 9 is legal
    store.merge(
        DIM, spark.createDataFrame([(9,)], "nation_sk int"),
        ["nation_sk"], mode="delete",
    )
    assert {r["nation_sk"] for r in store.read(DIM).collect()} == {1, 2}
    store.validate_constraints(FACT)  # children still resolve


def test_parent_replace_rejects_when_it_would_orphan_children(spark, tmp_path):
    """A replace publish of a referenced dim that DROPS a key still held
    by fact rows is rejected; a replace keeping every referenced key
    commits. Children staged in the same batch validate forward and are
    exempt from the reverse audit."""
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)
    base = store.current_version()
    with pytest.raises(ConstraintError, match="orphan foreign key"):
        store.publish({DIM: _dim(spark, [1])}, base_version=base)  # drops key 2
    assert store.current_version() == base
    # superset replace is fine
    store.publish({DIM: _dim(spark, [1, 2, 3])}, base_version=base)
    # shrinking the dim WHILE republishing consistent facts in the same
    # batch is fine: the staged fact only references surviving keys
    store.publish(
        {DIM: _dim(spark, [1]), FACT: _fact(spark, [(10, 1, 5)])},
        base_version=store.current_version(),
    )
    assert store.read(DIM).count() == 1 and store.read(FACT).count() == 1


@pytest.mark.slow
def test_merge_checks_declared_pk_when_it_differs_from_key_cols(spark, tmp_path):
    """Declared PRIMARY KEY != merge key_cols: the insert portion of the
    merge must not commit duplicate PKs (ADVICE r9)."""
    store = _store(spark, tmp_path)
    store.declare_constraints({FACT: FACT_CONS}, base_version=1)  # PK ban_sk
    # source replaces the nation_sk=1 row but reuses SURVIVING pk 11
    with pytest.raises(ConstraintError, match="duplicate primary key"):
        store.merge(FACT, _fact(spark, [(11, 1, 9)]), ["nation_sk"], mode="upsert")
    # source-internal pk dup across distinct merge keys
    with pytest.raises(ConstraintError, match="duplicate primary key"):
        store.merge(
            FACT, _fact(spark, [(70, 1, 1), (70, 2, 2)]), ["nation_sk"],
            mode="upsert",
        )
    # insert_if_absent: fresh merge key but an already-taken pk
    store.publish_append(
        {DIM: _dim(spark, [3])}, base_version=store.current_version()
    )
    with pytest.raises(ConstraintError, match="duplicate primary key"):
        store.merge(
            FACT, _fact(spark, [(11, 3, 1)]), ["nation_sk"],
            mode="insert_if_absent",
        )
    assert store.read(FACT).count() == 2  # every rejection left it alone
    # replacing a row with ITS OWN pk is legal (the old holder is gone)
    store.merge(FACT, _fact(spark, [(10, 1, 9)]), ["nation_sk"], mode="upsert")
    got = {tuple(r) for r in store.read(FACT).collect()}
    assert (10, 1, 9) in got and len(got) == 2
