"""Model-based randomized test of the GoldStore table-format surface.

A reference model (a plain dict keyed by ``k``) applies the same
operation sequence as the store — append, upsert merge, delete merge,
insert-if-absent merge, compact, optimize, restore — and the store's
visible table must equal the model after EVERY step. This is the
state-machine test that catches interaction bugs no single-feature test
can (e.g. a merge after a compact after a restore), with deterministic
seeds so failures replay.
"""

import random

import pytest

from rustcheatersdatapipeline_spark.warehouse.persist import GoldStore

KEY_SPACE = 40


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def _read(store):
    return {r["k"]: r["v"] for r in store.read("t").collect()}


def _apply(spark, store, model, snapshots, op, rng):
    if op == "append":
        # fresh keys only (the table has a unique-key contract)
        fresh = [k for k in range(KEY_SPACE) if k not in model]
        if not fresh:
            return
        ks = rng.sample(fresh, min(len(fresh), rng.randint(1, 4)))
        rows = [(k, f"a{k}.{rng.randint(0, 9)}") for k in ks]
        store.publish_append({"t": _df(spark, rows)}, store.current_version())
        model.update({k: v for k, v in rows})
    elif op == "upsert":
        ks = rng.sample(range(KEY_SPACE), rng.randint(1, 5))
        rows = [(k, f"u{k}.{rng.randint(0, 9)}") for k in ks]
        # both merge strategies must be model-indistinguishable
        store.merge("t", _df(spark, rows), ["k"],
                    strategy=rng.choice(["cow", "mor"]))
        model.update({k: v for k, v in rows})
    elif op == "insert_if_absent":
        ks = rng.sample(range(KEY_SPACE), rng.randint(1, 5))
        rows = [(k, f"i{k}.{rng.randint(0, 9)}") for k in ks]
        store.merge("t", _df(spark, rows), ["k"], mode="insert_if_absent")
        for k, v in rows:
            model.setdefault(k, v)
    elif op == "delete":
        ks = rng.sample(range(KEY_SPACE), rng.randint(1, 5))
        store.merge(
            "t", spark.createDataFrame([(k,) for k in ks], "k bigint"),
            ["k"], mode="delete", strategy=rng.choice(["cow", "mor"]),
        )
        for k in ks:
            model.pop(k, None)
    elif op == "compact":
        store.compact("t")
    elif op == "optimize":
        store.optimize("t", min_live_fraction=1.0)
    elif op == "restore":
        if snapshots:
            v, snap = rng.choice(snapshots)
            try:
                store.restore(v, tables=["t"])
            except (FileNotFoundError, KeyError):
                return  # snapshot aged out — fail-fast path, store intact
            model.clear()
            model.update(snap)
    snapshots.append((store.current_version(), dict(model)))


@pytest.mark.parametrize("seed", [11, 23])
def test_store_equals_model_under_random_op_sequences(spark, tmp_path, seed):
    rng = random.Random(seed)
    store = GoldStore(spark, str(tmp_path / f"gold{seed}"))
    store.publish_append(
        {"t": _df(spark, [(0, "a0.0"), (1, "a1.0"), (2, "a2.0")])}, 0
    )
    model = {0: "a0.0", 1: "a1.0", 2: "a2.0"}
    snapshots = [(store.current_version(), dict(model))]
    ops = ["append", "upsert", "insert_if_absent", "delete", "upsert",
           "append", "compact", "upsert", "optimize", "delete",
           "insert_if_absent", "restore", "upsert", "append", "delete",
           "compact", "upsert", "upsert", "delete", "optimize"]
    rng.shuffle(ops)
    for i, op in enumerate(ops):
        _apply(spark, store, model, snapshots, op, rng)
        got = _read(store)
        assert got == model, f"seed={seed} step={i} op={op}"
        # entry row count stays metadata-consistent with reality
        assert store.current_manifest()["tables"]["t"]["rows"] == len(model)
