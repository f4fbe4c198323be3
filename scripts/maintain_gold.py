"""GoldStore maintenance CLI — the operational loop a 100 TB deployment
runs on a schedule (Delta/Iceberg ``OPTIMIZE``/``VACUUM`` analog, here
as plain commands over the engine's own transactional store).

Usage:
    python scripts/maintain_gold.py <store_path> status
    python scripts/maintain_gold.py <store_path> compact <table>
    python scripts/maintain_gold.py <store_path> vacuum [--keep-versions N]
    python scripts/maintain_gold.py <store_path> zorder <table> <col> [col ...]
    python scripts/maintain_gold.py <store_path> optimize <table> [--min-live F]
    python scripts/maintain_gold.py <store_path> maintain [--min-live F]
    python scripts/maintain_gold.py <store_path> restore <version> [table ...]

- ``status``  — current version, per-table dir counts, retained versions.
- ``compact`` — fold a table's append dirs into one (CAS-protected).
- ``vacuum``  — retention-aware reclaim: never touches txn dirs younger
  than the age threshold or referenced by the last N manifests.
- ``zorder``  — rewrite a table Morton-clustered on the given columns
  (operators/layout.py) and publish the clustered copy as a new version
  through the normal write-audit-publish path, so readers see either
  the old or the new layout, never a half-rewrite.
- ``optimize`` — reclaim copy-on-write merge debt: rewrite only dirs
  whose live-file fraction fell below the threshold (default 0.5).
- ``maintain`` — the DV-maintenance cron body: run ``optimize`` over
  EVERY table, folding deletion-vector/merge debt wherever the
  live fraction crossed the threshold; healthy tables are no-ops.
- ``restore`` — roll the store (or named tables) back to a retained
  version as a NEW commit; nothing is deleted.

Every verb is a thin shell over tested library methods — the CLI adds
argument parsing only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustcheatersdatapipeline_spark.operators.layout import zorder_value  # noqa: E402
from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402
from rustcheatersdatapipeline_spark.warehouse.persist import (  # noqa: E402
    GoldStore,
    publish_with_retry,
)


def cmd_status(store: GoldStore) -> None:
    m = store.current_manifest()
    print(f"version: {store.current_version()}")
    print(f"retained versions: {store.versions()}")
    for name, entry in sorted(m.get("tables", {}).items()):
        dirs = store._dirs(entry)
        props = store.properties(name)
        extra = f"  properties={props}" if props else ""
        print(f"  {name}: {len(dirs)} data dir(s){extra}")


def cmd_compact(store: GoldStore, table: str) -> None:
    v = store.compact(table)
    print(f"compacted {table} -> version {v}")


def cmd_vacuum(store: GoldStore, keep_versions: int) -> None:
    removed = store.vacuum(keep_versions=keep_versions)
    print(f"reclaimed {len(removed)} dir(s)")


def cmd_zorder(store: GoldStore, table: str, cols: list[str]) -> None:
    def build(tables):
        clustered = (
            zorder_value(tables[table], cols)
            .repartitionByRange("_zvalue")
            .sortWithinPartitions("_zvalue")
            .drop("_zvalue")
        )
        # tables not named carry forward metadata-only (publish contract)
        return {table: clustered}

    v = publish_with_retry(store, build)
    print(f"z-ordered {table} on {cols} -> version {v}")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    path, verb, rest = sys.argv[1], sys.argv[2], sys.argv[3:]
    spark = get_spark(app_name="gold-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    store = GoldStore(spark, path)
    if verb == "status":
        cmd_status(store)
    elif verb == "compact":
        cmd_compact(store, rest[0])
    elif verb == "vacuum":
        keep = 0
        if "--keep-versions" in rest:
            keep = int(rest[rest.index("--keep-versions") + 1])
        cmd_vacuum(store, keep)
    elif verb == "zorder":
        cmd_zorder(store, rest[0], rest[1:])
    elif verb == "optimize":
        frac = 0.5
        if "--min-live" in rest:
            frac = float(rest[rest.index("--min-live") + 1])
            i = rest.index("--min-live")
            rest = rest[:i] + rest[i + 2 :]
        v = store.optimize(rest[0], min_live_fraction=frac)
        print(f"optimize {rest[0]}: " + ("nothing to do" if v is None else f"version {v}"))
    elif verb == "maintain":
        # one-shot fleet pass: fold DV/merge debt on EVERY file-level
        # table past the threshold (the cron body a deployment schedules
        # alongside its streaming sinks; the sinks' own auto_optimize
        # hook covers tables they write, this covers everything else)
        frac = 0.5
        if "--min-live" in rest:
            frac = float(rest[rest.index("--min-live") + 1])
        for name in sorted(store.current_manifest()["tables"]):
            v = store.optimize(name, min_live_fraction=frac)
            if v is not None:
                print(f"maintain {name}: folded -> version {v}")
    elif verb == "restore":
        v = store.restore(int(rest[0]), tables=rest[1:] or None)
        print(f"restored to v{rest[0]} as version {v}")
    else:
        print(__doc__)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
