"""PageRank throughput probe: synthetic power-law-ish digraph, timed
power-iteration rounds. Prints ONE JSON line.

Usage: python scripts/bench_graph.py [n_edges] [rounds]
"""

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from rustcheatersdatapipeline_spark.operators.graph import pagerank  # noqa: E402
from rustcheatersdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="bench-graph")
    spark.sparkContext.setLogLevel("ERROR")
    n_nodes = max(n_edges // 10, 1)
    # skewed out-degrees: src ~ id**2 folding concentrates mass on low ids
    edges = (
        spark.range(n_edges)
        .select(
            (F.pmod(F.col("id") * F.col("id"), F.lit(n_nodes))).alias("src"),
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    t0 = time.perf_counter()
    ranks = pagerank(edges, max_iter=rounds, tol=0.0)
    n_ranked = ranks.count()
    total = time.perf_counter() - t0
    top = ranks.orderBy(F.col("rank").desc()).limit(3).collect()
    print(
        json.dumps(
            {
                "metric": "pagerank_rounds",
                "n_edges": n_edges,
                "n_nodes_ranked": n_ranked,
                "rounds": rounds,
                "value": round(total, 2),
                "unit": "sec",
                "sec_per_round": round(total / rounds, 2),
                "top_rank": round(top[0]["rank"], 6) if top else None,
            }
        )
    )


if __name__ == "__main__":
    main()
