"""WCC@100M spread diagnosis (VERDICT r9 task 3): per-sample wall time
vs TASK CPU time, so host noise (wall varies, CPU flat) separates from
plan cost (CPU varies with wall).

Per run, the Spark UI REST API is polled for all stages submitted during
the run window and their executorCpuTime / executorRunTime are summed —
the task-CPU comparison the superstep-plan-traps discipline calls for.

Usage: python tools/diag_wcc.py [n_edges] [runs]   (default 100M, 3)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphchi_cpp_spark.graph import PropertyGraph, erdos_renyi
from graphchi_cpp_spark.session import get_spark


def _stages(ui: str) -> list[dict]:
    apps = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=30)
    )
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=60,
        )
    )


def _cpu_totals(stages: list[dict], after_ids: set[int]) -> dict:
    cpu_ns = run_ms = 0
    n = 0
    for st in stages:
        if st["stageId"] in after_ids:
            continue
        cpu_ns += st.get("executorCpuTime", 0)
        run_ms += st.get("executorRunTime", 0)
        n += 1
    return {
        "stages": n,
        "task_cpu_s": round(cpu_ns / 1e9, 1),
        "task_run_s": round(run_ms / 1e3, 1),
    }


def main() -> None:
    n_edges = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "diag-wcc",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    from graphchi_cpp_spark.algos.connected_components import connected_components

    n = max(1000, n_edges // 10)
    edges = erdos_renyi(spark, n, avg_degree=10, seed=42).localCheckpoint(
        eager=True
    )
    m = edges.count()
    g = PropertyGraph(edges)
    print(json.dumps({"n_edges": m}))

    import gc

    for i in range(runs):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        seen = {st["stageId"] for st in _stages(ui)}
        t0 = time.time()
        connected_components(g, max_iter=30).count()
        wall = round(time.time() - t0, 2)
        row = {"run": i, "wall_s": wall}
        row.update(_cpu_totals(_stages(ui), seen))
        row["edges_per_s"] = int(m / wall)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
