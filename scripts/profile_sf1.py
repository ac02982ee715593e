"""Decompose sf1.0 straggler wall time into scheduling overhead vs
shuffle vs compute (VERDICT r7 #2), from the Spark UI REST API.

For each query: run once warm, tag its jobs with a job group, then pull
every stage of those jobs from ``/api/v1/applications/<id>/stages`` and
report:

- wall:         end-to-end wall clock of the noop-sink run
- task_time:    sum of task executorRunTime across all stages (ms→s)
- ideal:        task_time / defaultParallelism — the compute floor with perfect overlap
- overhead:     wall - ideal — scheduling + stage-barrier + driver cost
- tasks/stages: task count (the per-task fixed cost multiplier)
- shuffle MB:   total shuffle write across stages

Usage:
    python scripts/profile_sf1.py [sf_dir] [q_name ...]
(default dir .scratch/sf1.0; default queries = the sf1.0 stragglers)

Optionally set PROFILE_CONF="k=v,k=v" to apply runtime confs before the
timed run (e.g. the AQE coalescing experiment).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from salesforce_plugin_spark.conformance import QUERIES  # noqa: E402
from salesforce_plugin_spark.session import get_spark  # noqa: E402

STRAGGLERS = [
    "q_embed_topk",
    "q_tpch_q13",
    "q_tpch_q8",
    "q_multimodal_bytes",
    "q_event_window",
    "q_agg_count_distinct",
    "q_agg_cube",
    "q_tpch_q17",
    "q_agg_groupby",
    "q_tpch_q9",
    # heavy controls: compute-bound queries that must NOT regress when
    # experimenting with coalescing confs
    "q_near_dedup",
    "q_tfidf",
    "q_contamination",
    "q_tpch_q21",
]


def rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = ".scratch/sf1.0"
    names = []
    for a in sys.argv[1:]:
        if a.startswith("q_"):
            names.append(a)
        else:
            sf_dir = a
    probe = names or STRAGGLERS

    spark = get_spark("profile-sf1", extra_conf={"spark.ui.enabled": "true"})
    # getOrCreate silently ignores extra_conf when a session already
    # exists in this process — then there is no UI to poll and rest()
    # would die with an opaque AttributeError on uiWebUrl
    assert spark.sparkContext.uiWebUrl is not None, (
        "Spark UI is disabled: a pre-existing SparkSession in this "
        "process swallowed spark.ui.enabled=true - run profile_sf1.py "
        "in a fresh python process"
    )
    n_cores = spark.sparkContext.defaultParallelism
    for k_v in filter(None, os.environ.get("PROFILE_CONF", "").split(",")):
        k, v = k_v.split("=", 1)
        spark.conf.set(k, v)

    # warm twice (codegen + AQE stats + file listing)
    for name in probe:
        for _ in range(2):
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    print("| query | wall s | task_time s | ideal s | overhead s | stages | tasks | shuffle MB |")
    print("|---|---|---|---|---|---|---|---|")
    rows = []
    for name in probe:
        sc = spark.sparkContext
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")

        jobs = [j for j in rest(spark, "/jobs") if j.get("jobGroup") == group]
        stage_ids = {s for j in jobs for s in j.get("stageIds", [])}
        task_ms = run_ms = 0
        n_tasks = n_stages = 0
        shuffle_b = 0
        for s in rest(spark, "/stages?status=complete"):
            if s["stageId"] in stage_ids:
                n_stages += 1
                n_tasks += s["numCompleteTasks"]
                run_ms += s["executorRunTime"]
                shuffle_b += s["shuffleWriteBytes"]
        task_time = run_ms / 1000.0
        ideal = task_time / n_cores
        rows.append(
            {
                "query": name,
                "wall_s": round(wall, 3),
                "task_time_s": round(task_time, 3),
                "ideal_s": round(ideal, 3),
                "overhead_s": round(wall - ideal, 3),
                "stages": n_stages,
                "tasks": n_tasks,
                "shuffle_mb": round(shuffle_b / 1e6, 2),
            }
        )
        r = rows[-1]
        print(
            f"| {name} | {r['wall_s']} | {r['task_time_s']} | {r['ideal_s']} "
            f"| {r['overhead_s']} | {n_stages} | {n_tasks} | {r['shuffle_mb']} |"
        )
    print()
    print(json.dumps({"sf_dir": sf_dir, "rows": rows,
                      "conf": os.environ.get("PROFILE_CONF", "")}))


if __name__ == "__main__":
    main()
