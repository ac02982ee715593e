"""Per-job / per-stage drill-down for one query: list every job and stage
the query runs (name, tasks, executorRunTime, shuffle bytes) so the
barrier-overhead decomposition in profile_sf1.py can be attributed to
specific operators. Usage:

    python scripts/stage_drill.py <sf_dir> <q_name> [warm_runs=2]
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


def rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("stage-drill", extra_conf={"spark.ui.enabled": "true"})
    assert spark.sparkContext.uiWebUrl is not None
    for _ in range(warm):
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    sc = spark.sparkContext
    group = f"drill-{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setJobGroup("", "")

    jobs = [j for j in rest(spark, "/jobs") if j.get("jobGroup") == group]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in rest(spark, "/stages?status=complete")}
    print(f"query={name} wall={wall:.3f}s jobs={len(jobs)}")
    for j in jobs:
        sids = sorted(j.get("stageIds", []))
        sub = j.get("submissionTime", "")[-12:]
        done = j.get("completionTime", "")[-12:]
        print(f"job {j['jobId']:4d}  {sub} -> {done}  "
              f"[{j.get('name','')[:70]}]")
        for sid in sids:
            s = stages.get(sid)
            if not s:
                continue
            print(
                f"    stage {sid:4d} tasks={s['numCompleteTasks']:3d} "
                f"run={s['executorRunTime']/1000:7.3f}s "
                f"shW={s['shuffleWriteBytes']/1e6:7.2f}MB "
                f"{s['name'][:60]}"
            )


if __name__ == "__main__":
    main()
