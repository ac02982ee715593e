"""Dedicated 100× probe for the round-7 density hierarchy (VERDICT r7 #3).

The generic probe replicates fixtures verbatim (only join keys shift),
so at 100× every embedding has 100 exact twins and the fixture-loose
ladder (cos_ppm 260k/220k/180k) yields an ε-graph with ~10⁴ edges per
original pair — the answer itself grows quadratically in duplicate
multiplicity (the round-7 `_dbscan_close` finding; same reason the r7
q_dbscan_clusters probe ran dedicated at ε=0.9). This probe follows
that precedent: a density-appropriate ladder (cos_ppm 940k/920k/900k)
over 1× vs 100× embeddings, timing dbscan_hierarchy and dbscan_tree.

Usage: python scripts/probe_dbscan_dense.py [scaled_dir]
(default .scratch/facts100x — reuses the dir if the generic probe
already built it, else builds it)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe import build_scaled_dir  # noqa: E402
from salesforce_plugin_spark.session import get_spark  # noqa: E402
from salesforce_plugin_spark.sources.catalog import load_table  # noqa: E402
from salesforce_plugin_spark.functions.vector import (  # noqa: E402
    dbscan_hierarchy,
    dbscan_tree,
)

LADDER = [940000, 920000, 900000]
MIN_PTS = 3


def timed(fn, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scaled = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".scratch", "facts100x"
    )
    if not os.path.isdir(os.path.join(scaled, "embeddings.parquet")):
        print(f"building {scaled} ...")
        build_scaled_dir("/root/testdata/sf0.1", scaled)

    spark = get_spark("probe-dbscan-dense")

    def hier(d):
        e = load_table(spark, d, "embeddings")
        return dbscan_hierarchy(
            e, "vec_id", "embedding", LADDER, min_pts=MIN_PTS
        )

    def tree(d):
        return dbscan_tree(hier(d), "vec_id")

    print(f"ladder={LADDER} min_pts={MIN_PTS}")
    print("| query | 1x | 100x | ratio |")
    print("|---|---|---|---|")
    for name, fn in (("dbscan_hierarchy", hier), ("dbscan_tree", tree)):
        # warm both shapes at sf0.001
        try:
            fn("/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        t1 = timed(lambda: fn("/root/testdata/sf0.1"))
        t100 = timed(lambda: fn(scaled))
        print(f"| {name} | {t1:.2f} s | {t100:.2f} s | {t100 / t1:.1f}x |")


if __name__ == "__main__":
    main()
