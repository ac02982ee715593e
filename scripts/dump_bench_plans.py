"""Dump the FULL ``explain("formatted")`` output for every bench query
(headline + cohort2) to per-query files — the before/after evidence the
optimization rounds commit under ``plans/r11/``.

Usage:
    python scripts/dump_bench_plans.py <out_dir> <suffix> [sf_dir] [name ...]

e.g. ``python scripts/dump_bench_plans.py plans/r11 before`` writes
``plans/r11/q_tpch_q3_before.txt`` etc. for all 48 bench queries over
the default sf0.1 fixtures. Passing names limits the dump to those.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import COHORT2, HEADLINE  # noqa: E402
from salesforce_plugin_spark.conformance import QUERIES  # noqa: E402
from salesforce_plugin_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or (HEADLINE + COHORT2)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump-bench")
    for name in names:
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                QUERIES[name](spark, sf_dir).explain("formatted")
        except Exception as e:  # noqa: BLE001 — record the failure as evidence
            buf.write(f"\nEXPLAIN FAILED: {e}\n")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} @ {sf_dir} ==\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
