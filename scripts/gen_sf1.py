"""Build the local sf1.0 bench tier: ``.scratch/sf1.0`` with FACT tables
at 10× the driver's sf0.1 fixtures (≈6M lineitem rows) and dimensions at
1× — the key-shifted replication from ``scale_probe.build_scaled_dir``
(fact-fact join keys shift by i·10⁹ per copy so join structure is
preserved: 10× rows, each matching exactly as at 1×; dimension FKs stay
on the stable entity base, which is what real data growth looks like).

Why this tier exists (VERDICT r6 #2): at sf0.1 every Spark/DuckDB ratio
is dominated by Spark's ~0.15-0.2 s fixed per-query job overhead, so the
bench measured JVM startup, not plan quality. At sf1.0 the work term is
10× while the overhead term is constant, so per-query ratios and the
linearity check (no query > 2× its linear extrapolation from sf0.1)
become meaningful.

Usage:
    python scripts/gen_sf1.py                # build .scratch/sf1.0
    SPARK_GRAFT_SF_DIR=.scratch/sf1.0 python bench.py | head -1 > BENCH_sf1_rN.json
(bench.py prints TWO stdout lines since round 9 — the full diagnostic
object first, then a compact contract-only line for tail captures;
``head -1`` keeps the diagnostic object as the committed artifact, which
is the shape of every BENCH_sf1_quiet_r*.json in the repo root.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe import build_scaled_dir  # noqa: E402


def main() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, ".scratch", "sf1.0")
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    print(f"building {out} from {src} (facts x10, dims x1) ...")
    build_scaled_dir(src, out)
    for t in sorted(os.listdir(out)):
        d = os.path.join(out, t)
        n = len(os.listdir(d))
        mb = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        ) / 1e6
        print(f"  {t}: {n} file(s), {mb:.1f} MB")
    return out


if __name__ == "__main__":
    main()
