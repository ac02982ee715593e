"""Derive the sf1.0 Spark-vs-DuckDB comparison table FROM a committed
bench artifact, so round-log prose can never drift from the evidence
(VERDICT r7 #1: ROUND7.md claimed 13/36 within 2x while BENCH_sf1_r7.json
supported 4/36 — prose computed from an uncommitted run).

Usage:
    python scripts/sf1_report.py BENCH_sf1_quiet_r8.json [BENCH_r06.json]

Prints a markdown table of per-query spark seconds, duckdb seconds and
the spark/duck ratio, then the derived headline counts:
  - N within 2x of DuckDB (ratio <= 2.0)
  - N beating DuckDB outright (ratio < 1.0)
  - aggregate ratio (sum spark / sum duck over co-measured queries)
If a second artifact (an sf0.1 bench) is given, also prints the 10x
growth factor per query and flags any super-linear query (growth > 10x).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> None:
    art = load(sys.argv[1])
    base = load(sys.argv[2]) if len(sys.argv) > 2 else None

    spark = art["queries"]
    duck = art.get("duckdb_oracle", {}).get("queries", {})
    base_q = base["queries"] if base else {}

    rows = []
    for name, s in spark.items():
        d = duck.get(name)
        ratio = (s / d) if d else None
        growth = (s / base_q[name]) if base_q.get(name) else None
        rows.append((name, s, d, ratio, growth))
    rows.sort(key=lambda r: -(r[3] or 0))

    hdr = "| query | spark s | duck s | spark/duck |"
    sep = "|---|---|---|---|"
    if base:
        hdr += " growth vs sf0.1 |"
        sep += "---|"
    print(hdr)
    print(sep)
    for name, s, d, ratio, growth in rows:
        line = f"| {name} | {s:.3f} | " + (
            f"{d:.3f} | {ratio:.2f}x |" if d else "— | — |"
        )
        if base:
            line += f" {growth:.2f}x |" if growth else " — |"
        print(line)

    measured = [r for r in rows if r[3] is not None]
    within2 = [r for r in measured if r[3] <= 2.0]
    beat = [r for r in measured if r[3] < 1.0]
    s_tot = sum(r[1] for r in measured)
    d_tot = sum(r[2] for r in measured)
    print()
    print(f"co-measured queries: {len(measured)} / {len(rows)}")
    print(f"within 2x of DuckDB: {len(within2)} / {len(measured)}"
          f" ({', '.join(r[0] for r in within2)})")
    print(f"beat DuckDB outright: {len(beat)} / {len(measured)}"
          f" ({', '.join(r[0] for r in beat)})")
    print(f"aggregate spark/duck: {s_tot:.2f} / {d_tot:.2f}"
          f" = {s_tot / d_tot:.2f}x")
    if base:
        growths = [r[4] for r in rows if r[4] is not None]
        worst = max(rows, key=lambda r: r[4] or 0)
        lin = [r for r in rows if (r[4] or 0) > 10.0]
        import statistics
        print(f"growth at 10x data: median {statistics.median(growths):.2f}x,"
              f" worst {worst[0]} {worst[4]:.2f}x;"
              f" super-linear (>10x): {len(lin)}"
              f"{' (' + ', '.join(r[0] for r in lin) + ')' if lin else ''}")
    la = art.get("loadavg_before"), art.get("loadavg_after")
    print(f"loadavg before/after: {la[0]} / {la[1]}")


if __name__ == "__main__":
    main()
