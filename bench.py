"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced end-to-end with a ``noop`` write (full plan executes
on the executors, nothing materializes on the driver — the honest analog
of writing to object storage at scale). Wall time per query includes
planning + execution, excluding session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from salesforce_plugin_spark.conformance import QUERIES
from salesforce_plugin_spark.session import get_spark

#: The headline set: one per operator family, weighted toward the plans
#: whose shape matters at scale (shuffle-heavy aggs/joins, window state,
#: LSH dedup, text/vector pipelines).
HEADLINE = [
    "q_agg_groupby",        # partial-agg hash groupBy (TPC-H Q1 shape)
    "q_parent_lookup_join", # broadcast fact-dim join
    "q_child_flatten_join", # nest + explode relationship round-trip
    "q_agg_cube",           # Expand-based multi-grouping
    "q_agg_count_distinct", # exact distinct (shuffle on distinct keys)
    "q_dedup_exact",        # window row_number dedup
    "q_event_window",       # tumbling event-time window
    "q_event_session",      # session windows (stateful gap merge)
    "q_text_tokens",        # regex-heavy codegen text pipeline
    "q_tfidf",              # explode→two-level agg→broadcast→window top-k
    "q_contamination",      # broadcast shingle-set probe (no corpus shuffle)
    "q_near_dedup",         # minhash + LSH banding + self-join
    "q_embed_topk",         # brute-force cosine top-k
    "q_multimodal_bytes",   # Arrow-batched mapInPandas binary path
    "q_asof_join",          # union + carry-forward window as-of join
    "q_range_join",         # bucketed point-in-interval join (no cartesian)
    "q_training_corpus",    # full clean→dedup→filter→split pipeline
    "q_training_sequences", # …extended through chunk→pack sequences
    "q_soql_relationship",  # SOQL front door: chained broadcast lookups
    "q_tpch_q3",            # segment-filtered 3-way join top-k
    "q_tpch_q5",            # 6-table star join revenue rollup
    "q_tpch_q10",           # returned-item revenue, wide-key group + top-k
    "q_tpch_q18",           # HAVING-derived key set semi-joined onto facts
    "q_tpch_q6",            # all-predicates-pushed single-scan forecast
    "q_tpch_q7",            # dual-nation broadcast chain + disjunctive pair
    "q_tpch_q14",           # conditional-agg promo share over fact-dim join
    "q_tpch_q19",           # per-side-factored OR-of-ANDs band join
    "q_tpch_q4",            # EXISTS → semi join with non-equi residual
    "q_tpch_q13",           # outer-join count distribution (two-level agg)
    "q_tpch_q17",           # correlated AVG → window decorrelation
    "q_tpch_q21",           # EXISTS+NOT-EXISTS → grouped-count decorrelation
    "q_tpch_q8",            # 6-table market-share conditional ratio
    "q_tpch_q16",           # count-distinct per class + blacklist anti-join
    "q_tpch_q20",           # rollup → window fraction → distinct semi-join
    "q_tpch_q2",            # per-part argmin supplier (window, single pass)
    "q_tpch_q9",            # 5-table profit rollup, fact+dim amount expr
]

#: Second measured cohort (round 11, VERDICT r10 #5): the headline set
#: above is FROZEN for round-over-round comparability, but the registry
#: grew past it — this cohort covers the newest heavy tiers (real PNG
#: decode incl. 16-bit, DBSCAN hierarchy, Kneser-Ney, distillation,
#: semantic dedup, IVF ANN, the curation capstone). Same protocol
#: (shared warm-up pass, interleaved Spark/DuckDB), min-of-2 instead of
#: min-of-3 to bound added wall time; reported under separate keys so
#: headline_total stays comparable to BENCH_r01-r10.
COHORT2 = [
    "q_png_histogram",      # real PNG decode → pixel histogram (Arrow)
    "q_png16_stats",        # 16-bit PNG tier: u16 lanes, exact moments
    "q_dbscan_clusters",    # density clustering over embeddings
    "q_kneser_ney",         # KN-smoothed LM estimation
    "q_distill_quality",    # cross-encoder distillation seam
    "q_semantic_dedup",     # k-means blocking → cosine → CC
    "q_cusum",              # per-key CUSUM windows (batch face)
    "q_global_line_dedup",  # corpus-global exact line dedup
    "q_embed_ivf",          # IVF ANN (centroid route + probe)
    "q_curation_capstone",  # multi-stage curation pipeline
    "q_louvain_step",       # modularity-gain graph step
    "q_bpe_step",           # BPE merge-table step
    # r12 addition (VERDICT r11 #6): the star-CC face was in no bench
    # cohort; added so the driver measures its single-job fixpoint loop.
    "q_dedup_components_star",
]


def main() -> None:
    # Bench timings must time the declared queries themselves, not the
    # round-12 in-entry oracle_cross_check diagnostics (which replay an
    # entry's DuckDB oracle to make driver-host divergences speak in
    # ``err``): flag the process as a bench run so those probes no-op.
    os.environ["SPARK_GRAFT_BENCH"] = "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # SPARK_GRAFT_COHORT2=0 disables the additive cohort — used by the
    # sf1.0 quiet-gate runs so the headline warm/warm protocol stays
    # byte-identical to rounds 8-10 (the gate ratio is headline-only;
    # cohort2 at sf1.0 is measured separately and documented).
    cohort2 = [] if os.environ.get(
        "SPARK_GRAFT_COHORT2", "1"
    ) == "0" else COHORT2
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # External-quietness evidence: sampled BEFORE the session and warm-up
    # pass, so it measures the host, not the bench itself (loadavg_before
    # is taken after warm-up and mostly reflects our own warm-up load —
    # the r7 "quiet" debate was unresolvable because only post-warm-up
    # load was recorded).
    load_start = _loadavg()
    spark = get_spark("bench")
    # Warm-up: one full untimed pass over the headline set AT THE MEASURED
    # SCALE. Whole-stage codegen compilation, JIT tiering, Arrow worker
    # start, file-listing caches and AQE stage stats are all one-time costs
    # a long-lived cluster amortizes to zero; measuring them as if they were
    # per-query throughput is what made round-2 numbers look 2-3× worse than
    # steady state (q_tpch_q18 recorded 3.3s cold vs ~1.0s warm). JMH
    # discipline: warm at the measured workload, then time steady state.
    # The DuckDB baseline below gets the same treatment (min over repeated
    # runs after its own first pass).
    for wname in HEADLINE + cohort2:
        try:
            QUERIES[wname](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # Same-box single-node columnar reference point for the BASELINE 2×
    # criterion. Committed measurement protocol (round 10 — VERDICT r9:
    # the 2× verdict must not depend on which engine's cache regime a
    # run happened to catch): BOTH engines get an untimed warm-up pass
    # at the measured scale, then the timed loop INTERLEAVES them per
    # query (Spark min-of-3 immediately followed by DuckDB min-of-3 on
    # the same query), so page-cache state and any host-load drift hit
    # both sides of every ratio equally. r8 recorded DuckDB fresh-boot
    # (14.91 s) and r9 recorded it warm (11.5 s) around an unchanged
    # Spark posture — that 30% denominator swing was protocol, not code.
    duck_con, duck_sqls, duck_sqls2 = _duckdb_connect(sf_dir, cohort2)
    for sql in list(duck_sqls.values()) + list(duck_sqls2.values()):
        try:  # DuckDB warm-up pass (both cohorts)
            duck_con.sql(sql).fetchall()
        except Exception:
            pass

    # Timed: three further executions per query, report the min — the
    # steady-state throughput the 100 TB posture cares about. (min-of-3:
    # a single GC pause or machine-load blip on a min-of-2 once recorded
    # a 5x outlier on the first timed query.)
    timings: dict[str, float] = {}
    duck_timings: dict[str, float] = {}
    query_load1: dict[str, float] = {}
    load_before = _loadavg()
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        sql = duck_sqls.get(name)
        if sql is not None:
            dbest = float("inf")
            try:
                for _ in range(3):
                    t0 = time.perf_counter()
                    duck_con.sql(sql).fetchall()
                    dbest = min(dbest, time.perf_counter() - t0)
                duck_timings[name] = round(dbest, 3)
            except Exception:
                pass  # baseline is informational; never fail the bench
        # 1-min load at measurement time: the bench itself drives load,
        # but a load1 far above SPARK_GRAFT_CPUS while a query ran flags
        # external contention — rounds 3 and 5 both recorded 2-4×
        # inflations that were host-load, not code; this makes that
        # diagnosis a recorded fact instead of a post-hoc argument
        query_load1[name] = round(_loadavg()[0], 1)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    # Cohort-2 timed pass: same interleave, min-of-2 (documented above).
    c2_timings: dict[str, float] = {}
    c2_duck: dict[str, float] = {}
    for name in cohort2:
        fn = QUERIES[name]
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            c2_timings[name] = round(best, 3)
        except Exception as e:  # cohort2 is additive; never fail the bench
            print(f"# cohort2 {name} FAILED: {e}", file=sys.stderr)
            continue
        sql = duck_sqls2.get(name)
        if duck_con is not None and sql is not None:
            dbest = float("inf")
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    duck_con.sql(sql).fetchall()
                    dbest = min(dbest, time.perf_counter() - t0)
                c2_duck[name] = round(dbest, 3)
            except Exception:
                pass
        print(f"# cohort2 {name}: {c2_timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    c2_total = round(sum(c2_timings.values()), 3)
    duck = {
        "total": round(sum(duck_timings.values()), 3),
        "queries": duck_timings,
        "protocol": "interleaved-warm-min3",
    } if duck_timings else {"error": "duckdb baseline unavailable"}
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "loadavg_start": load_start,
                "loadavg_before": load_before,
                "loadavg_after": _loadavg(),
                "query_load1": query_load1,
                "duckdb_oracle": duck,
                "cohort2_total": c2_total,
                "cohort2_queries": c2_timings,
                "cohort2_duckdb": c2_duck,
                "cohort2_duckdb_total": round(sum(c2_duck.values()), 3),
            }
        )
    )
    # The LAST stdout line is a compact contract-only object (metric/
    # value/unit/queries/sf + the DuckDB total) small enough to survive
    # the driver's 2,000-char tail capture intact — BENCH_r08.json's
    # "parsed": null happened because the full diagnostic line above
    # exceeds the tail and loses its head (including Spark's total).
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "duckdb_total": duck.get("total"),
                "cohort2_total": c2_total,
                "cohort2_duckdb_total": round(sum(c2_duck.values()), 3),
            },
            separators=(",", ":"),
        )
    )


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platform without getloadavg
        return []


def _duckdb_connect(sf_dir: str, cohort2=()):
    """(connection, {headline: SQL}, {cohort2: SQL}) for the
    interleaved baseline — (None, {}, {}) when DuckDB is unavailable
    (baseline is informational; never fail the bench)."""
    try:
        import duckdb

        from salesforce_plugin_spark.conformance import ORACLES
        from salesforce_plugin_spark.sources.catalog import TABLES

        con = duckdb.connect()
        con.execute("SET threads TO " + os.environ.get("SPARK_GRAFT_CPUS", "32"))
        for t in TABLES:
            path = f"{os.path.join(sf_dir, t)}.parquet"
            if os.path.isdir(path):  # scaled tiers: table = dir of files
                path = os.path.join(path, "*.parquet")
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con, {
            name: ORACLES[name] for name in HEADLINE if name in ORACLES
        }, {
            name: ORACLES[name] for name in cohort2 if name in ORACLES
        }
    except Exception:
        return None, {}, {}


if __name__ == "__main__":
    main()
