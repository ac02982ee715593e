"""Data-quality validation suite: single-pass expectation counts,
budget-gated raise, duplicate-key profiling, and the checkpointed
streaming parquet sink (restart resumes, no duplication)."""

from __future__ import annotations

import datetime as dt

import pytest

from salesforce_plugin_spark.operators.validate import (
    Expectation,
    uniqueness_report,
    validate,
    validate_or_raise,
)


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "hello world, long enough", "en", 10.0),
            (2, None, "en", -5.0),
            (3, "short", "xx", 2.0),
        ],
        "id long, text string, lang string, score double",
    )


def test_validate_counts_each_expectation(messy):
    row = validate(
        messy,
        [
            Expectation.not_null("text"),
            Expectation.min_length("text", 10),
            Expectation.one_of("lang", ["en", "es"]),
            Expectation.in_range("score", 0, 100),
        ],
    ).collect()[0]
    assert row.n_rows == 3
    assert row.viol_not_null_text == 1
    assert row.viol_min_length_text == 1  # null row doesn't count as short
    assert row.viol_one_of_lang == 1
    assert row.viol_in_range_score == 1


def test_validate_or_raise_names_failures(messy):
    with pytest.raises(ValueError, match="viol_not_null_text=1/3"):
        validate_or_raise(messy, [Expectation.not_null("text")])
    # within budget → returns the report
    report = validate_or_raise(
        messy, [Expectation.not_null("text")], max_violation_ratio=0.5
    )
    assert report["n_rows"] == 3


def test_uniqueness_report(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    row = uniqueness_report(df, ["k", "v"]).collect()[0]
    assert (row.n_keys, row.n_dup_keys, row.n_dup_rows) == (3, 1, 3)


def test_streaming_parquet_sink_checkpoint_resume(spark, tmp_path):
    """Restarting from the same checkpoint must not re-emit processed
    input (exactly-once file sink semantics)."""
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.streaming.windows import (
        run_to_parquet_sink,
        stream_events,
    )

    base = dt.datetime(2024, 5, 1)
    def write_batch(ids):
        rows = [
            (i, int((base + dt.timedelta(minutes=i)).timestamp() * 1e9),
             0, "e", float(i), "{}")
            for i in ids
        ]
        spark.createDataFrame(
            rows, "event_id long, ts long, user_id long, event_type string, "
                  "value double, props string"
        ).write.mode("append").parquet(str(tmp_path / "src"))

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    write_batch(range(5))
    run_to_parquet_sink(
        stream_events(spark, src).select("event_id", "ts", "value"), out, ckpt
    )
    assert spark.read.parquet(out).count() == 5

    # restart with the same checkpoint: old files skipped, new file picked up
    write_batch(range(5, 8))
    run_to_parquet_sink(
        stream_events(spark, src).select("event_id", "ts", "value"), out, ckpt
    )
    got = spark.read.parquet(out)
    assert got.count() == 8
    assert got.agg(F.countDistinct("event_id")).collect()[0][0] == 8


def test_approx_profile_within_error_bounds(spark):
    from salesforce_plugin_spark.operators.validate import approx_profile

    sf = "/root/testdata/sf0.01"
    if not __import__("os").path.isdir(sf):
        import pytest

        pytest.skip("fixtures not present")
    from salesforce_plugin_spark.sources.catalog import load_table

    o = load_table(spark, sf, "orders")
    prof = approx_profile(
        o, ["o_custkey", "o_orderkey"], ["o_totalprice"], rsd=0.02
    ).collect()[0]
    exact_cust = o.select("o_custkey").distinct().count()
    exact_orders = o.count()  # o_orderkey is unique
    # HLL++ guarantees rsd as a standard deviation; 5 sigma is a safe gate
    assert abs(prof.o_custkey_approx_distinct - exact_cust) <= 5 * 0.02 * exact_cust
    assert abs(prof.o_orderkey_approx_distinct - exact_orders) <= 5 * 0.02 * exact_orders
    q50, q95, q99 = prof.o_totalprice_q50_95_99
    # quantile sketch: rank error ⇒ value between neighboring true quantiles
    lo, hi = o.approxQuantile("o_totalprice", [0.45, 0.55], 0.001)
    assert lo <= q50 <= hi
    assert q50 < q95 < q99


# --- FK orphan audit ---

def test_fk_orphans_counts_rows_and_keys(spark):
    from salesforce_plugin_spark.operators.validate import fk_orphans

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_orphans(child, "fk", parent, "pk", "c->p").collect()[0]
    assert r.relationship == "c->p"
    assert r.n_child_rows == 6          # NULL fk excluded by contract
    assert r.n_child_keys == 3
    assert r.n_orphan_rows == 3 and r.n_orphan_keys == 1   # key 9


def test_fk_orphans_clean_relationship_is_zero(spark):
    from salesforce_plugin_spark.operators.validate import fk_orphans

    child = spark.createDataFrame([(i % 5,) for i in range(50)], "fk long")
    parent = spark.createDataFrame([(i,) for i in range(5)], "pk long")
    r = fk_orphans(child, "fk", parent, "pk", "ok").collect()[0]
    assert r.n_orphan_rows == 0 and r.n_orphan_keys == 0


def test_fd_violations_detects_and_stays_silent(spark):
    from salesforce_plugin_spark.operators.validate import fd_violations

    df = spark.createDataFrame(
        [("sku1", 10), ("sku1", 10), ("sku2", 20), ("sku2", 25), ("sku3", 30)],
        "sku string, price int",
    )
    out = fd_violations(df, ["sku"], "price").collect()
    assert len(out) == 1
    r = out[0]
    assert r.sku == "sku2" and r.n_rows == 2 and r.n_distinct == 2
    assert (r.rhs_min, r.rhs_max) == (20, 25)

    holds = df.filter("sku <> 'sku2'")
    assert fd_violations(holds, ["sku"], "price").count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fd_violations(df, [], "price")


# --- content manifest ---

def test_content_manifest_detects_any_cell_change(spark):
    from salesforce_plugin_spark.operators.merge import content_manifest

    a = spark.createDataFrame(
        [(i, f"v{i}", i * 10) for i in range(100)], "id long, s string, n long"
    )
    b = spark.createDataFrame(
        [(i, f"v{i}", i * 10 if i != 37 else 371) for i in range(100)],
        "id long, s string, n long",
    )
    ma = {r.shard: r for r in content_manifest(a, "id", ["id", "s", "n"], 8).collect()}
    mb = {r.shard: r for r in content_manifest(b, "id", ["id", "s", "n"], 8).collect()}
    diff = [s for s in ma if (ma[s].digest_xor, ma[s].digest_sum)
            != (mb[s].digest_xor, mb[s].digest_sum)]
    assert len(diff) == 1  # exactly the shard holding id=37
    # identical content, different layout -> identical manifest
    mc = {r.shard: r for r in content_manifest(
        a.repartition(13), "id", ["id", "s", "n"], 8).collect()}
    assert all(
        (ma[s].n_rows, ma[s].digest_xor, ma[s].digest_sum)
        == (mc[s].n_rows, mc[s].digest_xor, mc[s].digest_sum)
        for s in ma
    )


def test_content_manifest_null_vs_empty_differ(spark):
    from salesforce_plugin_spark.operators.merge import content_manifest

    a = spark.createDataFrame([(1, None)], "id long, s string")
    b = spark.createDataFrame([(1, "")], "id long, s string")
    da = content_manifest(a, "id", ["s"], 1).collect()[0]
    db = content_manifest(b, "id", ["s"], 1).collect()[0]
    assert (da.digest_xor, da.digest_sum) != (db.digest_xor, db.digest_sum)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        content_manifest(a, "id", ["s"], 0)
