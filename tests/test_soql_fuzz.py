"""Property-based SOQL front-door robustness (SURVEY §5.5): generated
queries either lower to a runnable plan or raise SoqlError — never any
other exception, and never a silently wrong shape."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from salesforce_plugin_spark.plans import SoqlError, soql_to_df

FIELDS = ["id", "name", "amount", "ts"]
LITS = ["1", "2.5", "'x'", "TRUE", "NULL", "2020-01-02", "LAST_N_DAYS:7",
        "THIS_MONTH", "TODAY", "LAST_N_WEEKS:2", "N_DAYS_AGO:3",
        "THIS_QUARTER", "NEXT_90_DAYS", "LAST_N_YEARS:1"]
OPS = ["=", "!=", "<", "<=", ">", ">="]


@pytest.fixture(scope="module")
def base(spark):
    import datetime as dt

    spark.createDataFrame(
        [
            (1, "a", 1.0, dt.datetime(2024, 1, 10)),
            (2, "b", None, dt.datetime(2025, 6, 1)),
        ],
        ["id", "name", "amount", "ts"],
    ).createOrReplaceTempView("fuzz_t")
    return spark


pred = st.builds(
    lambda f, o, v: f"{f} {o} {v}",
    st.sampled_from(FIELDS),
    st.sampled_from(OPS),
    st.sampled_from(LITS),
)
where = st.one_of(
    pred,
    st.builds(lambda a, b: f"{a} AND {b}", pred, pred),
    st.builds(lambda a, b: f"({a}) OR NOT ({b})", pred, pred),
    st.builds(lambda f: f"{f} IN (1, 2, 3)", st.sampled_from(["id", "amount"])),
    st.builds(lambda: "name LIKE '%a%'"),
)
query = st.builds(
    lambda fs, w, sec, lim, trail: (
        f"SELECT {', '.join(fs)} FROM fuzz_t"
        + (f" WHERE {w}" if w else "")
        + (" WITH SECURITY_ENFORCED" if sec and w else "")
        + f" ORDER BY {fs[0]} LIMIT {lim}"
        + trail
    ),
    st.lists(st.sampled_from(FIELDS), min_size=1, max_size=3, unique=True),
    st.one_of(st.none(), where),
    st.booleans(),
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["", " FOR VIEW", " FOR REFERENCE", " FOR UPDATE"]),
)


@given(q=query)
@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
def test_generated_soql_lowers_and_runs(base, q):
    """Every generated query either runs (bounded by its LIMIT) or is
    rejected at plan-build time with SoqlError (type-mismatched comparisons
    — SOQL MALFORMED_QUERY semantics). Never an engine runtime error."""
    try:
        df = soql_to_df(base, q)
    except SoqlError:
        return  # typed rejection is a valid outcome (e.g. id = 'x')
    rows = df.collect()
    assert len(rows) <= 5


agg_fn = st.sampled_from(["COUNT()", "SUM(amount)", "AVG(amount)",
                          "MIN(id)", "MAX(id)", "COUNT_DISTINCT(name)"])
grouped_query = st.builds(
    lambda key, fns, w, having: (
        f"SELECT {key}, " + ", ".join(f"{f} a{i}" for i, f in enumerate(fns))
        + " FROM fuzz_t"
        + (f" WHERE {w}" if w else "")
        + f" GROUP BY {key}"
        + (" HAVING COUNT() >= 0" if having else "")
    ),
    st.sampled_from(["id", "name", "amount", "CALENDAR_YEAR(ts)",
                     "FISCAL_QUARTER(ts)", "WEEK_IN_YEAR(ts)", "DAY_ONLY(ts)"]),
    st.lists(agg_fn, min_size=1, max_size=3, unique=True),
    st.one_of(st.none(), pred),
    st.booleans(),
)


@given(q=grouped_query)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_generated_grouped_soql(base, q):
    try:
        df = soql_to_df(base, q)
    except SoqlError:
        return
    rows = df.collect()
    assert len(rows) <= 4  # at most one group per distinct key value


@given(s=st.text(max_size=40))
@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
def test_arbitrary_text_never_raises_foreign_errors(base, s):
    try:
        soql_to_df(base, s)
    except SoqlError:
        pass  # the contract: parse/lowering failures are always SoqlError
    except Exception as e:  # noqa: BLE001
        # analysis errors from Spark (unknown table/column) are acceptable
        # only for syntactically-valid queries; random text must not get
        # that far often — but if it does, it must be an AnalysisException
        from pyspark.errors import AnalysisException

        assert isinstance(e, AnalysisException), f"foreign error for {s!r}: {e!r}"
