"""Property-based spot checks (SURVEY §5.5): random add-only schema
evolutions always converge and reconcile idempotently; serialization
round-trips preserve data; the winnowing match guarantee holds on random
token streams."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

import pyspark.sql.functions as F

from salesforce_plugin_spark.operators.schema_reconcile import (
    from_describe,
    reconcile_table,
)

SOAP_TYPES = ["string", "boolean", "int", "double", "date", "dateTime",
              "email", "id", "picklist", "phone", "url", "textarea"]

field_st = st.builds(
    lambda name, typ, length: {
        "name": name,
        "soapType": f"xsd:{typ}",
        "length": length,
    },
    name=st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    typ=st.sampled_from(SOAP_TYPES),
    length=st.integers(min_value=1, max_value=70000),
)


@st.composite
def evolutions(draw):
    """An add-only evolution: a base field list plus 1-2 growth steps that
    only append new field names (the reference's drift model — columns are
    never dropped or retyped, salesforce_schema_to_redshift_operator.py:130-151)."""
    base = draw(
        st.lists(field_st, min_size=1, max_size=4, unique_by=lambda f: f["name"])
    )
    steps = [base]
    for _ in range(draw(st.integers(min_value=1, max_value=2))):
        prev = steps[-1]
        seen = {f["name"] for f in prev}
        extra = draw(
            st.lists(
                field_st.filter(lambda f: f["name"] not in seen),
                min_size=0,
                max_size=2,
                unique_by=lambda f: f["name"],
            )
        )
        steps.append(prev + extra)
    return steps


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(steps=evolutions())
def test_drift_reconciliation_converges(spark, steps):
    """Every add-only evolution converges: after reconciling each step, a
    final re-reconcile is a no-op, and total DDL is exactly 1 CREATE plus
    one ALTER per field added after the base step (B6 emits one statement
    per column, reference :130-151)."""
    spark.sql("DROP TABLE IF EXISTS t_prop_drift")
    n_ddl = 0
    for step in steps:
        ddl = reconcile_table(spark, "t_prop_drift", from_describe(step))
        n_ddl += len(ddl)
    assert reconcile_table(spark, "t_prop_drift", from_describe(steps[-1])) == []
    assert n_ddl == 1 + (len(steps[-1]) - len(steps[0]))
    spark.sql("DROP TABLE t_prop_drift")


row_st = st.tuples(
    st.integers(min_value=-2**31, max_value=2**31),
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "Zs")
        ),
        max_size=24,
    ),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    ),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row_st, min_size=1, max_size=8))
def test_ndjson_roundtrip(spark, rows, tmp_path_factory):
    """df → ndjson → read-back preserves every value (A13: Spark JSON is
    ndjson; doubles survive via full-precision encoding)."""
    from salesforce_plugin_spark.sources.io import write_ndjson

    out = str(tmp_path_factory.mktemp("prop_ndjson"))
    df = spark.createDataFrame(rows, "k long, s string, v double")
    write_ndjson(df, out)
    back = spark.read.schema("k long, s string, v double").json(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    shared=st.lists(st.sampled_from("abcdefg"), min_size=6, max_size=10),
    pre_a=st.lists(st.sampled_from("hijklmn"), max_size=6),
    pre_b=st.lists(st.sampled_from("opqrstu"), max_size=6),
)
def test_winnow_guarantee_property(spark, shared, pre_a, pre_b):
    """Winnowing guarantee on random token streams: any two documents
    sharing a ≥ w+k-1 = 6 token run share at least one fingerprint."""
    from salesforce_plugin_spark.functions.dedup import winnow_fingerprints

    doc_a = " ".join(pre_a + shared)
    doc_b = " ".join(pre_b + shared)
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)], ["id", "t"])
    fps = winnow_fingerprints(df, "id", "t", k=3, w=4).collect()
    a = {r.fp for r in fps if r.id == 1}
    b = {r.fp for r in fps if r.id == 2}
    assert a & b
