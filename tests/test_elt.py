"""End-to-end ELT facades: the three reference-operator counterparts run
their full lifecycle (scan/query → transforms → sink / reconcile → load)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from salesforce_plugin_spark.operators.elt import (
    BulkQueryExtract,
    ObjectExtract,
    SchemaReconcileLoad,
)


@pytest.fixture(scope="module")
def views(spark):
    spark.createDataFrame(
        [
            (1, "Alice", "a@x.com", [(10, "open"), (11, "won")]),
            (2, "Bob", "b@x.com", []),
        ],
        "Id long, Name string, Email string, "
        "Opportunities array<struct<OppId:long, Stage:string>>",
    ).createOrReplaceTempView("lead")
    return spark


def read_parts(path):
    return "".join(
        open(p).read() for p in sorted(glob.glob(os.path.join(path, "part-*")))
    )


def test_bulk_query_extract(views, tmp_path):
    out = str(tmp_path / "bulk")
    BulkQueryExtract(
        soql="SELECT Id, Name FROM Lead WHERE Id > 0", dest=out
    ).execute(views)
    lines = [json.loads(x) for x in read_parts(out).strip().splitlines()]
    assert sorted(x["id"] for x in lines) == [1, 2]


def test_object_extract_full_scan_csv(views, tmp_path):
    out = str(tmp_path / "full")
    ObjectExtract(
        object_name="Lead", dest=out, fields=["Id", "Email"], fmt="csv"
    ).execute(views)
    text = read_parts(out)
    assert text.splitlines()[0] == "id,email"
    assert "a@x.com" in text


def test_object_extract_relationship_flatten(views, tmp_path):
    out = str(tmp_path / "rel")
    ObjectExtract(
        object_name="Lead",
        dest=out,
        relationship_object="Opportunities",
        fmt="ndjson",
    ).execute(views)
    lines = [json.loads(x) for x in read_parts(out).strip().splitlines()]
    # child rows replace parents; childless Bob contributes nothing
    assert sorted(x["oppid"] for x in lines) == [10, 11]


def test_object_extract_soql_passthrough(views, tmp_path):
    out = str(tmp_path / "soql")
    ObjectExtract(
        object_name="Lead",
        dest=out,
        query="SELECT Id FROM Lead WHERE Name LIKE 'a%'",
        fmt="ndjson",
    ).execute(views)
    lines = [json.loads(x) for x in read_parts(out).strip().splitlines()]
    assert [x["id"] for x in lines] == [1]


def test_object_extract_bad_fmt(views, tmp_path):
    with pytest.raises(ValueError, match="fmt must be"):
        ObjectExtract(object_name="Lead", dest="x", fmt="parquetish").execute(views)


def test_schema_reconcile_load_end_to_end(spark):
    describe = [
        {"name": "Id", "soapType": "tns:ID"},
        {"name": "Name", "soapType": "xsd:string", "length": 5},
        {"name": "Score", "soapType": "xsd:double"},
        {"name": "FullAddr", "soapType": "xsd:address"},
        {"name": "City", "soapType": "xsd:string", "length": 20,
         "compoundFieldName": "FullAddr"},
    ]
    spark.sql("DROP TABLE IF EXISTS t_elt_load")
    op = SchemaReconcileLoad(table="t_elt_load", describe_fields=describe)
    df = spark.createDataFrame(
        [("a1", "Toolongname", 1.5, "Springfield")],
        ["Id", "Name", "Score", "City"],
    )
    op.execute(spark, df)
    got = spark.table("t_elt_load").collect()[0]
    assert got.name == "Toolo"            # C7: truncated to declared length 5
    assert got.city == "Springfield"      # compound component kept
    cols = [c.name for c in spark.catalog.listColumns("t_elt_load")]
    assert "fulladdr" not in cols         # compound parent pruned

    # drift: second load with a new field → add-only ALTER + old rows null
    describe2 = describe + [{"name": "Tier", "soapType": "xsd:int"}]
    op2 = SchemaReconcileLoad(table="t_elt_load", describe_fields=describe2)
    df2 = spark.createDataFrame(
        [("a2", "ok", 2.0, "Shelbyville", 3)],
        ["Id", "Name", "Score", "City", "Tier"],
    )
    op2.execute(spark, df2)
    rows = {r.id: r for r in spark.table("t_elt_load").collect()}
    assert rows["a2"].tier == 3 and rows["a1"].tier is None
    spark.sql("DROP TABLE t_elt_load")


def test_bulk_extract_rejects_rest_only_soql(spark, tmp_path):
    """Bulk-API fidelity: the reference's Bulk path rejects aggregates,
    GROUP BY, and OFFSET server-side (salesforce_to_s3_operator.py:50);
    BulkQueryExtract raises the typed SoqlError at plan-build instead."""
    import pytest as _pytest

    from salesforce_plugin_spark.operators.elt import BulkQueryExtract
    from salesforce_plugin_spark.plans import SoqlError

    spark.createDataFrame(
        [(1, "F", 10.0)], ["o_orderkey", "o_orderstatus", "o_totalprice"]
    ).createOrReplaceTempView("bulkorders")

    for bad in (
        "SELECT COUNT() FROM bulkorders",
        "SELECT MAX(o_totalprice) FROM bulkorders",
        "SELECT o_orderstatus FROM bulkorders GROUP BY o_orderstatus",
        "SELECT o_orderkey FROM bulkorders LIMIT 5 OFFSET 5",
    ):
        with _pytest.raises(SoqlError):
            BulkQueryExtract(soql=bad, dest=str(tmp_path / "x")).execute(spark)

    # plain projections/filters still flow through to the ndjson sink
    ok = BulkQueryExtract(
        soql="SELECT o_orderkey FROM bulkorders WHERE o_totalprice > 5",
        dest=str(tmp_path / "ok"),
    )
    ok.execute(spark)
    assert spark.read.json(str(tmp_path / "ok")).count() == 1


def test_auth_kwargs_password_and_direct_modes():
    """E2: the reference hook's auth dispatch (salesforce_hook.py:47-62) —
    password mode (default) builds username/password/security_token/
    instance_url; direct mode maps host→instance_url, password→session_id."""
    import pytest

    from salesforce_plugin_spark.sources.salesforce_auth import (
        SalesforceConnection,
        auth_kwargs,
    )

    pw = SalesforceConnection(
        login="u@example.com",
        password="pw",
        host="https://x.my.salesforce.com",
        extras={"security_token": "tok"},
    )
    assert auth_kwargs(pw) == {
        "username": "u@example.com",
        "password": "pw",
        "security_token": "tok",
        "instance_url": "https://x.my.salesforce.com",
    }
    direct = SalesforceConnection(
        password="SESSION_ID",
        host="https://x.my.salesforce.com",
        extras={"auth_type": "direct"},
    )
    assert auth_kwargs(direct) == {
        "instance_url": "https://x.my.salesforce.com",
        "session_id": "SESSION_ID",
    }
    # token may legitimately be absent (hook passes None through)
    assert auth_kwargs(
        SalesforceConnection(login="u", password="p")
    )["security_token"] is None
    with pytest.raises(ValueError):
        auth_kwargs(SalesforceConnection(login="u"))  # no password
    with pytest.raises(ValueError):
        auth_kwargs(
            SalesforceConnection(extras={"auth_type": "direct"})
        )  # no host/session


def test_salesforce_session_memoizes_and_requires_factory():
    """E2/E3: get_conn memoization (salesforce_hook.py:44-46) — one
    factory call for many client() calls; reset() re-authenticates; no
    injected factory raises the documented seam error."""
    import pytest

    from salesforce_plugin_spark.sources.salesforce_auth import (
        SalesforceConnection,
        SalesforceSession,
    )

    calls = []

    def factory(**kwargs):
        calls.append(kwargs)
        return object()

    conn = SalesforceConnection(login="u", password="p")
    sess = SalesforceSession(conn, client_factory=factory)
    c1 = sess.client()
    assert sess.client() is c1 and len(calls) == 1
    sess.reset()
    assert sess.client() is not c1 and len(calls) == 2

    with pytest.raises(NotImplementedError):
        SalesforceSession(conn).client()
