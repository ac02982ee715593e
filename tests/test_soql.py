"""SOQL front door: string queries lower to DataFrame plans with SOQL
semantics (case-insensitive LIKE, = NULL as null test, semi/anti subqueries,
aggregates, rollup/cube, order/limit/offset)."""

from __future__ import annotations

import pytest

from salesforce_plugin_spark.plans import SoqlError, soql_to_df


@pytest.fixture(scope="module")
def tables(spark):
    spark.createDataFrame(
        [
            (1, "Alice", "NY", 100.0, 1),
            (2, "bob", "CA", 50.0, 1),
            (3, "Carol", None, 75.0, 2),
            (4, "dave", "NY", None, 2),
        ],
        ["id", "name", "state", "amount", "grp"],
    ).createOrReplaceTempView("account")
    spark.createDataFrame(
        [(10, 1), (11, 1), (12, 3)], ["oid", "account_id"]
    ).createOrReplaceTempView("orders_t")
    return spark


def run(spark, q):
    return soql_to_df(spark, q)


def test_projection_and_filter(tables):
    out = run(tables, "SELECT Id, Name FROM Account WHERE amount > 60").collect()
    assert sorted(r.id for r in out) == [1, 3]
    assert run(tables, "SELECT id FROM account").count() == 4


def test_like_is_case_insensitive(tables):
    out = run(tables, "SELECT id FROM account WHERE name LIKE 'a%'").collect()
    assert sorted(r.id for r in out) == [1]  # Alice matches a% case-insensitively
    out2 = run(tables, "SELECT id FROM account WHERE name LIKE '%O%'").collect()
    assert sorted(r.id for r in out2) == [2, 3]  # bob, Carol


def test_null_equality_is_null_test(tables):
    assert [r.id for r in run(tables, "SELECT id FROM account WHERE state = NULL").collect()] == [3]
    out = run(tables, "SELECT id FROM account WHERE amount != NULL ORDER BY id").collect()
    assert [r.id for r in out] == [1, 2, 3]


def test_in_list_and_not_in(tables):
    assert sorted(
        r.id for r in run(tables, "SELECT id FROM account WHERE state IN ('NY')").collect()
    ) == [1, 4]
    assert sorted(
        r.id for r in run(
            tables, "SELECT id FROM account WHERE id NOT IN (1, 2, 3)"
        ).collect()
    ) == [4]


def test_boolean_composition(tables):
    q = "SELECT id FROM account WHERE (state = 'NY' OR state = 'CA') AND NOT amount < 60"
    assert sorted(r.id for r in run(tables, q).collect()) == [1]


def test_semi_and_anti_subquery(tables):
    semi = run(
        tables,
        "SELECT id FROM account WHERE Id IN (SELECT account_id FROM orders_t)",
    ).collect()
    assert sorted(r.id for r in semi) == [1, 3]
    anti = run(
        tables,
        "SELECT id FROM account WHERE Id NOT IN (SELECT account_id FROM orders_t)",
    ).collect()
    assert sorted(r.id for r in anti) == [2, 4]


def test_aggregates_global_and_grouped(tables):
    row = run(
        tables,
        "SELECT COUNT(), SUM(amount) total, COUNT_DISTINCT(state) nstates FROM account",
    ).collect()[0]
    assert row[0] == 4 and row.total == 225.0 and row.nstates == 2
    grouped = run(
        tables,
        "SELECT grp, COUNT(amount) n FROM account GROUP BY grp HAVING COUNT(amount) >= 2",
    ).collect()
    assert len(grouped) == 1 and grouped[0].grp == 1 and grouped[0].n == 2


def test_rollup(tables):
    out = run(
        tables, "SELECT grp, COUNT() n FROM account GROUP BY ROLLUP(grp)"
    ).collect()
    totals = {r.grp: r.n for r in out}
    assert totals[None] == 4 and totals[1] == 2 and totals[2] == 2


def test_order_limit_offset(tables):
    out = run(
        tables, "SELECT id FROM account ORDER BY amount DESC NULLS LAST LIMIT 2"
    ).collect()
    assert [r.id for r in out] == [1, 3]
    page = run(
        tables, "SELECT id FROM account ORDER BY id LIMIT 2 OFFSET 1"
    ).collect()
    assert [r.id for r in page] == [2, 3]
    # SOQL default sort: ASC NULLS FIRST
    first = run(tables, "SELECT id FROM account ORDER BY amount").collect()[0]
    assert first.id == 4


def test_date_function_group(tables, spark):
    spark.sql(
        "SELECT 1 AS k, TIMESTAMP '2020-05-01 10:00:00' AS ts "
        "UNION ALL SELECT 2, TIMESTAMP '2021-05-01 11:00:00'"
    ).createOrReplaceTempView("evts")
    out = run(
        spark,
        "SELECT CALENDAR_YEAR(ts) yr, COUNT() n FROM evts GROUP BY CALENDAR_YEAR(ts)",
    ).collect()
    assert {r.yr: r.n for r in out} == {2020: 1, 2021: 1}


@pytest.fixture(scope="module")
def rels():
    from salesforce_plugin_spark.plans import RelationshipRegistry

    return RelationshipRegistry(
        lookups={
            ("contact", "account"): ("account_t", "account_id", "aid"),
            ("account_t", "owner"): ("owner_t", "owner_id", "oid"),
        },
        children={("account_t", "contacts"): ("contact", "account_id", "aid")},
    )


@pytest.fixture(scope="module")
def rel_tables(spark):
    spark.createDataFrame(
        [(1, "c1", 10), (2, "c2", 10), (3, "c3", 20), (4, "c4", None)],
        "cid long, cname string, account_id long",
    ).createOrReplaceTempView("contact")
    spark.createDataFrame(
        [(10, "Acme", 100), (20, "Globex", 200)],
        "aid long, aname string, owner_id long",
    ).createOrReplaceTempView("account_t")
    spark.createDataFrame(
        [(100, "Pat"), (200, "Sam")], "oid long, oname string"
    ).createOrReplaceTempView("owner_t")
    return spark


def test_dot_path_lookup_join(rel_tables, rels):
    out = soql_to_df(
        rel_tables,
        "SELECT cid, account.aname FROM contact ORDER BY cid",
        relationships=rels,
    ).collect()
    assert [(r.cid, r.account_aname) for r in out] == [
        (1, "Acme"), (2, "Acme"), (3, "Globex"), (4, None),  # left join semantics
    ]


def test_two_level_dot_path(rel_tables, rels):
    out = soql_to_df(
        rel_tables,
        "SELECT cid, account.owner.oname who FROM contact WHERE cid <= 3 ORDER BY cid",
        relationships=rels,
    ).collect()
    assert [(r.cid, r.who) for r in out] == [(1, "Pat"), (2, "Pat"), (3, "Sam")]


def test_dot_path_in_where(rel_tables, rels):
    out = soql_to_df(
        rel_tables,
        "SELECT cid FROM contact WHERE account.aname = 'Acme' ORDER BY cid",
        relationships=rels,
    ).collect()
    assert [r.cid for r in out] == [1, 2]


def test_child_subselect_nests_arrays(rel_tables, rels):
    out = soql_to_df(
        rel_tables,
        "SELECT aid, (SELECT cid FROM Contacts WHERE cid != 2) kids "
        "FROM account_t ORDER BY aid",
        relationships=rels,
    ).collect()
    by_aid = {r.aid: r.kids for r in out}
    assert [k.cid for k in by_aid[10]] == [1]      # cid 2 filtered inside the sub
    assert [k.cid for k in by_aid[20]] == [3]


def test_unknown_relationship_is_typed_error(rel_tables, rels):
    with pytest.raises(SoqlError, match="unknown relationship"):
        soql_to_df(rel_tables, "SELECT bogus.x FROM contact", relationships=rels)
    with pytest.raises(SoqlError, match="unknown child relationship"):
        soql_to_df(
            rel_tables, "SELECT (SELECT cid FROM Nope) FROM account_t",
            relationships=rels,
        )


def test_parse_errors_are_descriptive(tables):
    with pytest.raises(SoqlError, match="expected"):
        run(tables, "SELECT FROM account")
    with pytest.raises(SoqlError, match="trailing"):
        run(tables, "SELECT id FROM account LIMIT 1 bogus extra")
    with pytest.raises(SoqlError, match="unexpected character"):
        run(tables, "SELECT id FROM account WHERE name ~ 'x'")


# ---------------------------------------------------------------------------
# D18 range literals / D19 extended date functions
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dated(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 12)),    # THIS_MONTH, LAST_WEEK-ish
        (2, dt.datetime(2024, 1, 14, 23)),   # day before this week (Sun)
        (3, dt.datetime(2024, 1, 15, 0)),    # Monday = start of THIS_WEEK
        (4, dt.datetime(2024, 1, 20, 9)),    # today
        (5, dt.datetime(2024, 1, 21, 0)),    # tomorrow
        (6, dt.datetime(2023, 12, 31, 23)),  # LAST_MONTH / LAST_YEAR
        (7, dt.datetime(2024, 2, 5, 0)),     # NEXT_MONTH
    ]
    spark.createDataFrame(rows, ["id", "ts"]).createOrReplaceTempView("evt")
    return spark


TODAY = __import__("datetime").date(2024, 1, 20)  # a Saturday


def dsel(spark, where, **kw):
    df = soql_to_df(
        spark, f"SELECT id FROM evt WHERE {where} ORDER BY id", today=TODAY, **kw
    )
    return [r.id for r in df.collect()]


def test_range_literal_containment(dated):
    assert dsel(dated, "ts = TODAY") == [4]
    assert dsel(dated, "ts = TOMORROW") == [5]
    assert dsel(dated, "ts = THIS_WEEK") == [3, 4, 5]        # Mon 15 .. Sun 21
    assert dsel(dated, "ts = LAST_WEEK") == [2]              # Mon 8 .. Sun 14
    assert dsel(dated, "ts = THIS_MONTH") == [1, 2, 3, 4, 5]
    assert dsel(dated, "ts = LAST_MONTH") == [6]
    assert dsel(dated, "ts = NEXT_MONTH") == [7]
    assert dsel(dated, "ts = LAST_YEAR") == [6]
    assert dsel(dated, "ts = N_DAYS_AGO:6") == [2]           # exactly Jan 14


def test_range_literal_inequalities(dated):
    # '<' precedes the range start; '>' follows the range end
    assert dsel(dated, "ts < THIS_WEEK") == [1, 2, 6]
    assert dsel(dated, "ts > THIS_WEEK") == [7]
    assert dsel(dated, "ts >= THIS_MONTH") == [1, 2, 3, 4, 5, 7]
    assert dsel(dated, "ts != TODAY") == [1, 2, 3, 5, 6, 7]
    # LAST_N_DAYS includes today (public SOQL semantics)
    assert dsel(dated, "ts = LAST_N_DAYS:7") == [2, 3, 4]
    assert dsel(dated, "ts = NEXT_N_DAYS:3") == [5]


def test_date_literal_rejected_in_in_list(dated):
    with pytest.raises(SoqlError, match="range"):
        dsel(dated, "ts IN (TODAY, YESTERDAY)")


def test_extended_date_functions(dated):
    df = soql_to_df(
        dated,
        "SELECT DAY_IN_WEEK(ts) dw, DAY_IN_YEAR(ts) dy, WEEK_IN_YEAR(ts) wy, "
        "WEEK_IN_MONTH(ts) wm FROM evt WHERE id = 4",
        today=TODAY,
    ).collect()[0]
    # Jan 20 2024 is a Saturday (SOQL/Spark: 1=Sunday → 7), day 20 of the year,
    # 7-day-block week 3, week 3 of the month
    assert (df.dw, df.dy, df.wy, df.wm) == (7, 20, 3, 3)


def test_fiscal_functions_with_feb_start(dated):
    out = soql_to_df(
        dated,
        "SELECT id, FISCAL_YEAR(ts) fy, FISCAL_QUARTER(ts) fq, "
        "FISCAL_MONTH(ts) fm FROM evt WHERE id IN (4, 7) ORDER BY id",
        today=TODAY,
        fiscal_start_month=2,
    ).collect()
    jan, feb = out[0], out[1]
    # Jan 2024: fiscal month 12 of FY2024 (ends Jan 31); Feb 2024 opens FY2025
    assert (jan.fy, jan.fq, jan.fm) == (2024, 4, 12)
    assert (feb.fy, feb.fq, feb.fm) == (2025, 1, 1)


def test_fiscal_defaults_match_calendar(dated):
    out = soql_to_df(
        dated,
        "SELECT FISCAL_YEAR(ts) fy, FISCAL_QUARTER(ts) fq FROM evt "
        "WHERE id = 1",
        today=TODAY,
    ).collect()[0]
    assert (out.fy, out.fq) == (2024, 1)


def test_group_by_fiscal_quarter(dated):
    out = soql_to_df(
        dated,
        "SELECT FISCAL_QUARTER(ts) fq, COUNT() n FROM evt "
        "GROUP BY FISCAL_QUARTER(ts) ORDER BY fq",
        fiscal_start_month=2,
    ).collect()
    assert [(r.fq, r.n) for r in out] == [(1, 1), (4, 6)]


def test_iso_literal_bounds_push_to_resolver(dated):
    """Static ISO-date bounds reach a ts_range-capable resolver even
    without an injected today (scan-side pushdown contract)."""
    seen = {}

    def resolve(name, ts_range=None):
        if ts_range is not None:
            seen["rng"] = ts_range
        return dated.table(name)

    out = soql_to_df(
        dated,
        "SELECT id FROM evt WHERE ts >= 2024-01-14 AND ts < 2024-01-21 "
        "ORDER BY id",
        resolve=resolve,
    ).collect()
    assert [r.id for r in out] == [2, 3, 4]
    assert seen["rng"] == ("ts", "2024-01-14 00:00:00", "2024-01-21 00:00:00")


def test_datelit_bounds_require_injected_today(dated):
    """Without a static today, relative literals must NOT push a stale
    range; with one, the intersection of conjuncts is pushed."""
    calls = []

    def resolve(name, ts_range=None):
        calls.append(ts_range)
        return dated.table(name)

    soql_to_df(dated, "SELECT id FROM evt WHERE ts = THIS_WEEK", resolve=resolve)
    assert all(r is None for r in calls)

    calls.clear()
    soql_to_df(
        dated,
        "SELECT id FROM evt WHERE ts = THIS_WEEK AND ts >= 2024-01-17",
        resolve=resolve,
        today=TODAY,
    )
    assert ("ts", "2024-01-17 00:00:00", "2024-01-22 00:00:00") in calls


def test_trailing_clauses_parse_and_are_inert(spark):
    """FOR VIEW/REFERENCE/UPDATE and WITH SECURITY_ENFORCED are accepted
    (the reference forwards any SOQL string); their semantics are
    server-side bookkeeping with no analog on an analytics replica, so the
    result set is identical to the bare query."""
    from salesforce_plugin_spark.plans import SoqlError, soql_to_df
    from salesforce_plugin_spark.plans.soql import _Parser, tokenize

    spark.createDataFrame(
        [(1, "F", 10.0), (2, "O", 20.0)],
        ["o_orderkey", "o_orderstatus", "o_totalprice"],
    ).createOrReplaceTempView("soqlt_orders")
    resolve = lambda name: spark.table(name.lower())  # noqa: E731

    base = soql_to_df(
        spark, "SELECT o_orderkey FROM soqlt_orders WHERE o_totalprice > 5",
        resolve=resolve,
    ).collect()
    for suffix in (" FOR VIEW", " FOR REFERENCE", " FOR UPDATE",
                   " ORDER BY o_orderkey LIMIT 10 FOR VIEW"):
        got = soql_to_df(
            spark,
            "SELECT o_orderkey FROM soqlt_orders WHERE o_totalprice > 5"
            + suffix,
            resolve=resolve,
        ).collect()
        assert sorted(got) == sorted(base), suffix
    got = soql_to_df(
        spark,
        "SELECT o_orderkey FROM soqlt_orders WHERE o_totalprice > 5 "
        "WITH SECURITY_ENFORCED ORDER BY o_orderkey",
        resolve=resolve,
    ).collect()
    assert sorted(got) == sorted(base)

    # the flags are recorded on the parsed statement
    q = _Parser(
        tokenize("SELECT a FROM t WITH SECURITY_ENFORCED FOR UPDATE"),
        "",
    ).parse_query()
    assert q["security_enforced"] is True and q["for_clause"] == "UPDATE"

    # malformed trailing clauses and malformed TYPEOF raise typed errors
    import pytest as _pytest

    for bad in (
        "SELECT a FROM t FOR DELETE",
        "SELECT a FROM t WITH BANANAS",
        "SELECT TYPEOF What WHEN x THEN y FROM t",    # missing END
        "SELECT TYPEOF What END FROM t",              # no WHEN branch
        "SELECT TYPEOF What WHEN x THEN END FROM t",  # empty field list
    ):
        with _pytest.raises(SoqlError):
            _Parser(tokenize(bad), bad).parse_query()


def test_ci_strings_collation(spark):
    """ci_strings=True replays Salesforce's case-insensitive text
    collation for =, !=, IN (LIKE is always case-insensitive); default
    stays bytewise like the oracle contract."""
    from salesforce_plugin_spark.plans import soql_to_df

    spark.createDataFrame(
        [(1, "Alpha"), (2, "ALPHA"), (3, "beta")], ["id", "name"]
    ).createOrReplaceTempView("ci_t")
    resolve = lambda n: spark.table(n.lower())  # noqa: E731

    q = "SELECT id FROM ci_t WHERE name = 'alpha'"
    assert [r.id for r in soql_to_df(spark, q, resolve=resolve).collect()] == []
    assert sorted(
        r.id for r in soql_to_df(spark, q, resolve=resolve, ci_strings=True).collect()
    ) == [1, 2]
    q_in = "SELECT id FROM ci_t WHERE name IN ('ALPHA', 'BETA')"
    assert sorted(
        r.id
        for r in soql_to_df(spark, q_in, resolve=resolve, ci_strings=True).collect()
    ) == [1, 2, 3]
    q_ne = "SELECT id FROM ci_t WHERE name != 'Beta'"
    assert sorted(
        r.id
        for r in soql_to_df(spark, q_ne, resolve=resolve, ci_strings=True).collect()
    ) == [1, 2]


def test_typeof_parse_and_bulk_restriction():
    """TYPEOF parses into branch structure; the Bulk API path rejects it
    (Salesforce Bulk SOQL does not support TYPEOF)."""
    import pytest as _pytest

    from salesforce_plugin_spark.plans.soql import (
        _Parser,
        assert_bulk_compatible,
        tokenize,
    )

    soql = (
        "SELECT id, TYPEOF who WHEN Customer THEN a, b "
        "WHEN Supplier THEN c ELSE d END FROM events"
    )
    q = _Parser(tokenize(soql), soql).parse_query()
    (item,) = [it for it in q["select"] if it["kind"] == "typeof"]
    assert item["rel"] == "who"
    assert item["branches"] == [("Customer", ["a", "b"]), ("Supplier", ["c"])]
    assert item["else"] == ["d"]

    with _pytest.raises(SoqlError, match="Bulk API does not support TYPEOF"):
        assert_bulk_compatible(soql)


def test_typeof_lowering_semantics(spark):
    """Each WHEN branch joins only rows whose discriminator selects it;
    ELSE coalesces over the un-named types; unknown rel/type/field and
    exhaustive-WHEN-with-ELSE raise typed errors."""
    import pytest as _pytest

    from salesforce_plugin_spark.plans import soql_to_df
    from salesforce_plugin_spark.plans.soql import RelationshipRegistry

    spark.createDataFrame(
        [(1, "acct", 10), (2, "opp", 20), (3, "lead", 30), (4, "acct", 99)],
        ["id", "kind", "ref"],
    ).createOrReplaceTempView("tasks")
    spark.createDataFrame(
        [(10, "A10", "p10")], ["a_id", "a_name", "a_phone"]
    ).createOrReplaceTempView("accounts")
    spark.createDataFrame(
        [(20, "O20")], ["o_id", "o_name"]
    ).createOrReplaceTempView("opps")
    spark.createDataFrame(
        [(30, "L30")], ["l_id", "l_name"]
    ).createOrReplaceTempView("leads")

    reg = RelationshipRegistry(
        poly={
            ("tasks", "what"): (
                "ref",
                "kind",
                {
                    "Account": ("accounts", "a_id", "acct"),
                    "Opportunity": ("opps", "o_id", "opp"),
                    "Lead": ("leads", "l_id", "lead"),
                },
            )
        }
    )
    resolve = lambda n: spark.table(n.lower())  # noqa: E731

    out = soql_to_df(
        spark,
        "SELECT id, TYPEOF what WHEN Account THEN a_name, a_phone "
        "WHEN Opportunity THEN o_name ELSE l_name END FROM tasks",
        resolve=resolve,
        relationships=reg,
    )
    assert out.columns == [
        "id", "account_a_name", "account_a_phone",
        "opportunity_o_name", "else_l_name",
    ]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["account_a_name"] == "A10" and rows[1]["o" "pportunity_o_name"] is None
    assert rows[2]["opportunity_o_name"] == "O20" and rows[2]["account_a_name"] is None
    assert rows[3]["else_l_name"] == "L30"
    # unresolved FK (ref=99) -> all branch columns null
    assert rows[4]["account_a_name"] is None and rows[4]["else_l_name"] is None

    for bad, msg in (
        ("SELECT TYPEOF nope WHEN Account THEN a_name END FROM tasks",
         "unknown polymorphic relationship"),
        ("SELECT TYPEOF what WHEN Banana THEN a_name END FROM tasks",
         "unknown TYPEOF type"),
        ("SELECT TYPEOF what WHEN Account THEN missing_col END FROM tasks",
         "does not exist"),
        ("SELECT TYPEOF what WHEN Account THEN a_name WHEN Opportunity "
         "THEN o_name WHEN Lead THEN l_name ELSE x END FROM tasks",
         "no remaining registered types"),
        ("SELECT COUNT(id), TYPEOF what WHEN Account THEN a_name END "
         "FROM tasks", "cannot mix"),
    ):
        with _pytest.raises(SoqlError, match=msg):
            soql_to_df(spark, bad, resolve=resolve, relationships=reg)


def test_fields_all_expands_schema(tables):
    out = soql_to_df(
        tables, "SELECT FIELDS(ALL) FROM account ORDER BY id LIMIT 200"
    )
    assert out.columns == ["id", "name", "state", "amount", "grp"]
    assert out.count() == 4


def test_fields_dedupes_against_explicit(tables):
    out = soql_to_df(
        tables, "SELECT name, FIELDS(ALL) FROM account LIMIT 10"
    )
    # explicit 'name' keeps its slot; expansion skips the duplicate
    assert out.columns == ["name", "id", "state", "amount", "grp"]


def test_fields_custom_scope_selects_suffixed(spark):
    spark.createDataFrame(
        [(1, "x", "y")], ["id", "plain", "extra__c"]
    ).createOrReplaceTempView("cust_obj")
    std = soql_to_df(spark, "SELECT FIELDS(STANDARD) FROM cust_obj")
    assert std.columns == ["id", "plain"]
    cust = soql_to_df(spark, "SELECT FIELDS(CUSTOM) FROM cust_obj LIMIT 5")
    assert cust.columns == ["extra__c"]


def test_fields_bounded_query_rule(tables):
    with pytest.raises(SoqlError, match="LIMIT <= 200"):
        soql_to_df(tables, "SELECT FIELDS(ALL) FROM account")
    with pytest.raises(SoqlError, match="LIMIT <= 200"):
        soql_to_df(tables, "SELECT FIELDS(ALL) FROM account LIMIT 201")
    # STANDARD is unbounded
    assert soql_to_df(
        tables, "SELECT FIELDS(STANDARD) FROM account"
    ).count() == 4


def test_fields_rejects_aggregate_mix(tables):
    with pytest.raises(SoqlError, match="cannot mix"):
        soql_to_df(
            tables,
            "SELECT FIELDS(ALL), COUNT(id) FROM account LIMIT 5",
        )
    with pytest.raises(SoqlError, match="ALL, STANDARD or CUSTOM"):
        soql_to_df(tables, "SELECT FIELDS(BOGUS) FROM account LIMIT 5")
