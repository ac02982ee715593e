"""Beyond-SOQL relational surface (free in Spark): window functions, as-of/range/skew joins, pagination, set evolution.

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# F6: windowed event processing (batch form of the streaming plan)
# ---------------------------------------------------------------------------

def q_asof_join(spark, sf_dir):
    """Custom operator (SURVEY §4): backward as-of join — for every click
    event, the user's latest view event at-or-before it. Union + carry-
    forward window construction; DuckDB's native ASOF JOIN is the oracle."""
    from salesforce_plugin_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    out = asof_join(clicks, views, "ts", by=["user_id"])
    return out.select(
        "user_id",
        "click_id",
        F.unix_micros(F.col("ts")).alias("click_us"),
        "view_id_r",
        F.unix_micros(F.col("ts_r")).alias("view_us"),
    )


def q_range_join(spark, sf_dir):
    """Custom-operator rubric (SURVEY §4): point-in-interval range join
    without a cartesian — clicks attributed to purchases of the same user
    within the 2 hours before the purchase. Both sides explode onto
    fixed-width time buckets and equi-join on (bucket, user), so reducer
    load is bounded by rows-per-bucket, never |points|×|intervals|; the
    exact containment predicate filters after. The oracle is the naive
    inequality join — same result, quadratic per user (fine at sf0.01,
    not at 100 TB; that asymmetry is the point of the operator)."""
    from salesforce_plugin_spark.operators.joins import range_join_bucketed

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    joined = range_join_bucketed(
        clicks,
        purchases,
        point_col="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_width=7200,
        extra_keys=["user_id"],
    )
    return joined.select(
        "user_id",
        "click_id",
        F.unix_micros(F.col("ts")).alias("click_us"),
        "purchase_id",
        F.unix_micros(F.col("w_end")).alias("purchase_us"),
    )


def q_ndjson_roundtrip(spark, sf_dir):
    """A13/A5-A7/E5 end to end: write documents through the ndjson sink
    (executor-parallel, overwrite-idempotent — the Bulk-path serialization,
    salesforce_to_s3_operator.py:53-57) and read the files back; the gate
    hashes the read-back against the source-of-truth table, so encoding,
    escaping, and null handling of the sink are all under the oracle. The
    write is many-files parallel (no driver spool) — the read-back scan
    parallelizes over the same files."""
    import os
    import tempfile

    from salesforce_plugin_spark.sources import io as IO

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = os.path.join(tempfile.gettempdir(), "conf_ndjson_roundtrip")
    IO.write_ndjson(d, out)
    back = spark.read.schema("doc_id long, text string, lang string").json(out)
    return back.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("text_md5"),
        "lang",
    )


def q_csv_roundtrip(spark, sf_dir):
    """A11+C4 end to end: documents through the CSV sink (header, quoted
    cells, newline-scrubbed strings) and back with an explicit read schema.
    Empty strings surface as null on read-back (Spark CSV default) —
    normalized with coalesce on both sides of the gate; the oracle applies
    the same [\\r\\n]+ scrub, so the hash pins the full serialize→parse
    contract."""
    import os
    import tempfile

    from salesforce_plugin_spark.sources import io as IO

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = os.path.join(tempfile.gettempdir(), "conf_csv_roundtrip")
    IO.write_csv(d, out)
    back = (
        spark.read.schema("doc_id long, text string, lang string")
        .option("header", True)
        .csv(out)
    )
    return back.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("text_md5"),
        "lang",
    )


def q_doc_chunks(spark, sf_dir):
    """F5 context-window chunking: overlapping 64-token windows, stride 48,
    one pass over a materialized token array, chunks md5'd for a compact
    cross-engine hash (functions/text.chunk_documents)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = X.chunk_documents(docs, "doc_id", "text", chunk_tokens=64, stride=48)
    return chunks.select(
        "doc_id",
        "chunk_id",
        "n_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


def q_embed_quantize(spark, sf_dir):
    """F3 int8 symmetric quantization of embeddings — per vector: the
    127/max|x| scale and exact integer stats of the quantized values
    (functions/vector.quantize_int8; floor semantics, no tie rule)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = V.as_double(F.col("embedding"))
    df = e.select(
        "vec_id",
        F.size(F.col("embedding")).alias("n_dims"),
        V.int8_scale(v).alias("scale"),
        V.quantize_int8(v, V.int8_scale(v)).alias("__q"),
    )
    return df.select(
        "vec_id",
        "n_dims",
        # no rounding: the scale is bit-identical across engines (exact
        # float→double widening, one max, one divide), and rounding a
        # double is itself engine-dependent at ties
        F.col("scale"),
        F.aggregate(
            F.col("__q"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("q_sum"),
        F.array_min("__q").alias("q_min"),
        F.array_max("__q").alias("q_max"),
    )


def q_embed_dedup(spark, sf_dir):
    """F2/F3 composition capstone: embedding-level near-dup collapse —
    sign-LSH blocking (vector.sign_bucket, an equijoin not a cartesian) →
    rounded-cosine pair verification (dedup.embedding_cosine_pairs) →
    exact connected components (dedup.connected_components) assigning
    every vector its duplicate-cluster id. The standard semantic-dedup
    stage of an embedding-indexed corpus, each stage engine-reproducible:
    the oracle mirrors bucket, pair set, and the transitive closure
    (recursive CTE)."""
    e = load_table(spark, sf_dir, "embeddings")
    b = e.withColumn(
        "bucket", V.sign_bucket(V.as_double(F.col("embedding")), 8)
    )
    pairs = D.embedding_cosine_pairs(
        b, "vec_id", "embedding", threshold=0.5, block_col="bucket"
    )
    return D.connected_components(
        e.select("vec_id"), pairs, id_col="vec_id", src="id_a", dst="id_b"
    ).withColumnRenamed("component_id", "cluster_id")


def q_incremental_extract(spark, sf_dir):
    """D21 under the gate: the reference's templated watermark idiom —
    ``soql``/``query`` are Jinja template_fields re-rendered per run with
    the scheduler's execution dates (salesforce_to_s3_operator.py:25,
    115-116); here the same string is parameter-bound with the previous
    run's high-water mark and executed through the SOQL front door. The
    half-open (prev, now] slice is what makes scheduled re-runs
    partition-exact (no row lost or double-extracted across runs)."""
    from salesforce_plugin_spark.plans import soql_to_df

    def resolve(name):
        return load_table(spark, sf_dir, name.lower())

    template = (
        "SELECT event_id, user_id, event_type FROM events "
        "WHERE ts > {prev_execution_date} AND ts <= {execution_date}"
    )
    bound = template.format(
        prev_execution_date="2024-01-10T00:00:00",
        execution_date="2024-01-20T00:00:00",
    )
    return soql_to_df(spark, bound, resolve=resolve)


def q_bucketed_join(spark, sf_dir):
    """Scale layout under the gate: orders and customer persisted as
    hash-bucketed catalog tables on the customer key, then joined with a
    merge hint — bucketed-on-the-join-key tables with equal bucket counts
    sort-merge-join WITHOUT an exchange (the no-shuffle co-located join
    that amortizes one bucketing write over every subsequent join; the
    plan property is pinned by tests/test_partitioning.py). The gate
    hashes the bucketed round trip's join result against the plain join
    on the source tables."""
    import uuid

    from salesforce_plugin_spark.operators.partitioning import write_bucketed

    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"t_conf_bko_{suffix}", f"t_conf_bkc_{suffix}"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    try:
        write_bucketed(o, ta, ["o_custkey"], num_buckets=8)
        write_bucketed(c, tb, ["c_custkey"], num_buckets=8)
        joined = (
            spark.table(ta)
            .join(
                spark.table(tb).hint("merge"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
        )
        return joined.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def q_partitioned_scan(spark, sf_dir):
    """Scale layout under the gate: events rewritten into a day-partitioned
    parquet layout (partitioning.repartition_by_time clusters rows so each
    day directory is written by few tasks), then a day-range query over the
    partitioned copy. Partition pruning turns the range scan into a
    directory listing of only the matching days — the layout that makes
    time-range queries touch 1/365th of a year of data at 100 TB
    (tests/test_plans_regression.py asserts the PartitionFilters). Values
    are gated against the flat source table."""
    import os
    import tempfile

    from salesforce_plugin_spark.operators.partitioning import (
        repartition_by_time,
    )

    e = load_table(spark, sf_dir, "events")
    out = os.path.join(tempfile.gettempdir(), "conf_part_events")
    clustered = repartition_by_time(e, "ts", "day").withColumn(
        "event_day", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    clustered.write.mode("overwrite").partitionBy("event_day").parquet(out)
    back = spark.read.parquet(out).filter(
        (F.col("event_day") >= F.lit("2024-01-05").cast("date"))
        & (F.col("event_day") < F.lit("2024-01-15").cast("date"))
    )
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )


def q_skew_join(spark, sf_dir):
    """Skew-mitigation correctness under the gate: the salted fact⨝dim
    join (operators/partitioning.salted_join — dim replicated per salt,
    hot keys spread over `salt` reducers) must be row-identical to the
    plain join the oracle runs."""
    from salesforce_plugin_spark.operators.partitioning import salted_join

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(e, c, "user_id", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(_dec(F.col("value"), 18, 4)).alias("sum_value"),
    )


def q_topk_per_group(spark, sf_dir):
    """Window functions: top-3 orders by price per priority — the per-group
    top-k every training-data pipeline needs (sample selection), planned as
    a single windowed sort per partition, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
    )


def q_set_ops(spark, sf_dir):
    """Set operations: customers with both fulfilled and open orders
    (INTERSECT), minus the top-balance cohort (EXCEPT)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    rich = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return (
        f_cust.intersect(o_cust)
        .exceptAll(rich)
        .select(F.col("o_custkey").alias("custkey"))
    )


def q_embed_ivf(spark, sf_dir):
    """F3 scale path: IVF inverted lists + nprobe search, under the full
    value gate. Centroids are the deterministic seeded codebook (the 8
    lowest-id corpus vectors — vector.ivf_assign_deterministic), so
    assignment, probe choice, and the exact top-k within probed lists are
    all reproduced by the oracle; the KMeans-trained production index
    (ivf_index/ivf_topk, same plan shape) is recall-tested in tests."""
    e = load_table(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        V.as_double(F.col("embedding")).alias("c_vec"),
    )
    qv = e.filter(F.col("vec_id") == 0).select(
        V.as_double(F.col("embedding")).alias("q_vec")
    )
    assigned = V.ivf_assign_deterministic(e, "vec_id", "embedding", seeds)
    probe = (
        seeds.crossJoin(F.broadcast(qv))
        .select(
            "centroid_id",
            F.round(V.cosine(F.col("c_vec"), F.col("q_vec")), 6).alias("psim"),
        )
        .orderBy(F.col("psim").desc(), "centroid_id")
        .limit(3)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(probe), "centroid_id", "left_semi")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                V.cosine(V.as_double(F.col("embedding")), F.col("q_vec")), 6
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


def q_interval_overlap(spark, sf_dir):
    """Custom-operator rubric (SURVEY §4): interval×interval overlap join
    without a cartesian — 2-hour purchase-attribution windows matched to
    1-hour view-engagement windows of the same user wherever they overlap.
    Both sides explode onto 1-hour buckets and equi-join; each surviving
    pair is kept only in the bucket containing the overlap's start, so no
    distinct/dedup exchange ever sees the join output. The oracle is the
    naive inequality join — quadratic per user, fine at sf0.01, not at
    100 TB; that asymmetry is the operator's point."""
    from salesforce_plugin_spark.operators.joins import interval_overlap_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("p_start"),
        F.col("ts").alias("p_end"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOURS")).alias("v_end"),
    )
    out = interval_overlap_join(
        purchases,
        views,
        l_start="p_start",
        l_end="p_end",
        r_start="v_start",
        r_end="v_end",
        bucket_width=3600,
        extra_keys=["user_id"],
    )
    return out.select(
        "user_id",
        "purchase_id",
        "view_id",
        F.unix_micros(F.col("p_start")).alias("p_start_us"),
        F.unix_micros(F.col("p_end")).alias("p_end_us"),
        F.unix_micros(F.col("v_start")).alias("v_start_us"),
        F.unix_micros(F.col("v_end")).alias("v_end_us"),
    )


def q_zorder(spark, sf_dir):
    """Data-layout operator (100 TB concern): Z-order/Morton clustering
    key (operators/partitioning.py zorder_key) — the multi-dimensional
    sort key behind lakehouse OPTIMIZE ZORDER BY, letting parquet
    min/max footer stats prune on EITHER predicate column of a
    two-column filter (a plain sort prunes only its leading column;
    write_zordered applies it at write time via repartitionByRange +
    sortWithinPartitions). Gated on the bit-interleave itself: pure
    bitwise codegen, no shuffle, replayed bit-for-bit in SQL."""
    from salesforce_plugin_spark.operators.partitioning import zorder_key

    e = load_table(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(1024)).cast("long")
    y = F.pmod(F.floor(F.col("value")).cast("long"), F.lit(1024))
    return e.select(
        "event_id",
        x.alias("x"),
        y.alias("y"),
        zorder_key([x, y], bits=10).alias("z"),
    )


def q_zonemap_prune(spark, sf_dir):
    """Layout evaluation (operators/partitioning.py zonemap_prune_eval):
    simulate 64-file parquet zone maps under the natural (orderkey)
    layout vs a price-sorted layout and measure what a price-range
    predicate can skip — the quantified companion to q_zorder (an
    unevaluated layout is a guess; at 100 TB the files_read fraction IS
    the scan cost). Deterministic ntile over tie-free total orders, so
    the whole simulation replays cross-engine."""
    from salesforce_plugin_spark.operators.partitioning import (
        zonemap_prune_eval,
    )

    o = load_table(spark, sf_dir, "orders")
    return zonemap_prune_eval(
        o,
        {
            "natural": [F.col("o_orderkey")],
            "byprice": [F.col("o_totalprice"), F.col("o_orderkey")],
        },
        F.col("o_totalprice"),
        50000.0,
        60000.0,
        n_files=64,
    )


def q_scd2_lookup(spark, sf_dir):
    """Point-in-time enrichment — the feature-store composition of two
    session operators: build the user's status history with
    scd2_intervals (state feed = signup/error events, attr = type),
    then attach to every purchase the status AT PURCHASE TIME via the
    backward as-of join (operators/joins.py). SCD2 intervals are
    contiguous per key, so the as-of match on valid_from is exactly the
    interval containing the timestamp — no BETWEEN join, no interval
    explode; purchases before a user's first status row get NULLs
    (training-serving skew from future leakage is the failure this
    pattern prevents). The oracle is the naive validity-interval BETWEEN
    join."""
    from salesforce_plugin_spark.operators.joins import asof_join
    from salesforce_plugin_spark.operators.scd import scd2_intervals

    e = load_table(spark, sf_dir, "events")
    state_feed = e.filter(F.col("event_type").isin("signup", "error")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    iv = scd2_intervals(
        state_feed,
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        tiebreak_cols=["event_id"],
    ).select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("__valid_from").alias("ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    out = asof_join(purchases, iv, "ts", by=["user_id"])
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("purchase_us"),
        F.col("status_r").alias("status"),
        F.unix_micros(F.col("ts_r")).alias("status_since_us"),
    )


def q_hierarchy(spark, sf_dir):
    """Parent-pointer hierarchy resolution (operators/hierarchy.py
    resolve_hierarchy): every node's root and depth by POINTER DOUBLING
    — ceil(log2(depth)) self-join rounds instead of depth rounds, the
    shape that makes Salesforce Account/Role parent chains (and any
    org-tree rollup) tractable at cluster scale. The forest is derived
    deterministically from customer (custkey < 8 are roots, else
    parent = custkey div 8, depth ~log8 N) so the WITH RECURSIVE oracle
    rebuilds it exactly."""
    from salesforce_plugin_spark.operators.hierarchy import resolve_hierarchy

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.when(F.col("c_custkey") >= 8, F.expr("c_custkey div 8")).alias(
            "parent"
        ),
    )
    return resolve_hierarchy(c, "id", "parent")


def q_asof_forward(spark, sf_dir):
    """Forward as-of join (operators/joins.py asof_join
    direction='forward'): for every click, the user's EARLIEST view
    at-or-after it within 2 hours — the next-event/label-lookahead
    shape (pandas merge_asof parity). Same single-exchange union-sort-
    window plan as the backward form, time sorted descending; the
    oracle replays it with a window over epoch micros."""
    from salesforce_plugin_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    out = asof_join(
        clicks, views, "ts", by=["user_id"], tolerance="2 hours",
        direction="forward",
    )
    return out.select(
        "user_id",
        "click_id",
        F.unix_micros(F.col("ts")).alias("click_us"),
        "view_id_r",
        F.unix_micros(F.col("ts_r")).alias("view_us"),
    )


def q_asof_nearest(spark, sf_dir):
    """Nearest as-of join (operators/joins.py asof_join
    direction='nearest'): each click matched to the user's closest view
    in EITHER direction, exact ties going backward — completing pandas
    merge_asof parity. Two passes of the join-free union-sort-window
    plan + a struct pick; oracle ranks by absolute time distance with
    the backward tiebreak."""
    from salesforce_plugin_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    out = asof_join(clicks, views, "ts", by=["user_id"], direction="nearest")
    return out.select(
        "user_id",
        "click_id",
        F.unix_micros(F.col("ts")).alias("click_us"),
        "view_id_r",
        F.unix_micros(F.col("ts_r")).alias("view_us"),
    )


def q_union_evolve(spark, sf_dir):
    """Schema-evolution-safe union (operators/transforms.py
    union_evolve): a pre-drift extract (orderkey, cents) unions a
    post-drift one (+ o_orderpriority) on the union of columns, the
    missing column reading as NULL — the read-side counterpart of the
    B5/B6 ALTER-TABLE drift machinery; historical partitions stay
    readable without a backfill. Pure projection + union, no
    shuffle."""
    from salesforce_plugin_spark.operators.transforms import union_evolve

    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderpriority",
    )
    return union_evolve([old, new])


def q_keyset_page(spark, sf_dir):
    """Scale-correct pagination (operators/transforms.py keyset_page):
    the page strictly after a (date, key) cursor — deep OFFSET (D17,
    q_offset_page) scans-and-discards O(depth) per page; the keyset
    OR-of-ANDs predicate pushes to the scan (row-group min/max skip
    everything before the cursor) and sort+limit is
    TakeOrderedAndProject. Cursor tuple includes the unique key, so
    paging is gap/duplicate-free."""
    import datetime as _dt

    from salesforce_plugin_spark.operators.transforms import keyset_page

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return keyset_page(
        o,
        ["o_orderdate", "o_orderkey"],
        [_dt.date(1995, 6, 15), 3000],
        100,
    )


def q_ntile(spark, sf_dir):
    """D15 window family: ntile(4) quartile buckets + exact cume_dist
    as integer ppm (rn·10⁶ div n under a TOTAL order — the float
    cume_dist is just that ratio; ppm keeps the gate integer) over
    suppliers by cent-quantized balance."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.round(F.col("s_acctbal") * 100).cast("long").alias("cents"),
    )
    w = Window.orderBy(F.col("cents"), F.col("s_suppkey"))
    return (
        s.select(
            "s_suppkey",
            "cents",
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("__n"),
        )
        .select(
            "s_suppkey",
            "cents",
            "quartile",
            F.expr("__rn * 1000000 div __n").cast("long").alias("cume_ppm"),
        )
    )


def q_pivot_margins(spark, sf_dir):
    """D12+reshaping: pivoted status counts WITH ROLLUP MARGINS — the
    crosstab-with-totals report. Two-phase (round 10, the q_agg_cube
    discipline): a naive rollup Expands the FACT table ×2 before the
    aggregate, so the conditional counts are aggregated ONCE per
    priority (the only fact-scale pass, map-side-combined) and the
    margin row is a Σ over the 5-row base — exact, long addition."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_orderpriority").agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("__f"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("__o"),
        F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("__p"),
        F.count(F.lit(1)).cast("long").alias("__t"),
    )
    return (
        base.rollup("o_orderpriority")
        .agg(
            F.sum("__f").cast("long").alias("n_f"),
            F.sum("__o").cast("long").alias("n_o"),
            F.sum("__p").cast("long").alias("n_p"),
            F.sum("__t").cast("long").alias("n_total"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "priority"
            ),
            "n_f",
            "n_o",
            "n_p",
            "n_total",
        )
    )



ORACLES: dict[str, str] = {}

ORACLES["q_asof_join"] = """
        SELECT c.user_id, c.event_id AS click_id, epoch_us(c.ts) AS click_us,
               v.event_id AS view_id_r, epoch_us(v.ts) AS view_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """

ORACLES["q_doc_chunks"] = r"""
        WITH toked AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS t
            FROM documents
        ), spans AS (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t), 1), 48)) AS s
            FROM toked
        )
        SELECT doc_id,
               CAST((s - 1) // 48 AS INTEGER) AS chunk_id,
               CAST(len(list_slice(t, s, s + 63)) AS BIGINT) AS n_tokens,
               md5(array_to_string(list_slice(t, s, s + 63), ' ')) AS chunk_md5
        FROM spans
    """

ORACLES["q_embed_quantize"] = """
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
            FROM embeddings
        ), sc AS (
            SELECT vec_id, vd,
                   CASE WHEN list_max(list_transform(vd, x -> abs(x))) > 0
                        THEN 127.0 / list_max(list_transform(vd, x -> abs(x)))
                        ELSE 0.0 END AS scale
            FROM v
        ), q AS (
            SELECT vec_id, CAST(len(vd) AS INTEGER) AS n_dims, scale,
                   list_transform(vd, x -> CAST(floor(x * scale) AS INTEGER))
                       AS qv
            FROM sc
        )
        SELECT vec_id, n_dims, scale,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               list_min(qv) AS q_min,
               list_max(qv) AS q_max
        FROM q
    """

ORACLES["q_ndjson_roundtrip"] = """
        SELECT doc_id, md5(coalesce(text, '')) AS text_md5, lang FROM documents
    """

ORACLES["q_csv_roundtrip"] = r"""
        SELECT doc_id,
               md5(regexp_replace(coalesce(text, ''), '[\r\n]+', '', 'g')) AS text_md5,
               lang
        FROM documents
    """

ORACLES["q_range_join"] = """
        SELECT c.user_id AS user_id,
               c.event_id AS click_id,
               epoch_us(c.ts) AS click_us,
               p.event_id AS purchase_id,
               epoch_us(p.ts) AS purchase_us
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND c.ts >= p.ts - INTERVAL 2 HOUR AND c.ts <= p.ts
    """

ORACLES["q_topk_per_group"] = """
        SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """

ORACLES["q_set_ops"] = """
        SELECT o_custkey AS custkey FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        EXCEPT ALL
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """

ORACLES["q_skew_join"] = """
        SELECT c_mktsegment, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """

ORACLES["q_bucketed_join"] = """
        SELECT o_orderkey, o_custkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """

ORACLES["q_embed_dedup"] = """
        WITH RECURSIVE b AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) +
                   (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) +
                   (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) +
                   (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) +
                   (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END) +
                   (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END) +
                   (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END) +
                   (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bucket
            FROM embeddings
        ), edges AS (
            SELECT a.vec_id AS src, b2.vec_id AS dst
            FROM b a JOIN b b2
              ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
            WHERE round(list_cosine_similarity(a.v, b2.v), 6) >= 0.5
        ), sym AS (
            SELECT src, dst FROM edges
            UNION
            SELECT dst, src FROM edges
        ), reach AS (
            SELECT vec_id AS id, vec_id AS r FROM embeddings
            UNION
            SELECT reach.id, e.dst FROM reach JOIN sym e ON reach.r = e.src
        )
        SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id
    """

ORACLES["q_incremental_extract"] = """
        SELECT event_id, user_id, event_type FROM events
        WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
          AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    """

ORACLES["q_partitioned_scan"] = """
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts <  TIMESTAMP '2024-01-15 00:00:00'
    """

ORACLES["q_embed_ivf"] = """
        WITH seeds AS (
            SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_vec
            FROM embeddings WHERE vec_id < 8
        ), q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS q_vec
            FROM embeddings WHERE vec_id = 0
        ), assigned AS (
            SELECT vec_id, centroid_id FROM (
                SELECT e.vec_id, s.centroid_id,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY round(list_cosine_similarity(
                               CAST(e.embedding AS DOUBLE[]), s.c_vec), 6) DESC,
                                    s.centroid_id) AS rn
                FROM embeddings e, seeds s
            ) WHERE rn = 1
        ), probe AS (
            SELECT centroid_id FROM seeds, q
            ORDER BY round(list_cosine_similarity(c_vec, q_vec), 6) DESC,
                     centroid_id
            LIMIT 3
        )
        SELECT e.vec_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), q.q_vec), 6) AS sim
        FROM embeddings e
        JOIN assigned a ON a.vec_id = e.vec_id
        JOIN probe p ON p.centroid_id = a.centroid_id, q
        ORDER BY sim DESC, e.vec_id
        LIMIT 10
    """

ORACLES["q_interval_overlap"] = """
    WITH p AS (
        SELECT user_id, event_id AS purchase_id,
               ts - INTERVAL 2 HOUR AS p_start, ts AS p_end
        FROM events WHERE event_type = 'purchase'
    ), v AS (
        SELECT user_id, event_id AS view_id,
               ts AS v_start, ts + INTERVAL 1 HOUR AS v_end
        FROM events WHERE event_type = 'view'
    )
    SELECT p.user_id, p.purchase_id, v.view_id,
           epoch_us(p.p_start) AS p_start_us,
           epoch_us(p.p_end) AS p_end_us,
           epoch_us(v.v_start) AS v_start_us,
           epoch_us(v.v_end) AS v_end_us
    FROM p JOIN v
      ON p.user_id = v.user_id
     AND p.p_start <= v.v_end AND v.v_start <= p.p_end
"""

ORACLES["q_zorder"] = _zorder_oracle()

ORACLES["q_zonemap_prune"] = """
    WITH f1 AS (
        SELECT ntile(64) OVER (ORDER BY o_orderkey) AS f,
               o_totalprice AS v
        FROM orders
    ), z1 AS (
        SELECT f, CAST(count(*) AS BIGINT) AS nrows, min(v) AS lo,
               max(v) AS hi
        FROM f1 GROUP BY 1
    ), f2 AS (
        SELECT ntile(64) OVER (ORDER BY o_totalprice, o_orderkey) AS f,
               o_totalprice AS v
        FROM orders
    ), z2 AS (
        SELECT f, CAST(count(*) AS BIGINT) AS nrows, min(v) AS lo,
               max(v) AS hi
        FROM f2 GROUP BY 1
    ), layouts AS (
        SELECT 'natural' AS layout, CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN lo <= 60000.0 AND hi >= 50000.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
               CAST(sum(CASE WHEN lo <= 60000.0 AND hi >= 50000.0
                        THEN nrows ELSE 0 END) AS BIGINT) AS rows_read
        FROM z1
        UNION ALL
        SELECT 'byprice', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN lo <= 60000.0 AND hi >= 50000.0
                        THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN lo <= 60000.0 AND hi >= 50000.0
                        THEN nrows ELSE 0 END) AS BIGINT)
        FROM z2
    )
    SELECT layout, n_files, files_read, rows_read,
           CAST((n_files - files_read) * 1000000 // n_files AS BIGINT)
               AS prune_ppm
    FROM layouts
"""

ORACLES["q_scd2_lookup"] = """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_attr,
               row_number() OVER w AS rn
        FROM events
        WHERE event_type IN ('signup', 'error')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), iv AS (
        SELECT user_id, event_type AS status, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM ordered
        WHERE rn = 1 OR prev_attr IS DISTINCT FROM event_type
    ), p AS (
        SELECT user_id, event_id AS purchase_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           i.status,
           epoch_us(i.valid_from) AS status_since_us
    FROM p
    LEFT JOIN iv i
      ON i.user_id = p.user_id
     AND p.ts >= i.valid_from
     AND (i.valid_to IS NULL OR p.ts < i.valid_to)
"""

ORACLES["q_hierarchy"] = """
    WITH RECURSIVE nodes AS (
        SELECT c_custkey AS id,
               CASE WHEN c_custkey >= 8 THEN c_custkey // 8 END AS parent
        FROM customer
    ), walk AS (
        SELECT id, id AS root, 0 AS depth FROM nodes WHERE parent IS NULL
        UNION ALL
        SELECT n.id, w.root, w.depth + 1
        FROM nodes n JOIN walk w ON n.parent = w.id
    )
    SELECT id, root, CAST(depth AS INT) AS depth FROM walk
"""

ORACLES["q_asof_forward"] = """
    WITH c AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        FROM events WHERE event_type = 'click'
    ), v AS (
        SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
        FROM events WHERE event_type = 'view'
    ), ranked AS (
        SELECT c.click_id, v.view_id, v.view_us,
               row_number() OVER (
                   PARTITION BY c.click_id ORDER BY v.view_us, v.view_id
               ) AS rn
        FROM c JOIN v
          ON v.user_id = c.user_id
         AND v.view_us >= c.click_us
         AND v.view_us <= c.click_us + 7200000000
    )
    SELECT c.user_id, c.click_id, c.click_us,
           r.view_id AS view_id_r, r.view_us AS view_us
    FROM c LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.click_id = c.click_id
"""

ORACLES["q_asof_nearest"] = """
    WITH c AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        FROM events WHERE event_type = 'click'
    ), v AS (
        SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
        FROM events WHERE event_type = 'view'
    ), ranked AS (
        SELECT c.click_id, v.view_id, v.view_us,
               row_number() OVER (
                   PARTITION BY c.click_id
                   ORDER BY abs(v.view_us - c.click_us),
                            CASE WHEN v.view_us <= c.click_us
                                 THEN 0 ELSE 1 END,
                            v.view_id
               ) AS rn
        FROM c JOIN v ON v.user_id = c.user_id
    )
    SELECT c.user_id, c.click_id, c.click_us,
           r.view_id AS view_id_r, r.view_us AS view_us
    FROM c LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.click_id = c.click_id
"""

ORACLES["q_union_evolve"] = """
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           CAST(NULL AS VARCHAR) AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
           o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
"""

ORACLES["q_keyset_page"] = """
    SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
    WHERE (o_orderdate > DATE '1995-06-15')
       OR (o_orderdate = DATE '1995-06-15' AND o_orderkey > 3000)
    ORDER BY o_orderdate, o_orderkey LIMIT 100
"""

ORACLES["q_pivot_margins"] = """
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_p,
           CAST(count(*) AS BIGINT) AS n_total
    FROM orders GROUP BY ROLLUP (o_orderpriority)
"""

ORACLES["q_ntile"] = """
    WITH b AS (
        SELECT s_suppkey,
               CAST(round(s_acctbal * 100) AS BIGINT) AS cents
        FROM supplier
    )
    SELECT s_suppkey, cents,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           CAST((row_number() OVER w * 1000000) // count(*) OVER ()
                AS BIGINT) AS cume_ppm
    FROM b
    WINDOW w AS (ORDER BY cents, s_suppkey)
"""



def q_salted_distinct(spark, sf_dir):
    """Skew-safe exact COUNT(DISTINCT) under the gate
    (operators/partitioning.salted_count_distinct): stage 1 dedups
    (group, value-hash-shard) sub-sets independently, stage 2 sums the
    per-shard distinct counts — exact because value-hash sharding
    PARTITIONS the distinct set. The q_skew_join discipline applied to
    the other single-hot-reducer classic (a plain count_distinct
    funnels the hottest group's whole distinct set through one task at
    100 TB). Oracle is the plain COUNT(DISTINCT) it must equal."""
    from salesforce_plugin_spark.operators.partitioning import (
        salted_count_distinct,
    )

    e = load_table(spark, sf_dir, "events")
    return salted_count_distinct(e, ["event_type"], "user_id", salt=16)


ORACLES["q_salted_distinct"] = """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1
"""
