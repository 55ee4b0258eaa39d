"""Relational surface corpus (SURVEY.md §2.2 H1–H23).

The reference gets this surface from its host DuckDB (evidence: the extension
registers only a table function, /root/reference/src/sheetreader_extension.cpp:948-968,
and the demos compose it with host SQL, docker-demo/demo_community.sql). We
express it Spark-first and verify every query against the DuckDB oracle.

Float discipline: see sheetreader_duckdb_spark.functions — money-style SUM/AVG
quantize to integer cents per row so both engines sum exactly; libm-flavored
scalars (sqrt/ln/pow) and multi-pass statistics are rounded to 6 decimals.
All count/length/rank-like outputs are cast to BIGINT on the Spark side to
match DuckDB's integer widths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sheetreader_duckdb_spark.functions import (
    cents,
    round_fixed,
    sql_money_avg,
    sql_money_sum,
    sql_round_fixed,
)
from sheetreader_duckdb_spark.plans import query
from sheetreader_duckdb_spark.tables import T

# h02b sink dirs registered for remove-at-exit (one per (tag, pid); the
# guard set keeps atexit registrations from stacking across passes).
_CTAS_CLEANUP: set = set()


def _money_sum(col) -> F.Column:
    return F.sum(cents(col)) / 100.0


def _money_avg(col) -> F.Column:
    return F.sum(cents(col)) / 100.0 / F.count(F.lit(1))


# --------------------------------------------------------------------------
# H1/H3 — scan + projection/expressions
# --------------------------------------------------------------------------
@query(
    "h01_scan_filter_project",
    oracle="""
    SELECT 'scan' AS tag, l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           CAST(NULL AS DOUBLE) AS l_quantity, CAST(NULL AS VARCHAR) AS l_returnflag
    FROM lineitem
    UNION ALL
    SELECT 'filter' AS tag, l_orderkey, l_linenumber,
           CAST(NULL AS DOUBLE) AS net_price, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus LIKE 'F%'
      AND l_returnflag IS NOT NULL
      AND CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
    """,
    doc="Scan + pruned projection + row expression ('scan' branch, H1/H3) and "
    "conjunctive predicates BETWEEN / IN / LIKE / IS NULL / date compare "
    "('filter' branch, H4). Raw double output: per-row IEEE arithmetic is "
    "bit-identical across engines; filters push to the parquet scan.",
)
def h01_scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    l = T(spark, sf, "lineitem")
    scan = l.select(
        F.lit("scan").alias("tag"),
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.lit(None).cast("double").alias("l_quantity"),
        F.lit(None).cast("string").alias("l_returnflag"),
    )
    filt = l.filter(
        F.col("l_quantity").between(5, 20)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_linestatus").like("F%")
        & F.col("l_returnflag").isNotNull()
        & (F.to_date("l_shipdate") >= F.lit("1995-01-01").cast("date"))
    ).select(
        F.lit("filter").alias("tag"),
        "l_orderkey",
        "l_linenumber",
        F.lit(None).cast("double").alias("net_price"),
        "l_quantity",
        "l_returnflag",
    )
    return scan.unionAll(filt)


# --------------------------------------------------------------------------
# H5 — equi-joins: inner chain with broadcast dim + left outer with COALESCE
# --------------------------------------------------------------------------
@query(
    "h03_joins",
    oracle=f"""
    SELECT 'inner_nation' AS tag, n.n_name AS join_key,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o.o_totalprice')} AS amount
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    UNION ALL
    SELECT 'left_cust' AS tag, CAST(c.c_custkey AS VARCHAR) AS join_key,
           COALESCE(t.n_orders, 0) AS n_orders,
           COALESCE(t.spend, 0.0) AS amount
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               {sql_money_sum('o_totalprice')} AS spend
        FROM orders GROUP BY o_custkey
    ) t ON c.c_custkey = t.o_custkey
    """,
    doc="Equi-joins (H5): 'inner_nation' = customer⋈orders⋈nation with the "
    "nation dim broadcast (small at any SF); 'left_cust' = left outer join "
    "against pre-aggregated orders with NULL→default COALESCE (also H21).",
)
def h03_joins(spark: SparkSession, sf: str) -> DataFrame:
    c, o, n = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "nation")
    inner = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum("o_totalprice").alias("amount"),
        )
        .select(
            F.lit("inner_nation").alias("tag"),
            F.col("n_name").alias("join_key"),
            "n_orders",
            "amount",
        )
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money_sum("o_totalprice").alias("spend"),
    )
    left = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        F.lit("left_cust").alias("tag"),
        F.col("c_custkey").cast("string").alias("join_key"),
        F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
        F.coalesce("spend", F.lit(0.0)).alias("amount"),
    )
    return inner.unionAll(left)


# --------------------------------------------------------------------------
# H6 — semi / anti joins
# --------------------------------------------------------------------------
@query(
    "h05_semi_anti_join",
    oracle="""
    SELECT 'semi' AS tag, CAST(NULL AS BIGINT) AS c_custkey,
           c_mktsegment AS label, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'anti' AS tag, c_custkey, c_name AS label, CAST(NULL AS BIGINT) AS n
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-semi join = EXISTS ('semi' branch) and left-anti = NOT EXISTS "
    "('anti' branch) (H6).",
)
def h05_semi_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("semi").alias("tag"),
            F.lit(None).cast("long").alias("c_custkey"),
            F.col("c_mktsegment").alias("label"),
            "n",
        )
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("tag"),
        "c_custkey",
        F.col("c_name").alias("label"),
        F.lit(None).cast("long").alias("n"),
    )
    return semi.unionAll(anti)


# --------------------------------------------------------------------------
# H7 — non-equi (range) join
# --------------------------------------------------------------------------
@query(
    "h07_range_join",
    oracle=f"""
    SELECT b.band_id,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           {sql_money_sum('p.p_retailprice')} AS band_value
    FROM part p
    JOIN (SELECT unnest(range(8)) AS band_id) b
      ON p.p_retailprice >= 898 + b.band_id * 13
     AND p.p_retailprice <  898 + (b.band_id + 1) * 13
    GROUP BY b.band_id
    """,
    doc="Theta join of part against generated price bands (H7). The band side is "
    "broadcast so the range join never shuffles the big side.",
)
def h07_range_join(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    bands = spark.range(0, 8).select(F.col("id").alias("band_id"))
    # Bands span the testdata's actual retailprice range (900-1000) so the
    # declared witness populates every band, not a single group.
    cond = (p.p_retailprice >= 898 + bands.band_id * 13) & (
        p.p_retailprice < 898 + (bands.band_id + 1) * 13
    )
    return (
        p.join(broadcast(bands), cond)
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _money_sum("p_retailprice").alias("band_value"),
        )
    )


# --------------------------------------------------------------------------
# H8 — hash aggregation: TPC-H Q1 (flagship)
# --------------------------------------------------------------------------
TPCH_Q1_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_money_sum('l_quantity')} AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_charge,
           {sql_money_avg('l_quantity')} AS avg_qty,
           {sql_money_avg('l_extendedprice')} AS avg_price,
           {sql_money_avg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@query(
    "h08_agg_tpch_q1",
    oracle=TPCH_Q1_ORACLE,
    doc="TPC-H Q1: multi-measure hash aggregation with map-side partials (H8). "
    "Flagship query; cents-quantized sums are bit-exact across engines.",
)
def h08_agg_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    l = T(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum("l_quantity").alias("sum_qty"),
            _money_sum("l_extendedprice").alias("sum_base_price"),
            (F.sum(F.round(disc_price * 100).cast("long")) / 100.0).alias("sum_disc_price"),
            (F.sum(F.round(charge * 100).cast("long")) / 100.0).alias("sum_charge"),
            _money_avg("l_quantity").alias("avg_qty"),
            _money_avg("l_extendedprice").alias("avg_price"),
            _money_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# H8b — TPC-H Q3 shape: selective dim filter → fact join → top-k by revenue
# --------------------------------------------------------------------------
@query(
    "h08b_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (H8+H14): segment-filtered customers join orders join "
    "lineitem, cents-exact revenue, top-10. l_orderkey in the sort key makes "
    "the LIMIT deterministic across engines.",
)
def h08b_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(F.to_date("o_orderdate") < F.lit("1995-03-15").cast("date"))
    l = T(spark, sf, "lineitem").filter(F.to_date("l_shipdate") > F.lit("1995-03-15").cast("date"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg((F.sum(F.round(revenue * 100).cast("long")) / 100.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# H8c — TPC-H Q5 shape: star join through region→nation with co-nation
# supplier condition, revenue per nation
# --------------------------------------------------------------------------
@query(
    "h08c_tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1995-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (H5/H8): six-table star join — region/nation broadcast, "
    "order-year window shifted to the testdata date range (orders start 1995) "
    "so the declared witness is non-empty, "
    "co-nation supplier equi-condition folded into the join keys, cents-exact "
    "revenue per nation.",
)
def h08c_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    r = T(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = T(spark, sf, "nation")
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-01-01").cast("date"))
    )
    l = T(spark, sf, "lineitem")
    s = T(spark, sf, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        broadcast(r.join(n, n.n_regionkey == r.r_regionkey))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast(s),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg((F.sum(F.round(revenue * 100).cast("long")) / 100.0).alias("revenue"))
    )


# --------------------------------------------------------------------------
# H9 — ROLLUP / CUBE / GROUPING SETS, one tagged result
# --------------------------------------------------------------------------
_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM {table}
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query(
    "h09_grouping_ops",
    oracle=f"""
    SELECT 'rollup' AS tag, r.r_name AS d1, n.n_name AS d2,
           CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS g1,
           CAST(NULL AS BIGINT) AS g2,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o.o_totalprice')} AS amount
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    UNION ALL
    SELECT 'cube' AS tag, o_orderstatus AS d1, o_orderpriority AS d2,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g1,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g2,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(NULL AS DOUBLE) AS amount
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets' AS tag, o_orderstatus AS d1, o_orderpriority AS d2,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g1,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g2,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(NULL AS DOUBLE) AS amount
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Multidimensional grouping (H9), one tagged result: 'rollup' = "
    "region→nation hierarchy with combined grouping_id; 'cube' = (status, "
    "priority) with per-column GROUPING flags (engine-neutral bit order); "
    "'gsets' = explicit GROUPING SETS executed as the IDENTICAL SQL text on "
    "Spark SQL and the DuckDB oracle (H22 SQL-surface parity).",
)
def h09_grouping_ops(spark: SparkSession, sf: str) -> DataFrame:
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    n, r = T(spark, sf, "nation"), T(spark, sf, "region")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rollup = j.rollup("r_name", "n_name").agg(
        F.grouping_id().cast("long").alias("g1"),
        F.count(F.lit(1)).alias("n_orders"),
        _money_sum("o_totalprice").alias("amount"),
    ).select(
        F.lit("rollup").alias("tag"),
        F.col("r_name").alias("d1"),
        F.col("n_name").alias("d2"),
        "g1",
        F.lit(None).cast("long").alias("g2"),
        "n_orders",
        "amount",
    )
    cube = o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g1"),
        F.grouping("o_orderpriority").cast("long").alias("g2"),
        F.count(F.lit(1)).alias("n_orders"),
    ).select(
        F.lit("cube").alias("tag"),
        F.col("o_orderstatus").alias("d1"),
        F.col("o_orderpriority").alias("d2"),
        "g1",
        "g2",
        "n_orders",
        F.lit(None).cast("double").alias("amount"),
    )
    T(spark, sf, "orders").createOrReplaceTempView("orders_gsets")
    gsets = spark.sql(_GROUPING_SETS_SQL.format(table="orders_gsets")).select(
        F.lit("gsets").alias("tag"),
        F.col("o_orderstatus").alias("d1"),
        F.col("o_orderpriority").alias("d2"),
        F.col("g_status").alias("g1"),
        F.col("g_prio").alias("g2"),
        "n_orders",
        F.lit(None).cast("double").alias("amount"),
    )
    return rollup.unionAll(cube).unionAll(gsets)


# --------------------------------------------------------------------------
# H2 — sink: CTAS-style write + read-back
# --------------------------------------------------------------------------
@query(
    "h02b_ctas_sink",
    oracle=f"""
    SELECT 'ctas' AS tag, o_orderstatus AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           {{money}} AS total
    FROM orders
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'export', 'docs',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(SUM(n_chars) AS DOUBLE) FROM documents)
    UNION ALL
    SELECT 'export', 'shards', 8, CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'zorder', 'docs',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(SUM(n_chars) AS DOUBLE) FROM documents)
    UNION ALL
    SELECT 'bucketed', 'rows',
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           (SELECT {{money_o}}
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'packing', 'docs',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(SUM(n_chars) AS DOUBLE) FROM documents)
    UNION ALL
    SELECT 'packing', 'overfull', 0, CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'merge', 'docs',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(SUM(n_chars) AS DOUBLE) FROM documents)
           - (SELECT CAST(SUM(n_chars) AS DOUBLE) FROM
              (SELECT n_chars FROM documents ORDER BY doc_id LIMIT 5))
           + 150.0
    UNION ALL
    SELECT 'jsonl', 'docs',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(SUM(n_chars) AS DOUBLE) FROM documents)
    UNION ALL
    SELECT 'jsonl', 'textfp',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
                   AS DOUBLE) FROM documents)
    UNION ALL
    SELECT 'wds', 'docs',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           (SELECT CAST(SUM(octet_length(encode(text))) AS DOUBLE) FROM documents)
    """.format(
        money=sql_money_sum("o_totalprice"), money_o=sql_money_sum("o.o_totalprice")
    ),
    doc="Write-side paths (H2 + the lakehouse layout operators), tagged "
    "branches over (tag, k, n, total), each a write-then-read-back round "
    "trip through our own sinks: 'ctas' = orders materialized to parquet "
    "and re-aggregated (every value preserved exactly); 'export' = "
    "deterministic 8-shard training export (operators/export.py — "
    "read-back totals prove no row lost or duplicated; 'shards' pins all "
    "8 shard directories non-empty, a literal-oracle invariant; byte-"
    "stable ordering is pinned in tests/test_export.py); 'zorder' = "
    "documents rewritten along the (n_chars, doc_id) Morton curve "
    "(operators/zorder.py — read-back totals prove the layout pass is "
    "row-preserving; pruning quantified in tests/test_zorder.py); "
    "'bucketed' = orders and customer written as co-located 8-bucket "
    "tables (operators/bucketing.py), joined catalog-side — count and "
    "money sum must equal the plain join (zero-Exchange plan pinned in "
    "tests/test_bucketing.py); 'packing' = FFD sequence packing of "
    "documents into 2048-char windows (operators/packing.py — 'docs' "
    "proves every doc packed exactly once with its token count intact, "
    "'overfull' pins zero non-truncated sequences over capacity, a "
    "literal-oracle invariant; occupancy/determinism in "
    "tests/test_packing.py); 'merge' = keyed MERGE into the shard layout "
    "(operators/merge.py): patch the 3 lowest doc_ids to n_chars=42, "
    "delete the next 2, insert 2 new docs (11+13 chars), then read the "
    "merged table back — count is unchanged (-2+2) and the n_chars total "
    "moves by exactly the SQL-computed delta, proving replaced rows "
    "vanished, deletes removed, inserts landed (byte-identity to a fresh "
    "export of the merged set in tests/test_merge.py); 'jsonl' = the "
    "deterministic export written as JSONL (format='json': one object "
    "per line, the training-data interchange format) and read back — "
    "'docs' proves no row lost or duplicated, 'textfp' an md5-prefix "
    "sum over the read-back text equal to the oracle's sum over the "
    "source table, proving every document survives JSON string "
    "escaping byte-for-byte; 'wds' = WebDataset tar-shard export "
    "(export_webdataset: byte-stable tars, deterministic membership "
    "and in-tar order, temp-then-rename publish via pyarrow.fs) read "
    "back through a real untar (binaryFile + tarfile mapInPandas) — "
    "entry count and utf-8 byte totals must equal the source table's.",
)
def h02b_ctas_sink(spark: SparkSession, sf: str) -> DataFrame:
    import os
    from concurrent.futures import ThreadPoolExecutor

    from sheetreader_duckdb_spark.operators.bucketing import write_bucketed
    from sheetreader_duckdb_spark.operators.export import export_shards
    from sheetreader_duckdb_spark.operators.packing import pack_sequences
    from sheetreader_duckdb_spark.operators.zorder import zorder_sort

    tag = sf.strip("/").replace("/", "_")
    # pid-suffixed sink base (ADVICE r14): two h02b invocations in
    # different processes (pair workers, or pair_ab.py racing bench.py)
    # must not overwrite/read-back each other's sink dirs; within one
    # process the path is stable so repeated passes reuse it. The suffix
    # turns the old overwrite-in-place into one dir PER PROCESS, so the
    # process removes its own dir at exit (r15 review: bench/pytest/verify
    # runs otherwise accumulate corpus-sized sinks until /tmp fills).
    base = f"/tmp/sheetreader_ctas/{tag}_{os.getpid()}"
    if base not in _CTAS_CLEANUP:
        import atexit
        import shutil

        _CTAS_CLEANUP.add(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    nil_d = F.lit(None).cast("double")

    def one_row(df: DataFrame, tag_v: str, k_v: str, n_col, total_col) -> DataFrame:
        return df.agg(n_col.alias("n"), total_col.alias("total")).select(
            F.lit(tag_v).alias("tag"), F.lit(k_v).alias("k"), "n", "total"
        )

    docs = T(spark, sf, "documents").select("doc_id", "n_chars")

    # The eight write paths are INDEPENDENT (distinct output dirs/tables,
    # no cross-reads), so their construct-time jobs run from a small
    # thread pool and back-fill each other's stragglers instead of paying
    # eight sequential job tails (guide §2.6 overlap; measured 7.4 s
    # sequential construct at r13). Each thunk returns its branch
    # frame(s); the union below keeps the exact former order, so the
    # result multiset — and the oracle hash — are unchanged.

    def b_ctas() -> list[DataFrame]:
        # 'ctas' — plain parquet CTAS round trip.
        T(spark, sf, "orders").write.mode("overwrite").parquet(f"{base}/orders")
        return [
            spark.read.parquet(f"{base}/orders")
            .groupBy(F.col("o_orderstatus").alias("k"))
            .agg(F.count(F.lit(1)).alias("n"), _money_sum("o_totalprice").alias("total"))
            .select(F.lit("ctas").alias("tag"), "k", "n", "total")
        ]

    def b_export() -> list[DataFrame]:
        # 'export' — deterministic sharded export, then read the shards back.
        export_shards(docs, "doc_id", 8, f"{base}/export", seed="export")
        back = spark.read.parquet(f"{base}/export")
        return [
            one_row(back, "export", "docs", F.count(F.lit(1)),
                    F.sum("n_chars").cast("double")),
            one_row(back, "export", "shards", F.count_distinct("shard"), nil_d),
        ]

    def b_zorder() -> list[DataFrame]:
        # 'zorder' — Morton-ordered rewrite of documents, read-back totals.
        zorder_sort(docs, ["n_chars", "doc_id"], bits=8).write.mode(
            "overwrite"
        ).parquet(f"{base}/zorder")
        return [
            one_row(
                spark.read.parquet(f"{base}/zorder"),
                "zorder",
                "docs",
                F.count(F.lit(1)),
                F.sum("n_chars").cast("double"),
            )
        ]

    def b_bucketed() -> list[DataFrame]:
        # 'bucketed' — co-located bucketed fact layout; the join runs
        # catalog-side. (Catalog identifiers cannot contain '.', unlike
        # the /tmp dir tag.)
        ident = tag.replace(".", "_")
        to = f"h02b_orders_{ident}"
        tc = f"h02b_customer_{ident}"
        write_bucketed(
            T(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
            to, "o_custkey", 8, sort_by="o_custkey", path=f"{base}/bk_orders",
        )
        write_bucketed(
            T(spark, sf, "customer").select("c_custkey"),
            tc, "c_custkey", 8, sort_by="c_custkey", path=f"{base}/bk_customer",
        )
        joined = spark.table(to).join(
            spark.table(tc), F.col("o_custkey") == F.col("c_custkey")
        )
        return [
            one_row(joined, "bucketed", "rows", F.count(F.lit(1)),
                    _money_sum("o_totalprice"))
        ]

    def b_packing() -> list[DataFrame]:
        # 'packing' — FFD sequence packing over (doc_id, n_chars as token
        # count). Lazy (no write) — runs inline at union time.
        packed = pack_sequences(
            docs, "doc_id", F.col("n_chars"), seq_len=2048, n_buckets=8
        )
        seqs = packed.groupBy("seq_id").agg(
            F.sum("n_tokens").alias("fill"), F.max("truncated").alias("any_trunc")
        )
        return [
            one_row(packed, "packing", "docs", F.count(F.lit(1)),
                    F.sum("n_tokens").cast("double")),
            one_row(
                seqs.filter((F.col("fill") > 2048) & ~F.col("any_trunc")),
                "packing",
                "overfull",
                F.count(F.lit(1)),
                nil_d,
            ),
        ]

    def b_merge() -> list[DataFrame]:
        # 'merge' — keyed MERGE into a sharded copy of documents: patch the
        # 3 lowest ids, delete the next 2, insert 2 new docs; the read-back
        # totals must land exactly on the SQL-computed delta. The 5-id
        # collect is bounded prep (LIMIT 5), mirrored literally by the
        # oracle's ORDER BY doc_id LIMIT 5.
        from sheetreader_duckdb_spark.operators.merge import (
            merge_into_shards,
            read_shards,
        )

        mt = f"{base}/merge_tbl"
        export_shards(docs, "doc_id", 8, mt, seed="export")
        low5 = [r[0] for r in docs.orderBy("doc_id").limit(5).collect()]
        changes = spark.createDataFrame(
            [(low5[0], 42, False), (low5[1], 42, False), (low5[2], 42, False),
             (low5[3], 0, True), (low5[4], 0, True),
             (9_000_001, 11, False), (9_000_002, 13, False)],
            "doc_id long, n_chars long, is_delete boolean",
        )
        merge_into_shards(
            spark, changes, "doc_id", mt, 8, seed="export", delete_col="is_delete"
        )
        return [
            one_row(
                read_shards(spark, mt),
                "merge",
                "docs",
                F.count(F.lit(1)),
                F.sum("n_chars").cast("double"),
            )
        ]

    def b_jsonl() -> list[DataFrame]:
        # 'jsonl' — deterministic JSONL export (the training-data
        # interchange format): export_shards with format='json' (Spark's
        # json sink writes one JSON object per line = JSONL), read back
        # with an explicit schema; 'docs' proves no row lost or
        # duplicated, 'textfp' proves every text survives JSON string
        # escaping byte-for-byte (md5-prefix sum vs the source table —
        # the oracle computes the same sum straight from documents;
        # md5-prefix sums stay < 2^53, exact in the DOUBLE witness
        # column).
        jdocs = T(spark, sf, "documents").select("doc_id", "text", "n_chars")
        export_shards(jdocs, "doc_id", 4, f"{base}/jsonl", seed="jsonl", format="json")
        jback = spark.read.schema("doc_id long, text string, n_chars long").json(
            f"{base}/jsonl"
        )
        from sheetreader_duckdb_spark.functions import md5_prefix_long

        jfp = md5_prefix_long("text")
        return [
            one_row(jback, "jsonl", "docs", F.count(F.lit(1)),
                    F.sum("n_chars").cast("double")),
            one_row(
                jback.select(jfp.alias("__fp")),
                "jsonl",
                "textfp",
                F.count(F.lit(1)),
                F.sum("__fp").cast("double"),
            ),
        ]

    def b_wds() -> list[DataFrame]:
        # 'wds' — WebDataset tar-shard export (operators/export.py
        # export_webdataset), read back through a REAL untar: binaryFile
        # scan of the shard tars + a mapInPandas tarfile pass emitting one
        # row per entry. Witness: entry count == documents count and the
        # byte total == the oracle's sum of utf-8 text lengths — proving
        # every document landed in exactly one tar with its exact bytes.
        from sheetreader_duckdb_spark.operators.export import export_webdataset

        export_webdataset(
            T(spark, sf, "documents").select("doc_id", "text"),
            "doc_id", 4, f"{base}/wds", [("txt", "text")], seed="wds",
        )

        def _untar(batches):
            import io
            import tarfile

            import pandas as pd

            for pdf in batches:
                names, sizes = [], []
                for blob in pdf["content"]:
                    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as t:
                        for m in t.getmembers():
                            names.append(m.name)
                            sizes.append(m.size)
                yield pd.DataFrame({"name": names, "size": sizes})

        entries = (
            spark.read.format("binaryFile")
            .load(f"{base}/wds/shard-*.tar")
            .select("content")
            .mapInPandas(_untar, "name string, size long")
        )
        return [
            one_row(entries, "wds", "docs", F.count(F.lit(1)),
                    F.sum("size").cast("double"))
        ]

    thunks = [b_ctas, b_export, b_zorder, b_bucketed, b_packing, b_merge,
              b_jsonl, b_wds]
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(lambda t: t(), thunks))
    branches = [frame for frames in results for frame in frames]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


# --------------------------------------------------------------------------
# H10 — statistical aggregates
# --------------------------------------------------------------------------
@query(
    "h10_stats_agg",
    oracle=f"""
    SELECT l_returnflag,
           {sql_round_fixed('stddev_samp(l_quantity)', 6)} AS sd_qty,
           {sql_round_fixed('var_pop(l_quantity)', 6)} AS var_qty,
           {sql_round_fixed('corr(l_quantity, l_extendedprice)', 6)} AS corr_qty_price,
           {sql_round_fixed('median(l_quantity)', 6)} AS med_qty,
           {sql_round_fixed('quantile_cont(l_discount, 0.9)', 6)} AS p90_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="stddev/variance/corr + exact interpolated median/quantile (H10).",
)
def h10_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    l = T(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        round_fixed(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        round_fixed(F.var_pop("l_quantity"), 6).alias("var_qty"),
        round_fixed(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        round_fixed(F.median("l_quantity"), 6).alias("med_qty"),
        round_fixed(F.percentile("l_discount", 0.9), 6).alias("p90_disc"),
    )


# --------------------------------------------------------------------------
# H11 — approx_count_distinct (sketches differ across engines → rows-only)
# --------------------------------------------------------------------------
# H11 is declared inside northstar's nx_scale_variants union (the driver
# caps CORRECTNESS at 50 rows; all rows-only scale variants share one row).
def h11_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    l = T(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


# --------------------------------------------------------------------------
# H12 — window functions
# --------------------------------------------------------------------------
@query(
    "h12_window_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS rk,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS drk,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
           lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
           lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS run_total,
           CAST(COUNT(*) OVER (
                PARTITION BY o_custkey
                ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT)
                RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_band,
           CAST(first_value(o_orderkey) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS first_order,
           CAST(last_value(o_orderkey) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS last_order
    FROM orders
    """,
    doc="row_number/rank/dense_rank/ntile/lag/lead, running sum with explicit "
    "ROWS frame, RANGE frame over integer-cents values (orders within $1000 "
    "below, per customer), first/last_value with explicit full frame — all "
    "with deterministic tiebreaks (H12). Every window is keyed by o_custkey "
    "so every WindowExec is partitioned; the global-order forms live in "
    "h12c, computed scale-safe.",
)
def h12_window_functions(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    by_key = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    by_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    per_key_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    running = by_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price_c = F.round(F.col("o_totalprice") * 100).cast("long")
    w_range = Window.partitionBy("o_custkey").orderBy(price_c).rangeBetween(-100000, 0)
    w_order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(by_price).cast("long").alias("rn"),
        F.rank().over(by_date).cast("long").alias("rk"),
        F.dense_rank().over(by_date).cast("long").alias("drk"),
        F.ntile(4).over(per_key_price).cast("long").alias("quartile"),
        F.lag("o_totalprice").over(by_key).alias("prev_price"),
        F.lead("o_totalprice").over(by_key).alias("next_price"),
        (F.sum(cents("o_totalprice")).over(running) / 100.0).alias("run_total"),
        F.count(F.lit(1)).over(w_range).alias("n_in_band"),
        F.first("o_orderkey").over(w_order).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


# --------------------------------------------------------------------------
# H12c — GLOBAL ranking, distributed. Spark's Window.orderBy with no
# partitionBy funnels the whole table into one task; this query computes the
# same answer via operators.ranking (range-partitioned local ranks +
# broadcast cumulative offsets + arithmetic ntile) — no single-partition
# WindowExec in the physical plan.
# --------------------------------------------------------------------------
@query(
    "h12c_global_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
           CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
    FROM orders
    """,
    doc="Global row_number + ntile(4) over all orders, computed scale-safe: "
    "range partition on the sort key, per-partition ranks, broadcast "
    "cumulative offsets, closed-form ntile from (rank, total) (H12).",
)
def h12c_global_ntile(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.operators.ranking import with_global_ntile

    o = T(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    r = with_global_ntile(
        o,
        ["o_totalprice", "o_orderkey"],
        n_tiles=4,
        tile_col="quartile",
        rank_col="rn",
    )
    return r.select("o_orderkey", "rn", "quartile")


# --------------------------------------------------------------------------
# H13/H14 — sort + limit (top-k), both tables in one tagged result
# --------------------------------------------------------------------------
@query(
    "h13_sort_topk",
    oracle="""
    SELECT 'lineitem100' AS tag, k1, k2, val FROM (
        SELECT l_orderkey AS k1, l_linenumber AS k2, l_extendedprice AS val
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100)
    UNION ALL
    SELECT 'orders10' AS tag, k1, k2, val FROM (
        SELECT o_orderkey AS k1, o_custkey AS k2, o_totalprice AS val
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10)
    """,
    doc="Multi-key ORDER BY + LIMIT → TakeOrderedAndProject, no full sort "
    "(H13/H14): top-100 lineitems by price and top-10 orders, each with "
    "unique tiebreak keys so the k-sets are deterministic.",
)
def h13_sort_topk(spark: SparkSession, sf: str) -> DataFrame:
    l = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    li = (
        l.select(
            F.col("l_orderkey").alias("k1"),
            F.col("l_linenumber").alias("k2"),
            F.col("l_extendedprice").alias("val"),
        )
        .orderBy(F.col("val").desc(), F.col("k1").asc(), F.col("k2").asc())
        .limit(100)
        .select(F.lit("lineitem100").alias("tag"), "k1", "k2", "val")
    )
    od = (
        o.select(
            F.col("o_orderkey").alias("k1"),
            F.col("o_custkey").alias("k2"),
            F.col("o_totalprice").alias("val"),
        )
        .orderBy(F.col("val").desc(), F.col("k1").asc())
        .limit(10)
        .select(F.lit("orders10").alias("tag"), "k1", "k2", "val")
    )
    return li.unionAll(od)


# --------------------------------------------------------------------------
# H15 — set operations
# --------------------------------------------------------------------------
@query(
    "h15_set_ops",
    oracle="""
    SELECT 'both' AS tag, nk FROM (
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS tag, nk FROM (
        SELECT c_nationkey AS nk FROM customer
        EXCEPT
        SELECT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT 'supp_only' AS tag, nk FROM (
        SELECT s_nationkey AS nk FROM supplier
        EXCEPT
        SELECT c_nationkey AS nk FROM customer)
    """,
    doc="INTERSECT / EXCEPT / UNION ALL over nation keys (H15).",
)
def h15_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    cust_only = c.subtract(s).withColumn("tag", F.lit("cust_only"))
    supp_only = s.subtract(c).withColumn("tag", F.lit("supp_only"))
    return both.unionByName(cust_only).unionByName(supp_only).select("tag", "nk")


# --------------------------------------------------------------------------
# H16/H18 — scalar string + math functions, one wide projection over part
# --------------------------------------------------------------------------
@query(
    "h16_scalar_functions",
    oracle=f"""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           substr(p_name, 1, 10) AS prefix10,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, ' ', '_') AS snake,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           concat_ws('|', p_brand, p_type) AS brand_type,
           trim(p_type) AS ttype,
           {sql_round_fixed('sqrt(p_retailprice)', 6)} AS sqrt_price,
           {sql_round_fixed('ln(p_retailprice)', 6)} AS ln_price,
           CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
           CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
           abs(p_size - 25) AS size_dev,
           p_partkey % 7 AS k7,
           {sql_round_fixed('pow(p_retailprice, 2)', 4)} AS price_sq
    FROM part
    """,
    doc="Scalar expression surface in one scan-speed projection: "
    "lower/upper/trim/substr/replace/length/split/concat_ws (H16) and "
    "round/floor/ceil/abs/sqrt/ln/pow/modulo (H18); libm outputs rounded "
    "to kill last-ulp cross-engine drift.",
)
def h16_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    p = T(spark, sf, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_name", 1, 10).alias("prefix10"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("snake"),
        words.getItem(0).alias("first_word"),
        F.size(words).cast("long").alias("n_words"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_type")).alias("ttype"),
        round_fixed(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        round_fixed(F.log("p_retailprice"), 6).alias("ln_price"),
        F.floor("p_retailprice").alias("floor_price"),
        F.ceil("p_retailprice").alias("ceil_price"),
        F.abs(F.col("p_size") - F.lit(25)).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("k7"),
        round_fixed(F.pow("p_retailprice", F.lit(2.0)), 4).alias("price_sq"),
    )


# --------------------------------------------------------------------------
# H17 — date/time functions
# --------------------------------------------------------------------------
@query(
    "h17_date_functions",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS month_revenue,
           MIN(CAST(o_orderdate AS DATE)) AS first_day,
           MAX(CAST(o_orderdate AS DATE)) AS last_day,
           CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS span_days
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
    doc="date_trunc bucketing, date casts, datediff — session TZ pinned UTC (H17).",
)
def h17_date_functions(spark: SparkSession, sf: str) -> DataFrame:
    o = T(spark, sf, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money_sum("o_totalprice").alias("month_revenue"),
            F.min(F.to_date("o_orderdate")).alias("first_day"),
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.datediff(F.max(F.to_date("o_orderdate")), F.min(F.to_date("o_orderdate")))
            .cast("long")
            .alias("span_days"),
        )
    )


# --------------------------------------------------------------------------
# H19 — array functions over embeddings
# --------------------------------------------------------------------------
@query(
    "h19_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           {sum_sq_sql} AS sum_sq
    FROM embeddings
    """.format(
        sum_sq_sql=sql_round_fixed(
            "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))", 6
        )
    ),
    doc="Array size/index/max + higher-order transform/aggregate fold (H19). "
    "Per-list left-to-right double fold is order-deterministic in both engines.",
)
def h19_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings")
    sum_sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        round_fixed(sum_sq, 6).alias("sum_sq"),
    )


@query(
    "h19b_array_explode",
    oracle="""
    SELECT e.label, i.i AS pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(CAST(e.embedding[i.i + 1] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0 AS sum_v
    FROM embeddings e
    CROSS JOIN (SELECT unnest(range(4)) AS i) i
    GROUP BY e.label, i.i
    """,
    doc="posexplode of the first 4 embedding positions + quantized exact sums "
    "per (label, position) (H19).",
)
def h19b_array_explode(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings")
    exploded = e.select("label", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "v"))
    return (
        exploded.groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("v").cast("double") * 1000000).cast("long")) / 1000000.0).alias("sum_v"),
        )
    )


# --------------------------------------------------------------------------
# H20 — JSON extraction over events.props
# --------------------------------------------------------------------------
@query(
    "h20_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="get_json_object ↔ json_extract_string over the events.props JSON column (H20).",
)
def h20_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# H21 — CASE / CAST / COALESCE / NULLIF
# --------------------------------------------------------------------------
@query(
    "h21_conditional",
    oracle=f"""
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_money_sum('c_acctbal')} AS total_bal,
           CAST(COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS BIGINT) AS non_building
    FROM customer
    GROUP BY CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END
    """,
    doc="CASE WHEN bucketing, NULLIF inside COUNT (H21).",
)
def h21_conditional(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.withColumn("bal_bucket", bucket)
        .groupBy("bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _money_sum("c_acctbal").alias("total_bal"),
            F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias("non_building"),
        )
    )


# --------------------------------------------------------------------------
# H22 — CTE + (de)correlated subqueries
# --------------------------------------------------------------------------
@query(
    "h22_cte_subquery",
    oracle=f"""
    WITH nation_avg AS (
        SELECT c_nationkey, {sql_money_avg('c_acctbal')} AS avg_bal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.avg_bal
    FROM customer c
    JOIN nation_avg n ON c.c_nationkey = n.c_nationkey
    WHERE c.c_acctbal > n.avg_bal
      AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="CTE + comparison against per-group aggregate + correlated EXISTS; Spark "
    "expresses the decorrelated plan directly (H22).",
)
def h22_cte_subquery(spark: SparkSession, sf: str) -> DataFrame:
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    avgs = c.groupBy(F.col("c_nationkey").alias("nk")).agg(_money_avg("c_acctbal").alias("avg_bal"))
    return (
        c.join(avgs, c.c_nationkey == avgs.nk)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal", "avg_bal")
    )


# --------------------------------------------------------------------------
# H23 — vectorized (Arrow) pandas UDF
# --------------------------------------------------------------------------
@query(
    "h23_pandas_udf",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           n_chars / (CAST(len(string_split(text, ' ')) AS BIGINT) + 1) AS chars_per_token
    FROM documents
    """,
    doc="Scalar pandas UDF (Arrow-batched, the fast Python path) computing "
    "token counts; oracle expresses the same arithmetic in SQL (H23).",
)
def h23_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark.functions.udfs import whitespace_token_count

    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        whitespace_token_count("text").alias("n_tokens"),
        (F.col("n_chars") / (whitespace_token_count("text") + 1)).alias("chars_per_token"),
    )
