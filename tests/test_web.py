"""URL canonicalization + per-domain caps (operators/web.py): Spark
expression vs hand-computed canonical forms, DuckDB twin bit-parity
(both generated from the same frozen rule tables), registrable-domain
heuristic, and per_domain_cap determinism/bound properties."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import web as W

# (raw, canonical) — hand-derived against the documented rules.
CASES = [
    ("https://WWW.Example.COM/path", "https://www.example.com/path"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com#frag", "https://example.com/"),
    ("https://example.com/p?utm_source=x&b=2&a=1", "https://example.com/p?a=1&b=2"),
    ("https://example.com/p?UTM_Campaign=z", "https://example.com/p"),
    ("https://example.com/p?fbclid=abc&x=1#sec", "https://example.com/p?x=1"),
    ("https://example.com/p?gclid=1&ref=home", "https://example.com/p"),
    ("HTTPS://example.com/Case/Kept?Q=V", "https://example.com/Case/Kept?Q=V"),
    ("https://user:pw@example.com/a", "https://example.com/a"),
    ("https://example.com/p?x=a?b", "https://example.com/p?x=a?b"),
    ("https://example.com/p?&&a=1", "https://example.com/p?a=1"),
    ("https://sub.shop.co.uk/item?a=1", "https://sub.shop.co.uk/item?a=1"),
    ("http://h?a=1", "http://h/?a=1"),
]

DOMAINS = [
    ("www.example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    ("shop.co.uk", "shop.co.uk"),
    ("www.shop.co.uk", "shop.co.uk"),
    ("deep.www.shop.co.uk", "shop.co.uk"),
    ("example.com.au", "example.com.au"),
    ("localhost", "localhost"),
    ("co.uk", "co.uk"),
]


def test_normalize_matches_fixtures(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "id int, url string"
    )
    got = {
        r.id: r.n
        for r in df.select(
            "id", W.normalize_url_expr(F.col("url")).alias("n")
        ).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, u


def test_duckdb_twin_parity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "id int, url string"
    )
    spark_n = {
        r.id: r.n
        for r in df.select(
            "id", W.normalize_url_expr(F.col("url")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    urls = [u for u, _ in CASES]
    duck = con.execute(
        f"SELECT id, {W.normalize_url_sql('url')} FROM "
        "(SELECT unnest(range(?)) AS id, unnest(?) AS url)",
        [len(urls), urls],
    ).fetchall()
    for i, n in duck:
        assert n == spark_n[i] == CASES[i][1], CASES[i][0]
    hosts = [h for h, _ in DOMAINS]
    duck_d = con.execute(
        f"SELECT id, {W.registrable_domain_sql('h')} FROM "
        "(SELECT unnest(range(?)) AS id, unnest(?) AS h)",
        [len(hosts), hosts],
    ).fetchall()
    for i, d in duck_d:
        assert d == DOMAINS[i][1], DOMAINS[i][0]


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(DOMAINS)], "id int, host string"
    )
    got = {
        r.id: r.d
        for r in df.select(
            "id", W.registrable_domain_expr(F.col("host")).alias("d")
        ).collect()
    }
    for i, (h, want) in enumerate(DOMAINS):
        assert got[i] == want, h


def test_host_expr_and_sql(spark):
    urls = [
        "https://User@WWW.Shop.CO.UK:8443/x?y#z",
        "http://plain.org",
        "https://h:443/",
    ]
    want = ["www.shop.co.uk", "plain.org", "h"]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id int, url string"
    )
    got = {
        r.id: r.h
        for r in df.select("id", W.url_host_expr(F.col("url")).alias("h")).collect()
    }
    assert [got[i] for i in range(3)] == want
    duck = duckdb.connect().execute(
        f"SELECT id, {W.url_host_sql('url')} FROM "
        "(SELECT unnest(range(?)) AS id, unnest(?) AS url)",
        [len(urls), urls],
    ).fetchall()
    assert [h for _, h in sorted(duck)] == want


def test_per_domain_cap_bound_and_determinism(spark):
    rows = []
    rid = 0
    for dom, n in (("big.com", 40), ("mid.co.uk", 7), ("small.org", 2)):
        for j in range(n):
            rows.append((rid, f"https://www.{dom}/p{j}?utm_source=x"))
            rid += 1
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = W.per_domain_cap(df, "url", 5, "doc_id", keep_rank=True)
    got = capped.groupBy("domain").count().collect()
    counts = {r.domain: r["count"] for r in got}
    assert counts == {"big.com": 5, "mid.co.uk": 5, "small.org": 2}
    ids1 = sorted(r.doc_id for r in capped.collect())
    # determinism under different physical partitioning
    ids2 = sorted(
        r.doc_id
        for r in W.per_domain_cap(
            df.repartition(7), "url", 5, "doc_id"
        ).collect()
    )
    assert ids1 == ids2
    assert all(r.domain_rank <= 5 for r in capped.collect())


def test_per_domain_cap_plan_has_window_group_limit(spark):
    """The boundedness claim is a plan contract, not prose: Spark must
    rewrite the rank filter into WindowGroupLimit (map-side partial +
    reduce-side final), which bounds per-domain state at the cap. A
    Spark upgrade that stops inferring it should fail here, not at
    100 TB."""
    df = spark.createDataFrame(
        [(i, f"https://ex{i % 3}.com/p{i}") for i in range(30)],
        "doc_id long, url string",
    )
    plan = (
        W.per_domain_cap(df, "url", 5, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial (pre-shuffle) and final: both sides bounded
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_per_domain_cap_rejects_cap_above_threshold(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "https://a.com/x")], "doc_id long, url string"
    )
    threshold = int(
        spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold")
    )
    with pytest.raises(ValueError, match="windowGroupLimitThreshold"):
        W.per_domain_cap(df, "url", threshold + 1, "doc_id")
    # raising the conf re-admits the same cap
    spark.conf.set(
        "spark.sql.optimizer.windowGroupLimitThreshold", str(threshold + 10)
    )
    try:
        W.per_domain_cap(df, "url", threshold + 1, "doc_id")
    finally:
        spark.conf.set(
            "spark.sql.optimizer.windowGroupLimitThreshold", str(threshold)
        )


PSL_FIXTURE = (
    "com", "org", "uk", "co.uk", "gov.uk", "com.au", "gov.au",
    "act.gov.au", "k12.va.us",
)

PSL_DOMAINS = [
    ("www.example.com", "example.com"),
    ("deep.www.shop.co.uk", "shop.co.uk"),
    ("some.agency.act.gov.au", "agency.act.gov.au"),  # 3-label suffix wins
    ("agency.gov.au", "agency.gov.au"),
    ("school.k12.va.us", "school.k12.va.us"),  # host one label above suffix
    ("x.school.k12.va.us", "school.k12.va.us"),
    ("act.gov.au", "act.gov.au"),  # bare suffix passes through (last2 rule)
    ("localhost", "localhost"),
]


def test_user_supplied_psl_table(spark):
    """Longest-match-wins over a multi-label suffix table (the real PSL
    shape), identical on both engines, and the default table's witness
    behavior unchanged."""
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(PSL_DOMAINS)], "id int, host string"
    )
    got = {
        r.id: r.d
        for r in df.select(
            "id",
            W.registrable_domain_expr(F.col("host"), PSL_FIXTURE).alias("d"),
        ).collect()
    }
    for i, (h, want) in enumerate(PSL_DOMAINS):
        assert got[i] == want, h
    hosts = [h for h, _ in PSL_DOMAINS]
    duck = duckdb.connect().execute(
        f"SELECT id, {W.registrable_domain_sql('h', PSL_FIXTURE)} FROM "
        "(SELECT unnest(range(?)) AS id, unnest(?) AS h)",
        [len(hosts), hosts],
    ).fetchall()
    for i, d in duck:
        assert d == PSL_DOMAINS[i][1], PSL_DOMAINS[i][0]


def test_psl_table_validation():
    import pytest

    for bad in ("Co.UK", ".co.uk", "co.uk.", "", "*.ck", "!www.ck"):
        with pytest.raises(ValueError):
            W._suffix_groups([bad])
