"""URL canonicalization and per-domain corpus caps — the web-corpus
curation primitives every large crawl pipeline runs before dedup
(C4 / RefinedWeb / FineWeb lineage): normalize URLs so the same page
keys identically, group by registrable domain, and cap each domain's
contribution deterministically.

Everything is built-in string/array expressions (zero UDF, scan-speed),
and every rule table (tracking params, two-level public suffixes,
default ports) is a FROZEN module constant from which BOTH the Spark
expression and the DuckDB oracle SQL are generated — the engines cannot
desync.

Precondition: absolute http(s)-style URLs (``scheme://…``). The
normalizer does not attempt protocol-relative or relative references
(Spark's ``substring_index`` and DuckDB's ``split_part`` diverge on
absent delimiters, so the contract is explicit instead of silently
engine-dependent).

At 100 TB: normalization and domain extraction are per-row projections;
``per_domain_cap`` is one shuffle keyed by registrable domain with a
rank window — the same topology as any per-key top-k, and the cap
bounds every partition's output regardless of how skewed the crawl is
toward megadomains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "TWO_LEVEL_SUFFIXES",
    "url_host_expr",
    "normalize_url_expr",
    "registrable_domain_expr",
    "per_domain_cap",
    "normalize_url_sql",
    "registrable_domain_sql",
]

# Tracking / click-id query parameters dropped during normalization.
# Exact names plus the utm_ prefix family. Frozen: the SQL twin is
# generated from this same tuple.
TRACKING_PARAMS = (
    "fbclid",
    "gclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
    "spm",
)

# Two-level public suffixes for the registrable-domain heuristic.
# Deliberately a small frozen list, NOT the full Public Suffix List —
# documented approximation and the n10 oracle witness. A production
# deploy passes the real PSL via the ``suffixes=`` parameter of
# registrable_domain_expr / per_domain_cap (multi-label entries
# supported, longest-match-wins); both engines' expressions are
# generated from whichever table is in force.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "com.tr",
    "co.in", "co.kr", "co.za", "com.sg",
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_host_expr(url: Column) -> Column:
    """Lower-cased host of an absolute URL (fragment/query/path/port and
    userinfo stripped)."""
    nofrag = F.substring_index(url, "#", 1)
    rest = F.substring_index(nofrag, "://", -1)
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    host = F.substring_index(  # drop userinfo if present
        F.substring_index(hostport, "@", -1), ":", 1
    )
    return F.lower(host)


def _clean_query(q: Column) -> Column:
    """Drop tracking params, sort the survivors bytewise, re-join."""
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.lower(F.substring_index(p, "=", 1)).isin(*TRACKING_PARAMS)
        & ~F.lower(F.substring_index(p, "=", 1)).startswith("utm_"),
    )
    return F.array_join(F.array_sort(kept), "&")


def normalize_url_expr(url: Column) -> Column:
    """Canonical form of an absolute URL: lower-cased scheme and host,
    fragment removed, default port (80/http, 443/https) stripped, empty
    path becomes '/', tracking params (TRACKING_PARAMS + utm_*) dropped
    and the remaining query params sorted bytewise. Two URLs of the
    same page under different tracking decoration normalize equal."""
    nofrag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    rest = F.substring_index(nofrag, "://", -1)
    hostport_raw = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    hostport = F.substring_index(hostport_raw, "@", -1)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    default_port = F.when(
        scheme == "http", F.lit(_DEFAULT_PORTS["http"])
    ).when(scheme == "https", F.lit(_DEFAULT_PORTS["https"])).otherwise(F.lit(""))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    after_host = F.substring(rest, F.length(hostport_raw) + 1, 2147483647)
    path_raw = F.substring_index(after_host, "?", 1)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    # everything after the FIRST '?' (a query may legally embed '?');
    # substring_index(..., -1) would split on the last one.
    query = F.when(
        after_host.contains("?"),
        _clean_query(
            F.substring(after_host, F.length(path_raw) + 2, 2147483647)
        ),
    ).otherwise(F.lit(""))
    q_part = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def _suffix_groups(suffixes) -> dict[int, list[str]]:
    """Validate a public-suffix table and group it by label count
    (longest first — PSL longest-match-wins)."""
    groups: dict[int, list[str]] = {}
    for s in suffixes:
        if not s or s != s.lower() or s.startswith(".") or s.endswith("."):
            raise ValueError(
                f"public suffix {s!r} must be lower-case with no leading/"
                "trailing dot (wildcard '*.' and exception '!' PSL rules "
                "are not supported — pre-expand them)"
            )
        if "*" in s or "!" in s:
            raise ValueError(
                f"public suffix {s!r}: wildcard/exception PSL rules are "
                "not supported — pre-expand them to literal suffixes"
            )
        groups.setdefault(s.count(".") + 1, []).append(s)
    return groups


def registrable_domain_expr(host: Column, suffixes=None) -> Column:
    """Registrable domain of a lower-cased host: one label plus its
    longest matching public suffix. The zero-dependency default suffix
    table is the frozen two-level heuristic (TWO_LEVEL_SUFFIXES — the
    n10 oracle witness); pass ``suffixes`` (any iterable of literal
    suffix strings, e.g. parsed from the real Public Suffix List) for
    production-grade grouping — multi-label entries like ``act.gov.au``
    are matched longest-first, exactly the PSL rule. Single-label hosts
    and hosts that ARE a bare suffix pass through unchanged.

    The table becomes a frozen set-membership expression (Catalyst
    compiles large ``isin`` lists to an O(1) InSet probe), so the plan
    stays one scan-speed projection — no join, no shuffle — and the
    DuckDB twin is generated from the SAME table
    (``registrable_domain_sql``)."""
    groups = _suffix_groups(
        TWO_LEVEL_SUFFIXES if suffixes is None else suffixes
    )
    labels = F.split(host, "\\.")
    n = F.size(labels)

    def last_k(k: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(labels, -i) for i in range(k, 0, -1)]
        )

    expr = F.when(n <= 1, host)
    for ln in sorted(groups, reverse=True):
        expr = expr.when(
            (n >= ln + 1) & last_k(ln).isin(*groups[ln]), last_k(ln + 1)
        )
    return expr.otherwise(last_k(2))


def per_domain_cap(
    df: DataFrame,
    url_col: str,
    cap: int,
    id_col: str,
    keep_rank: bool = False,
    suffixes=None,
) -> DataFrame:
    """Keep at most ``cap`` rows per registrable domain, selected by a
    deterministic content-independent hash rank (md5 of normalized URL
    and id) so reruns and engines agree and no crawl-order bias leaks
    in. One domain-keyed shuffle. ``suffixes`` (optional) is a
    user-supplied public-suffix table for the domain grouping — see
    ``registrable_domain_expr``.

    Boundedness contract (the 100 TB story): Spark rewrites the
    ``row_number() <= cap`` filter into a ``WindowGroupLimit`` —
    per-key state is bounded at ``cap`` on BOTH the map side (partial
    limit before the shuffle) and the reduce side, so a mega-domain
    never materializes as one giant sorted partition. That rewrite
    only fires while ``cap`` ≤
    ``spark.sql.optimizer.windowGroupLimitThreshold`` (default 1000);
    above it the plan silently degrades to a full per-domain sort on
    one task — the classic skew killer — so this function raises
    instead, and tests/test_web.py plan-asserts the WindowGroupLimit
    node like the repo's other scale contracts."""
    from pyspark.sql.window import Window

    threshold = int(
        df.sparkSession.conf.get(
            "spark.sql.optimizer.windowGroupLimitThreshold", "1000"
        )
    )
    if cap > threshold:
        raise ValueError(
            f"per_domain_cap: cap={cap} exceeds "
            f"spark.sql.optimizer.windowGroupLimitThreshold={threshold}; "
            "the rank filter would degrade to an unbounded per-domain "
            "sort on one task. Raise the threshold conf (it bounds "
            "per-key window state) or lower the cap."
        )

    norm = normalize_url_expr(F.col(url_col))
    dom = registrable_domain_expr(url_host_expr(F.col(url_col)), suffixes)
    ranked = df.withColumn("__dom", dom).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("__dom").orderBy(
                F.md5(F.concat(norm, F.col(id_col).cast("string"))),
                F.col(id_col),
            )
        ),
    )
    out = ranked.filter(F.col("__rk") <= cap)
    if keep_rank:
        return out.withColumnRenamed("__dom", "domain").withColumnRenamed(
            "__rk", "domain_rank"
        )
    return out.drop("__dom", "__rk")


# ---------------------------------------------------------------------------
# DuckDB twins — generated from the SAME frozen rule tables.
# ---------------------------------------------------------------------------


def normalize_url_sql(url_sql: str) -> str:
    """DuckDB twin of normalize_url_expr (same frozen TRACKING_PARAMS)."""
    tracked = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    return f"""
    (SELECT scheme || '://' || host || port_part || path || q_part
     FROM (SELECT scheme, host, port_part,
                  CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
                  CASE WHEN q = '' THEN '' ELSE '?' || q END AS q_part
           FROM (SELECT scheme, host,
                        CASE WHEN port = '' OR port = def_port THEN ''
                             ELSE ':' || port END AS port_part,
                        split_part(after_host, '?', 1) AS path0,
                        CASE WHEN contains(after_host, '?') THEN
                          COALESCE(array_to_string(list_sort(list_filter(
                            string_split(substr(after_host,
                                length(split_part(after_host, '?', 1)) + 2), '&'),
                            p -> len(p) > 0
                                 AND lower(split_part(p, '=', 1)) NOT IN ({tracked})
                                 AND NOT starts_with(lower(split_part(p, '=', 1)), 'utm_')
                          )), '&'), '')
                        ELSE '' END AS q
                 FROM (SELECT scheme, hostport_raw,
                              lower(split_part(hostport, ':', 1)) AS host,
                              CASE WHEN contains(hostport, ':')
                                   THEN split_part(hostport, ':', 2) ELSE '' END AS port,
                              CASE scheme WHEN 'http' THEN '80'
                                          WHEN 'https' THEN '443' ELSE '' END AS def_port,
                              substr(rest, length(hostport_raw) + 1) AS after_host
                       FROM (SELECT scheme, rest, hostport_raw,
                                    CASE WHEN contains(hostport_raw, '@')
                                         THEN split_part(hostport_raw, '@', 2)
                                         ELSE hostport_raw END AS hostport
                             FROM (SELECT lower(split_part(nofrag, '://', 1)) AS scheme,
                                          split_part(nofrag, '://', 2) AS rest,
                                          split_part(split_part(
                                              split_part(nofrag, '://', 2), '/', 1),
                                              '?', 1) AS hostport_raw
                                   FROM (SELECT split_part({url_sql}, '#', 1) AS nofrag))
                            )))))
    """


def registrable_domain_sql(host_sql: str, suffixes=None) -> str:
    """DuckDB twin of registrable_domain_expr — generated from the SAME
    suffix table (default TWO_LEVEL_SUFFIXES), longest-match-first."""
    from sheetreader_duckdb_spark.operators.bpe import _sql_quote

    groups = _suffix_groups(
        TWO_LEVEL_SUFFIXES if suffixes is None else suffixes
    )

    def last_k(k: int) -> str:
        return " || '.' || ".join(f"__rd_ls[-{i}]" for i in range(k, 0, -1))

    branches = []
    for ln in sorted(groups, reverse=True):
        suf = ", ".join(f"'{_sql_quote(s)}'" for s in groups[ln])
        branches.append(
            f"WHEN len(__rd_ls) >= {ln + 1} AND ({last_k(ln)}) IN ({suf})"
            f" THEN {last_k(ln + 1)}"
        )
    when_chain = "\n                 ".join(branches)
    return f"""
    (SELECT CASE WHEN len(__rd_ls) <= 1 THEN __rd_h
                 {when_chain}
                 ELSE {last_k(2)} END
     FROM (SELECT __rd_h, string_split(__rd_h, '.') AS __rd_ls
           FROM (SELECT {host_sql} AS __rd_h)))
    """


def url_host_sql(url_sql: str) -> str:
    """DuckDB twin of url_host_expr."""
    return (
        f"lower(split_part(CASE WHEN contains(split_part(split_part(split_part("
        f"split_part({url_sql}, '#', 1), '://', 2), '/', 1), '?', 1), '@') THEN "
        f"split_part(split_part(split_part(split_part("
        f"split_part({url_sql}, '#', 1), '://', 2), '/', 1), '?', 1), '@', 2) "
        f"ELSE split_part(split_part(split_part("
        f"split_part({url_sql}, '#', 1), '://', 2), '/', 1), '?', 1) END, ':', 1))"
    )
