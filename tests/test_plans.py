"""Physical-plan properties of the declared corpus — the scale contract.

These assertions pin what `.explain` shows so a regression that would only
hurt at 100× the data (a join degrading to a cartesian product, a window
collapsing to one partition, a filter no longer reaching the parquet scan)
fails CI at any SF. Queries where a nested-loop join is the *intended*
physical strategy are whitelisted with the reason.
"""

from __future__ import annotations

import pytest

from sheetreader_duckdb_spark.plans import all_queries

QUERIES = all_queries()

# Frozen declared-corpus shape. The driver's per-query CORRECTNESS checks
# can't flag a row that never existed — a dropped @query decorator silently
# shrinks the corpus (it happened: round 6 lost n01 and with it every
# signal). Any add/remove/rename must edit this list consciously.
DECLARED_NAMES = [
    "h01_scan_filter_project", "h02b_ctas_sink", "h03_joins",
    "h05_semi_anti_join", "h07_range_join", "h08_agg_tpch_q1",
    "h08b_tpch_q3", "h08c_tpch_q5", "h09_grouping_ops", "h10_stats_agg",
    "h12_window_functions", "h12c_global_ntile", "h13_sort_topk",
    "h15_set_ops", "h16_scalar_functions", "h17_date_functions",
    "h19_array_functions", "h19b_array_explode", "h20_json_extract",
    "h21_conditional", "h22_cte_subquery", "h23_pandas_udf",
    "n01_dedup_exact_pipeline", "n02_dedup_minhash_lsh",
    "n03_dedup_jaccard_verify", "n04_dedup_simhash",
    "n05_ann_bruteforce_topk", "n06_embedding_neardup",
    "n06b_embedding_neardup_srp", "n07_text_signals", "n10_token_stats",
    "n11_multimodal_metadata", "n11b_multimodal_features",
    "n12_session_windows", "n13_tumbling_windows", "n14_stream_tumbling",
    "n14b_stream_sliding", "n15_stream_session",
    "n16_stream_stateful_totals", "n17_tf_idf", "n19_asof_join",
    "n20_dedup_clusters", "nx_scale_variants", "s01_xlsx_roundtrip",
    "s02_xlsx_stream_ingest", "s03_xlsx_option_semantics",
    "s04_xlsx_type_overrides", "s05_xlsx_sheet_selection",
    "t01_tpch_agg_suite", "t03_tpch_subquery_suite",
]

# Declared-by-design rows-only checks (no SQL-expressible oracle).
NO_ORACLE = {"nx_scale_variants"}


def test_registry_shape_frozen():
    assert sorted(QUERIES) == DECLARED_NAMES, (
        "declared query corpus changed — if intentional, update "
        "DECLARED_NAMES; if not, a @query registration was lost"
    )
    missing_oracle = {n for n, q in QUERIES.items() if q.oracle is None}
    assert missing_oracle == NO_ORACLE, (
        f"oracle coverage changed: rows-only queries now {sorted(missing_oracle)}"
    )

# BroadcastNestedLoopJoin is legitimate when one side is a tiny broadcast
# (a 1-row total, a generated band table) or the query is the declared
# O(n²) exact cross-check.
BNL_OK = {
    "h07_range_join",  # broadcast 8-row band table, non-equi by design
    "n06_embedding_neardup",  # declared O(n²) exact cross-check of n06b
    "n17_tf_idf",  # crossJoin of a 1-row in-plan total
    "h12c_global_ntile",  # crossJoin of the 1-row total; offsets are 32 rows
    "n05_ann_bruteforce_topk",  # exact baseline: broadcast queries vs corpus
    # t03 carries t11's and t22's 1-row broadcast totals as branches.
    "t03_tpch_subquery_suite",
    # n10's hh branch crossJoins its 1-row broadcast total.
    "n10_token_stats",
    # n01's cur_kept branch (curate_corpus): sqrt_temperature_sample
    # crossJoins the 1-row broadcast min-source-count carrier.
    "n01_dedup_exact_pipeline",
}

# Queries that are not plain batch plans (streaming execution) or that read
# through the Python data source (plans differ per fixture availability).
SKIP = {name for name in QUERIES if name.startswith(("n14", "n15", "n16", "s0"))}

BATCH = sorted(set(QUERIES) - SKIP)


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name in BATCH:
        df = QUERIES[name].fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


@pytest.mark.parametrize("name", BATCH)
def test_no_unintended_nested_loop_join(name, plans):
    plan = plans[name]
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name == "nx_scale_variants":
        # The tiny-broadcast-side BNL operators that are intended: the q8
        # and pq coarse scans inside the n05b ANN family (each streams
        # the corpus against a broadcast 10-row query table — live in the
        # plan), plus THREE 1-row broadcast codebook carriers from the
        # constant-plan PQ form (pq_topk_join: the query-LUT crossJoin,
        # the corpus-encode crossJoin, and the coarse join that reads
        # both — codebooks travel as broadcast data instead of literal
        # trees, so the crossJoin against the 1-row books frame IS the
        # design). Semdedup's 1-row centroid carrier (inline map-side
        # assignment) sits INSIDE the persisted assignment subtree, which
        # the self-join prints once per cache scan, so it never appears
        # outside an InMemoryRelation block. More live BNLs would mean
        # the lsh/ivf candidate branches regressed from equi-joins.
        # Cached-ness is decided by walking the plan tree's ancestors via
        # indentation (the InMemoryRelation node printing the subtree is
        # strictly shallower), not by a fixed-line lookback.
        lines = plan.splitlines()

        def _depth(line: str) -> int:
            return len(line) - len(line.lstrip(" :+-|"))

        def _under_cache(i: int) -> bool:
            cur = _depth(lines[i])
            for j in range(i - 1, -1, -1):
                d = _depth(lines[j])
                if d < cur:
                    if "InMemory" in lines[j]:
                        return True
                    cur = d
                    if cur == 0:
                        break
            return False

        live = [
            l
            for i, l in enumerate(lines)
            if "BroadcastNestedLoopJoin" in l and not _under_cache(i)
        ]
        # Shape-pinned, not just count-pinned: the only non-Cross live
        # BNLs allowed are the two NOT(qid=cid) coarse scans (q8 + pq,
        # each streaming the corpus against the broadcast 10-row query
        # table); every other live BNL must be a BuildRight Cross — the
        # tiny-broadcast carriers (1-row PQ books ×3 across pq/ivfpq,
        # 16-row centroid tables for ivfpq's assign + probe ranking).
        non_cross = [l for l in live if "Cross" not in l]
        cross = [l for l in live if "Cross" in l]
        assert len(non_cross) == 2, f"{name}: non-cross live BNLs {non_cross}"
        assert all("BuildRight" in l for l in live), f"{name}: BNL build side"
        assert len(cross) == 8, f"{name}: live Cross-carrier count {len(cross)}"
        assert plan.count("BroadcastNestedLoopJoin") <= 13, f"{name}: BNL count"
    elif name not in BNL_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNL join"


@pytest.mark.parametrize("name", BATCH)
def test_no_partitionless_data_window(name, plans):
    # A window with no PARTITION BY funnels all rows into one task. The
    # corpus must not contain one over table data (h12c's design replaces
    # it; tiny metadata aggregates don't use windows at all).
    for line in plans[name].splitlines():
        if "windowspecdefinition(" in line:
            head = line.split("windowspecdefinition(", 1)[1]
            first_arg = head.split(",", 1)[0].strip()
            # partition columns precede the ORDER BY spec; a partition-less
            # window starts directly with an ordering expression like
            # `x ASC NULLS FIRST` — which never parses as a bare reference.
            assert "#" in first_arg and " " not in first_arg, (
                f"{name}: partition-less window: {line.strip()[:120]}"
            )


def test_flagship_pushes_filters_to_scan(plans):
    plan = plans["h08_agg_tpch_q1"]
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruning: the scan must not read all 16 lineitem columns
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_comment" not in read_schema


def test_dim_joins_broadcast(plans):
    # nation/region dims must broadcast, not shuffle, in the join queries
    for name in ("h03_joins", "h08c_tpch_q5", "h09_grouping_ops"):
        assert "BroadcastHashJoin" in plans[name], f"{name}: no broadcast join"


def test_topk_compiles_to_take_ordered(plans):
    assert "TakeOrderedAndProject" in plans["h13_sort_topk"]


@pytest.fixture(scope="module")
def tpch_plans(spark, sf_dir):
    from sheetreader_duckdb_spark.plans.tpch import TPCH_BRANCHES

    out = {}
    for name, (fn, _oracle, _doc) in TPCH_BRANCHES.items():
        out[name] = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    return out


def test_tpch_branches_no_cartesian(tpch_plans):
    for name, plan in tpch_plans.items():
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        if name not in ("t11_important_stock", "t22_dormant_customers"):
            assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNL join"


def test_tpch_scan_agg_pushes_filters(tpch_plans):
    # Q6 is the purest scan-filter-aggregate: every predicate must reach the
    # parquet scan, and the scan must read only the 4 referenced columns.
    plan = tpch_plans["t06_forecast_revenue"]
    assert "PushedFilters: " in plan
    pushed = plan.split("PushedFilters: ", 1)[1].splitlines()[0]
    assert "l_discount" in pushed and "l_quantity" in pushed
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_tax" not in read_schema


def test_tpch_topk_take_ordered(tpch_plans):
    for name in ("t10_returned_items", "t18_large_orders"):
        assert "TakeOrderedAndProject" in tpch_plans[name], f"{name}: no top-k"


def test_tpch_semi_anti_forms(tpch_plans):
    assert "LeftSemi" in tpch_plans["t04_order_priority_exists"]
    assert "LeftAnti" in tpch_plans["t16_supplier_variety"]
    assert "LeftAnti" in tpch_plans["t22_dormant_customers"]


def test_t21_single_pass_window_form(tpch_plans):
    # The sole-late-supplier query must stay the one-pass window form: no
    # self semi/anti joins re-deriving the late-flag table, and a bounded
    # exchange count (8 -> 4 in the rewrite; allow AQE jitter to 5).
    plan = tpch_plans["t21_waiting_suppliers"]
    assert plan.count("Exchange") <= 5, "t21 regressed to the self-join form"
    assert "Window" in plan


def test_declared_witness_knobs_stay_below_auto_crossover(spark):
    """Every declared HASH witness that routes through a scoring 'auto'
    knob must resolve to the expression form: its scoring-cell count at
    the driver's correctness scale (sf0.01) has to sit below
    ``_AUTO_VECTORIZE_CELLS``, or a future data/knob growth would silently
    flip a hash-pinned plan to the float-associative gemm form (ADVICE
    r9). Pins the actual declared knobs against the actual table sizes —
    update the knob constants here ONLY together with the witness."""
    import os

    from sheetreader_duckdb_spark.operators import similarity as S

    cap = S._AUTO_VECTORIZE_CELLS
    for sf_dir in ("/root/testdata/sf0.01", os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )):
        if not os.path.isdir(sf_dir):
            continue
        n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        # n05/n06b ANN witnesses (plans/northstar.py): n_cells=16,
        # n_codes=16, n_iters=pq_iters=2.
        assert n_emb * 16 < cap, f"{sf_dir}: ivf witness crossed the crossover"
        assert n_emb * 16 * 2 < cap, f"{sf_dir}: pq witness crossed the crossover"
        # n01 'cur_kept' curate pipeline: semantic_dedup_keep with
        # n_cells=min(auto_ivf_cells(n_emb), n_emb), score='auto'.
        k = min(S.auto_ivf_cells(n_emb), n_emb)
        assert n_emb * k < cap, f"{sf_dir}: curate semdedup crossed the crossover"


def test_plan_build_schedules_no_eager_job(spark, monkeypatch):
    """VERDICT r12 task 5: constructing a declared plan must not run a
    Spark job (nx_scale_variants carried a metadata count() at
    plan-build since r9 — now a parquet-footer read via
    tables.parquet_row_count). Pinned structurally: with DataFrame
    eager-action methods poisoned, every declared BATCH query still
    CONSTRUCTS. (Streaming queries replay through AvailableNow at
    construct time by design; s01/h02b/n11b materialize fixtures or
    sinks — the known, documented constructors.)"""
    import os

    from pyspark.sql import DataFrame

    from sheetreader_duckdb_spark.plans import all_queries

    def _boom(self, *a, **k):
        raise AssertionError("eager Spark action during plan construction")

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    # The declared constructors allowed to execute work at build time:
    # ingest/sink fixtures (s*, h02b, n11b multimodal features) and the
    # streaming replays (n14*-n16, s02) — everything else is pure plan.
    allowed = {
        "s01_xlsx_roundtrip", "s02_xlsx_stream_ingest",
        "s03_xlsx_option_semantics", "s04_xlsx_type_overrides",
        "s05_xlsx_sheet_selection", "h02b_ctas_sink",
        "n11b_multimodal_features", "n14_stream_tumbling",
        "n14b_stream_sliding", "n15_stream_session",
        "n16_stream_stateful_totals", "n01_dedup_exact_pipeline",
        "n01_cur_kept",
    }
    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    for name, q in all_queries().items():
        if name in allowed:
            continue
        q.fn(spark, sf_dir)  # must not raise
