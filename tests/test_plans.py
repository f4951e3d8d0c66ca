"""Plan-shape assertions — the reference's planner-test methodology
(BasePlanTest + 40 matchers, TestLogicalPlanner, TestPredicatePushdown;
SURVEY.md §5.3) re-expressed as explain-string checks.

These pin the *scale* properties the engine promises (SCALE.md):
filters reach the scan, projections prune columns, dimension joins
broadcast, aggregations two-phase, top-k plans TakeOrderedAndProject,
per-row operators add no exchange.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from presto_0_235_spark.queries.registry import all_queries

_QUERIES = all_queries()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q6_pushdown_and_pruning(spark, sf_dir):
    """Q6 filters reach the parquet reader; scan reads only needed
    columns (reference: ScanFilterAndProjectOperator fusion +
    PickTableLayout TupleDomain pushdown)."""
    plan = plan_of(_QUERIES["tpch_q6"].builder(spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_orderkey" not in read_schema


def test_q1_two_phase_aggregation(spark, sf_dir):
    """Partial+final HashAggregate around one exchange (reference
    AggregationNode.Step PARTIAL/FINAL,
    PushPartialAggregationThroughExchange)."""
    plan = plan_of(_QUERIES["tpch_q1"].builder(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_broadcast_dim_join(spark, sf_dir):
    """Small dimension sides broadcast (reference
    DetermineJoinDistributionType REPLICATED)."""
    plan = plan_of(_QUERIES["join_broadcast_dim"].builder(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q5_broadcasts_dims_single_fact_shuffle(spark, sf_dir):
    """Q5: nation/region/supplier/customer broadcast; lineitem-orders
    is the only fact-fact join."""
    plan = plan_of(_QUERIES["tpch_q5"].builder(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 3


def test_topn_plans_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT plans partial top-k (reference TopNOperator +
    CreatePartialTopN)."""
    plan = plan_of(_QUERIES["topn"].builder(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan


def test_text_ops_no_exchange(spark, sf_dir):
    """Per-row text operators are narrow: no shuffle anywhere in the
    plan (they pipeline inside the scan stage at any scale)."""
    for name in ["text_token_count", "text_fingerprint", "text_lang_id"]:
        plan = plan_of(_QUERIES[name].builder(spark, sf_dir), "simple")
        assert "Exchange" not in plan, f"{name} unexpectedly shuffles"


def test_codegen_covers_expressions(spark, sf_dir):
    """Expression work runs inside WholeStageCodegen spans (reference
    analog: compiled PageProcessor/ExpressionCompiler)."""
    plan = plan_of(_QUERIES["fn_math"].builder(spark, sf_dir), "simple")
    # "*(n)" marks WholeStageCodegen stages in simple explain output.
    assert "*(" in plan


def test_partition_prune_on_partitioned_sink(spark, sf_dir):
    """Reading back a year from the partitioned sink prunes
    partitions (PartitionFilters), not post-scan filters."""
    df = _QUERIES["io_partitioned_prune"].builder(spark, sf_dir)
    plan = plan_of(df)
    assert "PartitionFilters:" in plan
    pf_line = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_year" in pf_line


def test_bucketed_join_no_exchange(spark, sf_dir):
    """Bucketed co-located join: SortMergeJoin over bucketed scans
    with zero exchanges — the layout that deletes the fact-fact
    shuffle at 100 TB (SCALE.md §2)."""
    plan = plan_of(_QUERIES["io_bucketed_join"].builder(spark, sf_dir), "simple")
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan_of(
        _QUERIES["io_bucketed_join"].builder(spark, sf_dir)
    )
    assert "Exchange hashpartitioning" not in plan


def test_ann_broadcasts_queries(spark, sf_dir):
    """Brute-force ANN broadcasts the query set; the candidate side
    never shuffles N rows before scoring."""
    plan = plan_of(_QUERIES["ann_cosine_topk"].builder(spark, sf_dir))
    assert "BroadcastExchange" in plan


def test_plan_determinism(spark, sf_dir):
    """Same query -> same plan (reference TestQueryPlanDeterminism)."""
    p1 = plan_of(_QUERIES["tpch_q3"].builder(spark, sf_dir), "simple")
    p2 = plan_of(_QUERIES["tpch_q3"].builder(spark, sf_dir), "simple")
    # Normalize auto-generated expression ids before comparing.
    import re

    def strip(s: str) -> str:
        s = re.sub(r"#\d+L?", "#x", s)
        return re.sub(r"plan_id=\d+", "plan_id=x", s)

    assert strip(p1) == strip(p2)


def test_no_hardcoded_broadcast_on_sf_growing_sides(spark, sf_dir):
    """The whole tpch_q.py corpus carries NO broadcast hint on
    SF-growing sides (customer, filtered orders, the >300-qty
    order-key set) — yet at small SF the size-aware planner still
    picks broadcast joins on its own (the cost-based choice the
    reference makes in DetermineJoinDistributionType.java). A
    hard-coded hint would force a multi-GB broadcast at 100x scale.
    Hint budget = bounded dims only (nation 25 rows, region 5 rows)."""
    import re

    bounded_hint_budget = {
        "tpch_q1": 0,
        "tpch_q3": 0,
        "tpch_q5": 2,   # nation, region
        "tpch_q6": 0,
        "tpch_q18": 0,  # the >300-qty key set grows with SF: no hint
    }
    for name, budget in bounded_hint_budget.items():
        df = _QUERIES[name].builder(spark, sf_dir)
        extended = plan_of(df, "extended")
        analyzed = extended.split("== Analyzed Logical Plan ==")[1].split(
            "== Optimized Logical Plan =="
        )[0]
        n_hints = len(re.findall(r"ResolvedHint", analyzed))
        # Exact, not a ceiling: a nonzero budget means those bounded-dim
        # hints are intentionally pinned — silently dropping one must
        # fail here, not just lose broadcast coverage.
        assert n_hints == budget, (
            f"{name}: {n_hints} broadcast hints (pinned budget {budget} bounded dims)"
        )
    # Size-based planning still broadcasts the small sides of the join
    # queries at this SF — the cost-based choice, without any hint.
    for name in ("tpch_q3", "tpch_q18"):
        physical = plan_of(_QUERIES[name].builder(spark, sf_dir))
        assert "BroadcastHashJoin" in physical or "BroadcastExchange" in physical, (
            f"{name}: expected size-based broadcast at small SF"
        )


def test_tpch_more_no_sf_growing_broadcasts(spark, sf_dir):
    """q7/q8/q9/q10/q14/q17/q19 (tpch_more_q.py) carry NO broadcast
    hint on SF-growing sides (customer/supplier/part/per-part
    aggregates) — the r2 tpch_q.py rule extended to the whole corpus.
    The size-aware planner still picks broadcast joins on its own at
    small SF (reference DetermineJoinDistributionType.java chooses by
    cost, never by fiat). Static-hint detection: ResolvedHint nodes in
    the analyzed logical plan only appear for explicit F.broadcast
    calls — the allowed ones are the bounded dims (nation=25,
    region=5 rows) and single-row scalar aggregates."""
    import re

    bounded_hint_budget = {
        "tpch_q7": 2,   # n1, n2
        "tpch_q8": 3,   # n1, n2, region
        "tpch_q9": 1,   # nation
        "tpch_q10": 1,  # nation
        "tpch_q14": 0,
        "tpch_q17": 0,
        "tpch_q19": 0,
    }
    for name, budget in bounded_hint_budget.items():
        df = _QUERIES[name].builder(spark, sf_dir)
        extended = plan_of(df, "extended")
        analyzed = extended.split("== Analyzed Logical Plan ==")[1].split(
            "== Optimized Logical Plan =="
        )[0]
        n_hints = len(re.findall(r"ResolvedHint", analyzed))
        # Exact, not a ceiling: a nonzero budget means those bounded-dim
        # hints are intentionally pinned — silently dropping one must
        # fail here, not just lose broadcast coverage.
        assert n_hints == budget, (
            f"{name}: {n_hints} broadcast hints (pinned budget {budget} bounded dims)"
        )
        # The physical plan still broadcasts the small sides at this SF
        # via size-based planning / AQE — the cost-based choice.
        physical = plan_of(df)
        assert "BroadcastHashJoin" in physical or "BroadcastExchange" in physical, (
            f"{name}: expected size-based broadcast at small SF"
        )


def test_q17_semi_join_below_aggregate(spark, sf_dir):
    """Q17's correlated per-part aggregate consumes only Brand#13
    lineitem rows: the semi join to filtered part keys sits BELOW the
    per-part HashAggregate (reference analog:
    TransformCorrelatedScalarAggregationToJoin + PredicatePushDown
    equality inference shrink the aggregate input ~25x)."""
    plan = plan_of(_QUERIES["tpch_q17"].builder(spark, sf_dir), "extended")
    # Optimized logical plan: aggregate over a semi join, not the raw scan.
    optimized = plan.split("== Optimized Logical Plan ==")[1]
    agg_pos = optimized.find("Aggregate [l_partkey")
    assert agg_pos != -1
    # Children print after their parent: a LeftSemi after the per-part
    # Aggregate line means the aggregate consumes the semi-joined
    # (Brand#13-only) lineitem, not the raw scan.
    assert optimized.find("LeftSemi", agg_pos) != -1, (
        "per-part aggregate should consume the Brand#13 semi join"
    )


def test_adapted_partsupp_queries_no_sf_growing_broadcasts(spark, sf_dir):
    """q2/q11/q16/q20 adapted (lineitem-derived partsupp bridge) keep
    hints only on bounded sides: nation (25 rows), region (5 rows),
    and q11's single-row global total. The SF-growing sides (the
    bridge itself, suppliers, the grouped-HAVING supplier set) are
    left to the size-aware planner."""
    import re

    bounded_hint_budget = {
        "tpch_q2_adapted": 4,   # nation, region — x2: the EU bridge
                                # subplan (and its two bounded-dim
                                # hints) appears under both the main
                                # join and the min-cost aggregate
        "tpch_q11_adapted": 3,  # nation x2 (the val subplan appears
                                # under both the filter and the global
                                # total), single-row total
        "tpch_q16_adapted": 0,
        "tpch_q20_adapted": 1,  # nation
    }
    for name, budget in bounded_hint_budget.items():
        df = _QUERIES[name].builder(spark, sf_dir)
        extended = plan_of(df, "extended")
        analyzed = extended.split("== Analyzed Logical Plan ==")[1].split(
            "== Optimized Logical Plan =="
        )[0]
        n_hints = len(re.findall(r"ResolvedHint", analyzed))
        # Exact, not a ceiling: a nonzero budget means those bounded-dim
        # hints are intentionally pinned — silently dropping one must
        # fail here, not just lose broadcast coverage.
        assert n_hints == budget, (
            f"{name}: {n_hints} broadcast hints (pinned budget {budget} bounded)"
        )


def test_domain_cap_plans_window_group_limit(spark, sf_dir):
    """docs_domain_cap (top-K per source) plans a WindowGroupLimit:
    partial top-K per partition BEFORE the shuffle, so a skewed
    domain never funnels all its rows through one task."""
    plan = plan_of(_QUERIES["docs_domain_cap"].builder(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_sample_temperature_plans_window_group_limit(spark, sf_dir):
    """docs_sample_temperature caps the per-domain rank with a
    constant (max over domains of n_keep) alongside the exact
    per-domain column cap, so InferWindowGroupLimit fires: a Partial
    WindowGroupLimit must sit BELOW the shuffle — a skewed megadomain
    ships O(sqrt(n)) rows per map task instead of landing whole in
    one task and being fully sorted."""
    plan_str = plan_of(
        _QUERIES["docs_sample_temperature"].builder(spark, sf_dir),
        mode="simple",
    )
    assert plan_str.count("WindowGroupLimit") >= 2, plan_str
    # simple mode prints top-down: the Partial WindowGroupLimit sits
    # after (= physically below) the source-key Exchange.
    exchange = plan_str.find("Exchange hashpartitioning(source")
    assert exchange != -1, plan_str
    below = plan_str[exchange:]
    assert "WindowGroupLimit" in below and "Partial" in below, plan_str


def test_int8_ann_broadcasts_queries_only(spark, sf_dir):
    """ann_int8_topk broadcasts the (bounded) quantized query set;
    the N-sized candidate side never broadcasts and never shuffles
    N rows (window group-limit takes per-partition top-k first)."""
    plan = plan_of(_QUERIES["ann_int8_topk"].builder(spark, sf_dir))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_split_assign_no_exchange(spark, sf_dir):
    """docs_split_assign is a pure per-row projection — zero
    exchanges in the plan (scan-speed at any corpus size)."""
    plan = plan_of(_QUERIES["docs_split_assign"].builder(spark, sf_dir))
    assert "Exchange" not in plan


def test_minmax_n_bounds_state_with_window_group_limit(spark, sf_dir):
    """agg_minmax_n pre-prunes each direction to row_number() <= N via
    WindowGroupLimit (partial top-k before the shuffle) — the Spark
    analog of the reference's bounded TypedHeap
    (MAIN/operator/aggregation/MaxNAggregationFunction.java). A hot
    group must never materialize whole-group collect_list state."""
    plan = plan_of(_QUERIES["agg_minmax_n"].builder(spark, sf_dir))
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_per_row_scalar_queries_no_exchange(spark, sf_dir):
    """The round-6 scalar families (geo planar core, WKT I/O, IPv6
    prefix, binary codecs) are pure per-row projections — their plans
    must contain NO exchange: scan-speed at any corpus size."""
    for name in (
        "fn_geospatial_core",
        "fn_geospatial_wkt",
        "fn_ipv6_prefix",
        "fn_binary_codecs",
    ):
        plan = plan_of(_QUERIES[name].builder(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} plans an exchange"


def test_spatial_contains_join_no_cartesian(spark, sf_dir):
    """join_spatial_contains must plan a hash equi-join on grid cell
    ids with the ray-cast predicate as a join filter — never a
    cartesian/nested-loop product (the whole point of the
    ExtractSpatialJoins.java:107-114 rewrite the query mirrors)."""
    plan = plan_of(_QUERIES["join_spatial_contains"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_tpcds_star_broadcasts_dims_and_takes_ordered(spark, sf_dir):
    """tpcds_q3_adapted must plan the TPC-DS star signature: the
    filter-reduced dims broadcast (no shuffle of the fact for the
    dim joins), two-phase aggregation, and a TakeOrderedAndProject
    for ORDER BY ... LIMIT — never a global sort."""
    plan = plan_of(_QUERIES["tpcds_q3_adapted"].builder(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpcds_q97_full_outer_membership_join(spark, sf_dir):
    """tpcds_q97_adapted must plan ONE full-outer join between the
    two distinct pair-set aggregates — the NULL-ness membership
    census shape; never a cartesian, and exactly one FullOuter."""
    plan = plan_of(_QUERIES["tpcds_q97_adapted"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("FullOuter") >= 1, plan


def test_spatial_partitioning_is_two_window_passes(spark, sf_dir):
    """agg_spatial_partitioning: two ntile window levels (x split,
    then y split within band) and a final aggregate — no joins, no
    cartesian; the equi-depth KDB shape."""
    plan = plan_of(_QUERIES["agg_spatial_partitioning"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 2, plan


def test_kmv_rank_gets_window_group_limit(spark, sf_dir):
    """agg_kmv_distinct's k-smallest-hash rank uses a LITERAL k, so
    Spark must pre-prune via WindowGroupLimit (partial top-k per
    partition BEFORE the shuffle) — the property that keeps the KMV
    sketch build O(k) per group per task, as the docstring claims."""
    plan = plan_of(_QUERIES["agg_kmv_distinct"].builder(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_tpcds_q17_co_partitioned_fact_chain(spark, sf_dir):
    """tpcds_q17_adapted: the three fact slices each shuffle ONCE on
    the shared (sk, ck) composite key and the two fact-fact joins
    consume them co-partitioned (sort-merge with no extra exchange);
    dims broadcast. Pin: exactly 3 slice exchanges + 1 final
    group-by exchange, 2 sort-merge joins, >= 4 broadcast joins."""
    plan = plan_of(
        _QUERIES["tpcds_q17_adapted"].builder(spark, sf_dir), "simple"
    )
    assert plan.count("Exchange hashpartitioning") == 4, plan
    assert plan.count("SortMergeJoin") == 2, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_tpcds_q38_intersect_plans_no_cartesian(spark, sf_dir):
    """tpcds_q38_adapted: the INTERSECT chain must lower to
    (semi/hash) joins over the deduped channel sets — never a
    cartesian product — and the count is a final single-row
    aggregate."""
    plan = plan_of(_QUERIES["tpcds_q38_adapted"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_geometry_multi_queries_no_exchange(spark, sf_dir):
    """The r7 geometry families (multipolygon, distance,
    intersects) are pure per-row projections — no exchange, scan
    speed at any corpus size."""
    for name in (
        "fn_geospatial_multipolygon",
        "fn_geospatial_distance",
        "fn_geospatial_intersects",
    ):
        plan = plan_of(_QUERIES[name].builder(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} plans an exchange"


def test_convex_hull_agg_is_two_phase(spark, sf_dir):
    """agg_convex_hull: exactly two Arrow applyInPandas stages (the
    per-salt partial hulls, then the hull-of-hull-vertices merge) —
    the bounded-state two-phase shape the docstring claims."""
    plan = plan_of(
        _QUERIES["agg_convex_hull"].builder(spark, sf_dir), "simple"
    )
    assert plan.count("FlatMapGroupsInPandas") == 2, plan


def test_tpcds_q98_share_of_total_windows_over_aggregate(spark, sf_dir):
    """tpcds_q98_adapted: the ratio_to_report window must run over
    the AGGREGATE (one fact shuffle for the group-by, one window
    exchange on the class key) — a plan that windowed the fact
    itself would shuffle the full table twice."""
    plan = plan_of(
        _QUERIES["tpcds_q98_adapted"].builder(spark, sf_dir), "simple"
    )
    assert plan.count("Window") == 1, plan
    # window input is the HashAggregate output, not a fact scan:
    # exactly 2 hash exchanges (agg + window), nothing more
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_tpcds_q59_self_join_runs_on_aggregate(spark, sf_dir):
    """tpcds_q59_adapted: the year-over-year join must consume the
    weekly AGGREGATE on both sides (broadcast or co-partitioned) —
    never a fact-vs-fact join; no cartesian."""
    plan = plan_of(
        _QUERIES["tpcds_q59_adapted"].builder(spark, sf_dir), "simple"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


@pytest.mark.parametrize(
    "name,min_cache_uses",
    [
        ("tpcds_q65_adapted", 2),
        ("tpcds_q75_adapted", 2),
        ("tpcds_q31_adapted", 6),  # 3 quarter instances x 2 channels
        ("tpcds_q59_adapted", 2),
        ("tpcds_q23_adapted", 2),
    ],
)
def test_multi_consumer_aggregates_scan_fact_once(
    spark, sf_dir, name, min_cache_uses
):
    """Queries whose first-level aggregate feeds multiple consumers
    (self-joins, avg-over-aggregate, scalar thresholds) persist that
    aggregate, so the 100 TB fact chain runs ONCE — Catalyst would
    otherwise prune the consumers differently and re-run the whole
    chain per consumer. Pin: every consumer reads an InMemoryRelation
    (>= min_cache_uses of them), and every lineitem FileScan in the
    optimized plan sits INSIDE a cached subtree (each InMemoryRelation
    printout embeds its own cached plan, so standalone scans would
    push the lineitem count above the relation count)."""
    # Start from a cold cache: a MATERIALIZED InMemoryRelation (e.g.
    # left behind by the oracle suite running the same builder) prints
    # its AQE final+initial plans — two lineitem scans per cached
    # relation — which would break the containment arithmetic below.
    spark.catalog.clearCache()
    df = _QUERIES[name].builder(spark, sf_dir)
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        n_cache = plan.count("InMemoryRelation")
        n_li = plan.count("lineitem.parquet")
        assert n_cache >= min_cache_uses, f"{name}: {n_cache} cache uses"
        assert n_li <= n_cache, (
            f"{name}: {n_li} lineitem scans vs {n_cache} cached relations "
            f"— a consumer bypassed the persisted aggregate\n{plan}"
        )
    finally:
        spark.catalog.clearCache()


def test_tpcds_q67_rank_over_rollup_group_limited(spark, sf_dir):
    """tpcds_q67_adapted: the rk <= 10 filter over the rollup output
    must plan a WindowGroupLimit (partial + final) so the top-10
    prune happens before the window shuffle, and no cartesian."""
    spark.catalog.clearCache()
    df = _QUERIES["tpcds_q67_adapted"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "CartesianProduct" not in plan


def test_tpcds_q44_ranks_run_on_persisted_aggregate(spark, sf_dir):
    """tpcds_q44_adapted: both rank branches read the PERSISTED
    threshold-filtered profit aggregate (two InMemoryTableScans) and
    the rnk < 11 filters plan WindowGroupLimits."""
    spark.catalog.clearCache()
    try:
        df = _QUERIES["tpcds_q44_adapted"].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2, plan
        assert plan.count("WindowGroupLimit") >= 2, plan
    finally:
        spark.catalog.clearCache()


def test_tpcds_q14_branches_read_persisted_ctes(spark, sf_dir):
    """tpcds_q14_adapted: all three channel branches consume the
    persisted cross_items and avg_sales CTEs (>= 6 cached reads
    total) — the deep INTERSECT and the union scalar compute ONCE."""
    spark.catalog.clearCache()
    try:
        df = _QUERIES["tpcds_q14_adapted"].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 6, plan
        assert "CartesianProduct" not in plan
    finally:
        spark.catalog.clearCache()


def test_geometry_union_agg_partials_below_shuffle(spark, sf_dir):
    """The mergeable geometry aggregates (operators/geo_agg.py,
    GeometryUnionAgg.java accumulator design) must fold partials
    BELOW the exchange: MapInPandas (per-batch partial union) ->
    Exchange of folded partials only -> FlatMapGroupsInPandas (merge)
    — never a collect_list of raw geometries across the shuffle."""
    from presto_0_235_spark.queries.extensions_q import (
        sql_convex_hull_agg_scale, sql_geometry_union_agg_scale)

    for builder in (sql_geometry_union_agg_scale,
                    sql_convex_hull_agg_scale):
        plan = plan_of(builder(spark, sf_dir))
        i_map = plan.find("MapInPandas")
        i_merge = plan.find("FlatMapGroupsInPandas")
        assert i_map != -1 and i_merge != -1, builder.__name__
        # formatted explain prints operators top-down (output first):
        # the merge must appear ABOVE the partial map, with an
        # exchange in between
        assert i_merge < i_map, builder.__name__
        between = plan[i_merge:i_map]
        assert "Exchange" in between, builder.__name__
        assert "collect_list" not in plan, builder.__name__


def test_sql_spelling_geometry_agg_routes_to_mergeable(spark, sf_dir):
    """r14: the SQL SPELLING of geometry_union_agg / convex_hull_agg
    over a GROUP BY routes through the same mergeable two-phase
    operator (sql/frontend._route_geo_aggregate) — mirror of
    test_geometry_union_agg_partials_below_shuffle for the front
    door. Shapes outside the router's window (the aggregate nested
    in an expression) keep the collect_list convenience lowering."""
    from presto_0_235_spark.catalog import register_views
    from presto_0_235_spark.sql.frontend import run_sql

    register_views(spark, sf_dir)
    for agg in ("geometry_union_agg", "convex_hull_agg"):
        df = run_sql(
            spark,
            f"""
            SELECT n_regionkey, {agg}(
              st_geometryfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')
            ) AS g
            FROM nation GROUP BY n_regionkey
            """,
        )
        plan = plan_of(df)
        i_map = plan.find("MapInPandas")
        i_merge = plan.find("FlatMapGroupsInPandas")
        assert i_map != -1 and i_merge != -1, agg
        assert i_merge < i_map, agg
        assert "Exchange" in plan[i_merge:i_map], agg
        assert "collect_list" not in plan, agg
    # value parity with the template lowering on the fallback shape
    routed = run_sql(
        spark,
        "SELECT n_regionkey, geometry_union_agg(st_geometryfromtext("
        "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')) AS g "
        "FROM nation GROUP BY n_regionkey")
    fallback = run_sql(
        spark,
        "SELECT n_regionkey, st_astext(geometry_union_agg("
        "st_geometryfromtext("
        "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))) AS g "
        "FROM nation GROUP BY n_regionkey")
    assert sorted(map(tuple, routed.collect())) == \
        sorted(map(tuple, fallback.collect()))


def test_twin_q64_cohort_gate_is_semi_join(spark, sf_dir):
    """r15 twin q64: the `l_orderkey IN (SELECT ... FROM cs_ui)`
    cohort gate must plan as a (co-partitioned or broadcast)
    semi-join on the order key — never a full materialize-and-probe
    of the gated side into a nested loop. The cross_sales self-join
    a year apart stays an equi hash join on the item key."""
    plan = plan_of(_QUERIES["sql_tpcds_q64"].builder(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_twin_q72_offset_self_join_is_equi_on_item(spark, sf_dir):
    """r15 twin q72: the date-OFFSET self-join keys on l_partkey
    (equi) with the 5-day range as a post-join condition — the shape
    that co-partitions at 100 TB; a range-only join would be a
    nested loop."""
    plan = plan_of(_QUERIES["sql_tpcds_q72"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_twin_q86_rank_partitions_by_grouping_level(spark, sf_dir):
    """r15 twin q86 (and q70's skeleton): ROLLUP expands grouping
    sets ONCE (a single Expand node feeding one aggregate) and the
    rank-within-parent window partitions by the grouping level —
    spark_grouping_id must appear in the window spec, not a re-scan
    per level."""
    plan = plan_of(_QUERIES["sql_tpcds_q86"].builder(spark, sf_dir))
    assert "Expand" in plan
    assert "Window" in plan
    assert "spark_grouping_id" in plan
    # one scan per TABLE feeds the rollup — not one per grouping
    # level (formatted mode mentions each scan node twice: tree +
    # detail section; 2 tables -> <= 4 mentions)
    assert plan.count("Scan parquet") <= 4
