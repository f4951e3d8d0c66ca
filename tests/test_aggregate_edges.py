"""Aggregate-function edge-value parity corpus.

Round-11 companion to test_function_edges.py: the reference's
per-AGGREGATE tests live in
presto-main/src/test/java/com/facebook/presto/operator/aggregation/
(115 files over AbstractTestAggregationFunction — testNoPositions /
testNullOnly / testMixedNullAndNonNull drive empty-input, all-null
and null-skipping contracts; the concrete classes pin formulas).
Where a test class's fixture cannot distinguish formulas (e.g.
TestDoubleSkewnessAggregation feeds a symmetric sequence, for which
the sample and population skewness coincide at 0), the pinned ground
truth is the MAIN implementation: CentralMomentsAggregation.java,
VarianceAggregation.java, EntropyAggregation.java, etc.

Each case is one Presto aggregation query evaluated through the SQL
front door (sql/frontend.run_sql) over an inline VALUES relation and
pinned to the reference's expected value (VALUE cases) or required
to raise (ERROR cases). Engine semantics these found and fixed (via
the r11 aggregate templates in sql/scalar_templates.py):

  skewness       n < 3 -> NULL; zero variance -> NaN (Java 0/0) —
                 Spark returned 0.0 / NULL (CentralMomentsAggregation
                 .java:58-68).
  kurtosis       Presto returns SAMPLE excess kurtosis G2 with an
                 n < 4 -> NULL guard; Spark computes population g2
                 (CentralMomentsAggregation.java:70-86).
  corr           non-finite -> NULL; Spark's corr RAISES
                 DIVIDE_BY_ZERO under ANSI for zero-variance input
                 (DoubleCorrelationAggregation.java:49-58).
  entropy        log-2 entropy of counts; empty -> 0.0 not NULL;
                 negative raises (EntropyAggregation.java).
  geometric_mean exp(mean(log x)) with Java log: 0 -> -Inf (exp->0),
                 negative -> NaN; Spark's ln would NULL them.
  histogram / map_agg / multimap_agg / map_union
                 null keys skipped, duplicate keys FIRST-wins,
                 empty -> NULL (KeyValuePairs / MapUnionAggregation).
  array_agg      nulls KEPT (FeaturesConfig.legacyArrayAgg defaults
                 false in 0.235); ORDER BY form now executes (sorted
                 comparator lowering).
  min/max(x, n)  2-arg top-n array forms (MinNAggregation /
  min_by/max_by(x, y, n)  MaxByNAggregation family).
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from presto_0_235_spark.sql.frontend import run_sql

AG = "operator/aggregation"
CM = f"{AG}/CentralMomentsAggregation.java"
VA = f"{AG}/VarianceAggregation.java"
CV = f"{AG}/DoubleCovarianceAggregation.java"
CR = f"{AG}/DoubleCorrelationAggregation.java"
RG = f"{AG}/DoubleRegressionAggregation.java"
EN = f"{AG}/EntropyAggregation.java"
NAN = float("nan")
INF = float("inf")


def _case(name, sql, expected, cite, marks=()):
    return pytest.param(sql, expected, cite, id=name, marks=marks)


def _err(name, sql, cite, match=None, marks=()):
    return pytest.param(sql, cite, match, id=name, marks=marks)


VALUE_CASES = [
    # ---- count family (TestCountAggregation, TestCountNullAggregation,
    # TestCountIfAggregation) ----------------------------------------------
    _case("count_star_empty",
          "SELECT count(*) v FROM (VALUES (1)) t(x) WHERE x < 0",
          0, f"{AG}/TestCountAggregation testNoPositions"),
    _case("count_col_skips_nulls",
          "SELECT count(x) v FROM (VALUES (1), (CAST(NULL AS INT)), (2)) t(x)",
          2, f"{AG}/TestCountColumnAggregation testMixedNullAndNonNull"),
    _case("count_null_only",
          "SELECT count(x) v FROM (VALUES (CAST(NULL AS INT))) t(x)",
          0, f"{AG}/TestCountNullAggregation"),
    _case("count_if_null_cond",
          "SELECT count_if(x > 1) v FROM (VALUES (1), (2), (CAST(NULL AS INT))) t(x)",
          1, f"{AG}/TestCountIfAggregation (null predicate not counted)"),
    # ---- sum / avg --------------------------------------------------------
    _case("sum_bigint",
          "SELECT sum(x) v FROM (VALUES (1), (2), (3)) t(x)",
          6, f"{AG}/TestLongSumAggregation"),
    _case("sum_empty_null",
          "SELECT sum(x) v FROM (VALUES (1)) t(x) WHERE x < 0",
          None, f"{AG}/AbstractTestAggregationFunction testNoPositions"),
    _case("sum_double_nan_propagates",
          "SELECT sum(x) v FROM (VALUES (1.0E0), (nan())) t(x)",
          NAN, f"{AG}/TestDoubleSumAggregation (IEEE propagation)"),
    _case("sum_double_inf",
          "SELECT sum(x) v FROM (VALUES (infinity()), (1.0E0)) t(x)",
          INF, f"{AG}/TestDoubleSumAggregation"),
    _case("sum_double_inf_ninf",
          "SELECT sum(x) v FROM (VALUES (infinity()), (-infinity())) t(x)",
          NAN, f"{AG}/TestDoubleSumAggregation"),
    _case("sum_decimal_exact",
          "SELECT sum(x) v FROM (VALUES (DECIMAL '1.1'), (DECIMAL '2.2')) t(x)",
          Decimal("3.3"), f"{AG}/AbstractTestDecimalSumAggregation"),
    _case("avg_bigint_is_double",
          "SELECT avg(x) v FROM (VALUES (1), (2)) t(x)",
          1.5, f"{AG}/TestLongAverageAggregation (BIGINT avg -> DOUBLE)"),
    _case("avg_decimal_value",
          "SELECT avg(x) v FROM (VALUES (DECIMAL '1.0'), (DECIMAL '2.0')) t(x)",
          Decimal("1.5"), f"{AG}/AbstractTestDecimalAverageAggregation"),
    _case("avg_empty_null",
          "SELECT avg(x) v FROM (VALUES (1.0E0)) t(x) WHERE x < 0",
          None, f"{AG}/TestDoubleAverageAggregation testNoPositions"),
    # ---- min / max --------------------------------------------------------
    _case("max_bigint_extremes",
          "SELECT max(x) v FROM (VALUES (-9223372036854775808), "
          "(9223372036854775807)) t(x)",
          9223372036854775807, f"{AG}/TestLongMaxAggregation"),
    _case("min_varchar_lexical",
          "SELECT min(x) v FROM (VALUES ('banana'), ('apple')) t(x)",
          "apple", f"{AG}/TestVarcharMinAggregation"),
    _case("max_skips_nulls",
          "SELECT max(x) v FROM (VALUES (CAST(NULL AS INT)), (5)) t(x)",
          5, f"{AG}/AbstractTestAggregationFunction testMixedNullAndNonNull"),
    # ---- min/max 2-arg top-n (MinNAggregation / MaxNAggregation via the
    # r11 aggregate template) ----------------------------------------------
    _case("min_n_sorted_asc",
          "SELECT min(x, 2) v FROM (VALUES (5), (1), (3)) t(x)",
          [1, 3], f"{AG}/TestMinMaxNAggregation (minN ascending)"),
    _case("max_n_sorted_desc",
          "SELECT max(x, 2) v FROM (VALUES (5), (1), (3)) t(x)",
          [5, 3], f"{AG}/TestMinMaxNAggregation (maxN descending)"),
    _case("min_n_ignores_nulls",
          "SELECT min(x, 3) v FROM (VALUES (5), (CAST(NULL AS INT)), (1)) t(x)",
          [1, 5], f"{AG}/TestMinMaxNAggregation"),
    _case("max_n_capacity_over",
          "SELECT max(x, 10) v FROM (VALUES (2), (1)) t(x)",
          [2, 1], f"{AG}/TestMinMaxNAggregation (n past input size)"),
    _case("min_n_empty_null",
          "SELECT min(x, 2) v FROM (VALUES (1)) t(x) WHERE x < 0",
          None, f"{AG}/TestMinMaxNAggregation testNoPositions"),
    # ---- min_by / max_by (TestMinMaxByAggregation,
    # TestMinMaxByNAggregation) --------------------------------------------
    _case("min_by_basic",
          "SELECT min_by(x, y) v FROM (VALUES (1, 10), (2, 5)) t(x, y)",
          2, f"{AG}/TestMinMaxByAggregation"),
    _case("min_by_null_key_ignored",
          "SELECT min_by(x, y) v FROM (VALUES (1, CAST(NULL AS INT)), "
          "(2, 5)) t(x, y)",
          2, f"{AG}/TestMinMaxByAggregation (null keys skipped)"),
    _case("max_by_null_value_kept",
          "SELECT max_by(x, y) v FROM (VALUES (CAST(NULL AS INT), 9), "
          "(2, 5)) t(x, y)",
          None, f"{AG}/TestMinMaxByAggregation (value may be null)"),
    _case("max_by_n_desc",
          "SELECT max_by(x, y, 2) v FROM (VALUES (1, 10), (2, 30), "
          "(3, 20)) t(x, y)",
          [2, 3], f"{AG}/TestMinMaxByNAggregation (keys descending)"),
    _case("min_by_n_asc",
          "SELECT min_by(x, y, 2) v FROM (VALUES (1, 10), (2, 30), "
          "(3, 20)) t(x, y)",
          [1, 3], f"{AG}/TestMinMaxByNAggregation"),
    _case("max_by_n_empty_null",
          "SELECT max_by(x, y, 2) v FROM (VALUES (1, 1)) t(x, y) WHERE x < 0",
          None, f"{AG}/TestMinMaxByNAggregation testNoPositions"),
    # ---- boolean (TestBooleanAndAggregation, TestBooleanOrAggregation) ---
    _case("bool_and_skips_nulls",
          "SELECT bool_and(b) v FROM (VALUES (true), "
          "(CAST(NULL AS BOOLEAN)), (true)) t(b)",
          True, f"{AG}/TestBooleanAndAggregation"),
    _case("bool_and_false",
          "SELECT bool_and(b) v FROM (VALUES (true), (false)) t(b)",
          False, f"{AG}/TestBooleanAndAggregation"),
    _case("bool_or_false_only",
          "SELECT bool_or(b) v FROM (VALUES (false), "
          "(CAST(NULL AS BOOLEAN))) t(b)",
          False, f"{AG}/TestBooleanOrAggregation"),
    _case("every_alias",
          "SELECT every(b) v FROM (VALUES (true), (true)) t(b)",
          True, f"{AG} every == bool_and (AggregationFunction alias)"),
    _case("bool_and_empty_null",
          "SELECT bool_and(b) v FROM (VALUES (true)) t(b) WHERE b = false",
          None, f"{AG}/TestBooleanAndAggregation testNoPositions"),
    # ---- bitwise (TestBitwiseAndAggregation, TestBitwiseOrAggregation) ---
    _case("bitwise_and_agg",
          "SELECT bitwise_and_agg(x) v FROM (VALUES (12), (10)) t(x)",
          8, f"{AG}/TestBitwiseAndAggregation"),
    _case("bitwise_or_agg",
          "SELECT bitwise_or_agg(x) v FROM (VALUES (12), (10)) t(x)",
          14, f"{AG}/TestBitwiseOrAggregation"),
    _case("bitwise_and_agg_empty",
          "SELECT bitwise_and_agg(x) v FROM (VALUES (1)) t(x) WHERE x < 0",
          None, f"{AG}/TestBitwiseAndAggregation testNoPositions"),
    # ---- variance family (VarianceAggregation.java:54-110: var_samp/
    # stddev_samp n<2 -> NULL, _pop n=0 -> NULL else m2/n) -----------------
    _case("var_samp_single_null",
          "SELECT var_samp(x) v FROM (VALUES (1.0E0)) t(x)",
          None, f"{VA}:60"),
    _case("variance_alias_single_null",
          "SELECT variance(x) v FROM (VALUES (1.0E0)) t(x)",
          None, f"{VA}:54 (variance aliases var_samp)"),
    _case("var_pop_single_zero",
          "SELECT var_pop(x) v FROM (VALUES (7.0E0)) t(x)",
          0.0, f"{VA}:76"),
    _case("var_samp_1234",
          "SELECT var_samp(x) v FROM (VALUES (1.0E0), (2.0E0), (3.0E0), "
          "(4.0E0)) t(x)",
          5.0 / 3.0, f"{VA}:65 (m2/(n-1))"),
    _case("var_pop_1234",
          "SELECT var_pop(x) v FROM (VALUES (1.0E0), (2.0E0), (3.0E0), "
          "(4.0E0)) t(x)",
          1.25, f"{VA}:81 (m2/n)"),
    _case("stddev_samp_1234",
          "SELECT stddev_samp(x) v FROM (VALUES (1.0E0), (2.0E0), (3.0E0), "
          "(4.0E0)) t(x)",
          math.sqrt(5.0 / 3.0), f"{VA}:91"),
    _case("stddev_alias_single_null",
          "SELECT stddev(x) v FROM (VALUES (2.0E0)) t(x)",
          None, f"{VA}:86 (stddev aliases stddev_samp)"),
    _case("stddev_pop_1234",
          "SELECT stddev_pop(x) v FROM (VALUES (1.0E0), (2.0E0), (3.0E0), "
          "(4.0E0)) t(x)",
          math.sqrt(1.25), f"{VA}:103"),
    # ---- covariance / correlation / regression ---------------------------
    _case("covar_samp_single_null",
          "SELECT covar_samp(x, y) v FROM (VALUES (1.0E0, 2.0E0)) t(x, y)",
          None, f"{CV}:53"),
    _case("covar_pop_single_zero",
          "SELECT covar_pop(x, y) v FROM (VALUES (1.0E0, 2.0E0)) t(x, y)",
          0.0, f"{CV}:66"),
    _case("covar_samp_value",
          "SELECT covar_samp(x, y) v FROM (VALUES (1.0E0, 2.0E0), "
          "(2.0E0, 4.0E0), (3.0E0, 6.0E0)) t(x, y)",
          2.0, f"{CV} getCovarianceSample"),
    _case("covar_pop_value",
          "SELECT covar_pop(x, y) v FROM (VALUES (1.0E0, 2.0E0), "
          "(2.0E0, 4.0E0), (3.0E0, 6.0E0)) t(x, y)",
          4.0 / 3.0, f"{CV} getCovariancePopulation"),
    _case("corr_perfect",
          "SELECT corr(y, x) v FROM (VALUES (1.0E0, 3.0E0), (2.0E0, 4.0E0), "
          "(3.0E0, 5.0E0)) t(x, y)",
          1.0, f"{AG}/TestDoubleCorrelationAggregation"),
    _case("corr_negative",
          "SELECT corr(y, x) v FROM (VALUES (1.0E0, 5.0E0), (2.0E0, 4.0E0), "
          "(3.0E0, 3.0E0)) t(x, y)",
          -1.0, f"{AG}/TestDoubleCorrelationAggregation"),
    _case("corr_constant_null",
          "SELECT corr(x, y) v FROM (VALUES (2.0E0, 1.0E0), (2.0E0, 4.0E0), "
          "(2.0E0, 9.0E0)) t(x, y)",
          None, f"{AG}/TestDoubleCorrelationAggregation testDivisionByZero"),
    _case("corr_single_null",
          "SELECT corr(x, y) v FROM (VALUES (1.0E0, 2.0E0)) t(x, y)",
          None, f"{CR}:49-58 (non-finite -> NULL)"),
    _case("regr_slope_line",
          "SELECT regr_slope(y, x) v FROM (VALUES (1.0E0, 3.0E0), "
          "(2.0E0, 5.0E0), (3.0E0, 7.0E0)) t(x, y)",
          2.0, f"{AG}/TestDoubleRegrSlopeAggregation"),
    _case("regr_intercept_line",
          "SELECT regr_intercept(y, x) v FROM (VALUES (1.0E0, 3.0E0), "
          "(2.0E0, 5.0E0), (3.0E0, 7.0E0)) t(x, y)",
          1.0, f"{AG}/TestDoubleRegrInterceptAggregation"),
    _case("regr_slope_constant_null",
          "SELECT regr_slope(y, x) v FROM (VALUES (1.0E0, 2.0E0), "
          "(4.0E0, 2.0E0)) t(y, x)",
          None, f"{RG}:52-60 (non-finite -> NULL)"),
    _case("regr_slope_single_null",
          "SELECT regr_slope(y, x) v FROM (VALUES (1.0E0, 2.0E0)) t(y, x)",
          None, f"{RG}:52-60"),
    # ---- central moments (CentralMomentsAggregation.java:58-86) ----------
    _case("skewness_n2_null",
          "SELECT skewness(x) v FROM (VALUES (1.0E0), (2.0E0)) t(x)",
          None, f"{CM}:61 (n < 3 -> NULL)"),
    _case("skewness_value",
          "SELECT skewness(x) v FROM (VALUES (1.0E0), (2.0E0), (4.0E0), "
          "(8.0E0)) t(x)",
          0.6568077344996993, f"{CM}:65 (sqrt(n)*m3/m2^1.5)"),
    _case("skewness_symmetric_zero",
          "SELECT skewness(x) v FROM (VALUES (1.0E0), (2.0E0), (3.0E0)) t(x)",
          0.0, f"{AG}/TestDoubleSkewnessAggregation (symmetric -> 0)"),
    _case("skewness_constant_nan",
          "SELECT skewness(x) v FROM (VALUES (2.0E0), (2.0E0), (2.0E0)) t(x)",
          NAN, f"{CM}:65 (zero variance: Java 0/0 = NaN)"),
    _case("kurtosis_n3_null",
          "SELECT kurtosis(x) v FROM (VALUES (1.0E0), (2.0E0), (4.0E0)) t(x)",
          None, f"{CM}:77 (n < 4 -> NULL)"),
    _case("kurtosis_sample_g2",
          "SELECT kurtosis(x) v FROM (VALUES (1.0E0), (2.0E0), (4.0E0), "
          "(8.0E0), (16.0E0)) t(x)",
          1.3037634408602123, f"{CM}:83 (sample G2, matches "
          "TestDoubleKurtosisAggregation's commons-math Kurtosis)"),
    _case("kurtosis_constant_nan",
          "SELECT kurtosis(x) v FROM (VALUES (2.0E0), (2.0E0), (2.0E0), "
          "(2.0E0)) t(x)",
          NAN, f"{CM}:83 (zero variance: Java 0/0 = NaN)"),
    # ---- geometric mean --------------------------------------------------
    _case("geometric_mean_double",
          "SELECT geometric_mean(x) v FROM (VALUES (1.0E0), (4.0E0), "
          "(16.0E0)) t(x)",
          4.0, f"{AG}/TestDoubleGeometricMeanAggregation"),
    _case("geometric_mean_bigint",
          "SELECT geometric_mean(x) v FROM (VALUES (2), (8)) t(x)",
          4.0, f"{AG}/TestLongGeometricMeanAggregation"),
    _case("geometric_mean_zero",
          "SELECT geometric_mean(x) v FROM (VALUES (0.0E0), (4.0E0)) t(x)",
          0.0, f"{AG} DoubleGeometricMeanAggregation (log 0 = -Inf, "
          "exp -> 0)"),
    _case("geometric_mean_negative_nan",
          "SELECT geometric_mean(x) v FROM (VALUES (-1.0E0), (4.0E0)) t(x)",
          NAN, f"{AG} DoubleGeometricMeanAggregation (Java log(neg) = NaN)"),
    _case("geometric_mean_empty_null",
          "SELECT geometric_mean(x) v FROM (VALUES (1.0E0)) t(x) WHERE x < 0",
          None, f"{AG}/TestDoubleGeometricMeanAggregation testNoPositions"),
    # ---- entropy (EntropyAggregation.java: empty/zero-sum -> 0.0) --------
    _case("entropy_uniform_two",
          "SELECT entropy(c) v FROM (VALUES (1), (1)) t(c)",
          1.0, f"{EN} (two equal counts: 1 bit)"),
    _case("entropy_quarter_half",
          "SELECT entropy(c) v FROM (VALUES (2), (2), (4)) t(c)",
          1.5, f"{EN} (p = 1/4, 1/4, 1/2)"),
    _case("entropy_single_zero",
          "SELECT entropy(c) v FROM (VALUES (5)) t(c)",
          0.0, f"{EN} (single mass point)"),
    _case("entropy_zero_counts",
          "SELECT entropy(c) v FROM (VALUES (0), (0)) t(c)",
          0.0, f"{EN} (zero-sum input defined as 0)"),
    _case("entropy_empty_zero",
          "SELECT entropy(c) v FROM (VALUES (1)) t(c) WHERE c < 0",
          0.0, f"{EN} (empty input -> 0.0, NOT null)"),
    _case("entropy_null_only_zero",
          "SELECT entropy(c) v FROM (VALUES (CAST(NULL AS BIGINT))) t(c)",
          0.0, f"{EN} (null inputs are no-ops)"),
    # ---- histogram / map_agg / multimap_agg / map_union ------------------
    _case("histogram_counts",
          "SELECT histogram(x) v FROM (VALUES ('a'), ('b'), ('a')) t(x)",
          {"a": 2, "b": 1}, f"{AG}/TestHistogram"),
    _case("histogram_ignores_nulls",
          "SELECT histogram(x) v FROM (VALUES (CAST(NULL AS VARCHAR)), "
          "('a')) t(x)",
          {"a": 1}, f"{AG}/TestHistogram testWithNulls"),
    _case("histogram_all_null",
          "SELECT histogram(x) v FROM (VALUES (CAST(NULL AS VARCHAR))) t(x)",
          None, f"{AG}/TestHistogram (no pairs -> NULL)"),
    _case("map_agg_first_wins",
          "SELECT map_agg(k, v) v FROM (VALUES ('a', 1), ('a', 2), "
          "('b', 3)) t(k, v)",
          {"a": 1, "b": 3},
          f"{AG}/KeyValuePairs.java:110-118 (duplicate keys: first wins)"),
    _case("map_agg_null_key_skipped",
          "SELECT map_agg(k, v) v FROM (VALUES (CAST(NULL AS VARCHAR), 1), "
          "('a', 2)) t(k, v)",
          {"a": 2}, f"{AG}/MapAggregationFunction.java:110 "
          "(key channel non-nullable)"),
    _case("map_agg_null_value_kept",
          "SELECT map_agg(k, v) v FROM (VALUES ('a', CAST(NULL AS INT))) "
          "t(k, v)",
          {"a": None}, f"{AG}/MapAggregationFunction.java:110 "
          "(value channel nullable)"),
    _case("multimap_agg_groups",
          "SELECT multimap_agg(k, v) v FROM (VALUES ('a', 1), ('a', 2), "
          "('b', 3)) t(k, v)",
          {"a": [1, 2], "b": [3]}, f"{AG}/MultimapAggregationFunction"),
    _case("map_union_first_wins",
          "SELECT map_union(m) v FROM (VALUES (MAP(ARRAY['a'], ARRAY[1])), "
          "(MAP(ARRAY['a', 'b'], ARRAY[2, 3]))) t(m)",
          {"a": 1, "b": 3}, f"{AG}/MapUnionAggregation"),
    _case("map_union_empty_null",
          "SELECT map_union(m) v FROM (VALUES (MAP(ARRAY['a'], ARRAY[1]))) "
          "t(m) WHERE false",
          None, f"{AG}/MapUnionAggregation testNoPositions"),
    # ---- array_agg (nulls KEPT: FeaturesConfig.java:92 legacyArrayAgg
    # defaults false in 0.235; order-by form: sortedaccumulator) -----------
    _case("array_agg_keeps_nulls",
          "SELECT array_agg(x) v FROM (VALUES (1), (CAST(NULL AS INT)), "
          "(2)) t(x)",
          [1, None, 2], f"{AG}/arrayagg/ArrayAggregationFunction.java:120"),
    _case("array_agg_order_desc",
          "SELECT array_agg(x ORDER BY x DESC) v FROM (VALUES (1), (3), "
          "(2)) t(x)",
          [3, 2, 1], "sql/gen/OrderingCompiler via sortedaggregation"),
    _case("array_agg_order_two_keys",
          "SELECT array_agg(x ORDER BY y DESC, x ASC) v FROM "
          "(VALUES (1, 1), (2, 2), (3, 2)) t(x, y)",
          [2, 3, 1], "sortedaggregation (multi-key sort items)"),
    _case("array_agg_order_nulls_last_default",
          "SELECT array_agg(x ORDER BY y) v FROM (VALUES (1, 10), "
          "(2, CAST(NULL AS INT)), (3, 5)) t(x, y)",
          [3, 1, 2], "PlannerUtils.java:39-51 (default NULLS LAST)"),
    _case("array_agg_empty_null",
          "SELECT array_agg(x) v FROM (VALUES (1)) t(x) WHERE x < 0",
          None, f"{AG}/TestArrayAggregation testEmpty"),
    # ---- approx aggregates -----------------------------------------------
    _case("approx_distinct_empty_zero",
          "SELECT approx_distinct(x) v FROM (VALUES (1)) t(x) WHERE x < 0",
          0, f"{AG}/AbstractTestApproximateCountDistinct (empty -> 0, "
          "NOT null)"),
    _case("approx_distinct_null_only_zero",
          "SELECT approx_distinct(x) v FROM (VALUES (CAST(NULL AS BIGINT))) "
          "t(x)",
          0, f"{AG}/AbstractTestApproximateCountDistinct testNullOnly"),
    _case("approx_distinct_small_exact",
          "SELECT approx_distinct(x) v FROM (VALUES (1), (2), (3), (1)) t(x)",
          3, f"{AG}/TestApproximateCountDistinctLong (exact at small n)"),
    _case("approx_percentile_median",
          "SELECT approx_percentile(x, 0.5E0) v FROM (VALUES (1.0E0), "
          "(2.0E0), (3.0E0)) t(x)",
          2.0, f"{AG}/TestApproximatePercentileAggregation"),
    _case("approx_percentile_accuracy_form",
          "SELECT approx_percentile(x, 0.5E0, 0.01E0) v FROM "
          "(VALUES (1.0E0), (2.0E0), (3.0E0)) t(x)",
          2.0, f"{AG}/ApproximateLongPercentileAggregations.java:50-57 "
          "(3-arg DOUBLE third = accuracy)"),
    _case("approx_percentile_weighted",
          "SELECT approx_percentile(x, 0.5E0, w) v FROM (VALUES "
          "(1.0E0, 1), (2.0E0, 1), (3.0E0, 3)) t(x, w)",
          3.0, f"{AG}/ApproximateLongPercentileAggregations.java:59-68 "
          "(3-arg BIGINT third = weight; lowered to exact weighted "
          "percentile)"),
    _case("approx_percentile_weighted_accuracy",
          "SELECT approx_percentile(x, 0.5E0, w, 0.01E0) v FROM (VALUES "
          "(1.0E0, 1), (2.0E0, 1), (3.0E0, 3)) t(x, w)",
          3.0, f"{AG}/ApproximateLongPercentileAggregations.java:70-80"),
    _case("approx_percentile_bounds",
          "SELECT approx_percentile(x, 1.0E0) - approx_percentile(x, 0.0E0) "
          "v FROM (VALUES (1.0E0), (2.0E0), (3.0E0)) t(x)",
          2.0, f"{AG}/TestApproximatePercentileAggregation (p=0 -> min, "
          "p=1 -> max)"),
    # ---- misc -------------------------------------------------------------
    _case("arbitrary_single",
          "SELECT arbitrary(x) v FROM (VALUES (42)) t(x)",
          42, f"{AG}/TestArbitraryAggregation"),
    _case("arbitrary_null_only",
          "SELECT arbitrary(x) v FROM (VALUES (CAST(NULL AS INT))) t(x)",
          None, f"{AG}/TestArbitraryAggregation testNullOnly"),
    _case("reduce_agg_sum",
          "SELECT reduce_agg(x, 0, (a, b) -> a + b, (a, b) -> a + b) v "
          "FROM (VALUES (1), (2), (3)) t(x)",
          6, f"{AG} ReduceAggregationFunction"),
    _case("sum_filter_clause",
          "SELECT sum(x) FILTER (WHERE x > 1) v FROM (VALUES (1), (2), "
          "(3)) t(x)",
          5, "FILTER clause over aggregate (AbstractTestQueries "
          "testAggregationFilter)"),
]

ERROR_CASES = [
    _err("sum_bigint_overflow",
         "SELECT sum(x) v FROM (VALUES (9223372036854775807), (1)) t(x)",
         f"{AG}/TestLongSumAggregation (BigintOperators.add overflow)"),
    _err("entropy_negative_count",
         "SELECT entropy(c) v FROM (VALUES (-5)) t(c)",
         f"{EN}:52-56", "Entropy count argument must be non-negative"),
]


def _canon(v):
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _values_equal(got, want) -> bool:
    if want is None or got is None:
        return got is None and want is None
    if isinstance(want, float):
        if math.isnan(want):
            return isinstance(got, float) and math.isnan(got)
        if not isinstance(got, (int, float)) or isinstance(got, bool):
            return False
        if math.isinf(want):
            return got == want
        return math.isclose(float(got), want, rel_tol=1e-12, abs_tol=1e-300)
    if isinstance(want, Decimal):
        return isinstance(got, Decimal) and got == want
    if isinstance(want, bool) or isinstance(got, bool):
        return got is want
    if isinstance(want, (list, tuple)):
        if not isinstance(got, (list, tuple)) or len(got) != len(want):
            return False
        return all(_values_equal(g, w) for g, w in zip(got, want))
    if isinstance(want, dict):
        if not isinstance(got, dict) or set(got) != set(want):
            return False
        return all(_values_equal(got[k], want[k]) for k in want)
    return got == want


@pytest.mark.parametrize("sql,expected,cite", VALUE_CASES)
def test_aggregate_edge_value(spark, sql, expected, cite):
    got = run_sql(spark, sql).collect()[0][0]
    assert _values_equal(got, expected), (
        f"{sql} [{cite}]: got {got!r} ({type(got).__name__}), "
        f"expected {expected!r}"
    )


@pytest.mark.parametrize("sql,cite,match", ERROR_CASES)
def test_aggregate_edge_error(spark, sql, cite, match):
    with pytest.raises(Exception, match=match):
        run_sql(spark, sql).collect()
