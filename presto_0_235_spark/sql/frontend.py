"""SQL front door: Presto-dialect SQL -> Spark DataFrame.

Presto's path is parse (PARSER/SqlParser.java:101, ANTLR SqlBase.g4)
-> analyze -> plan -> optimize (SURVEY.md §3.1). Spark SQL implements
the same pipeline; its ANSI dialect is close to Presto's grammar for
the whole §2 surface. What remains is a thin source-level rewrite for
the handful of syntactic divergences, plus Presto-named function
registration (functions/presto_names.py).

Rewrites (applied as regex passes — each targets one documented
grammar divergence, not general SQL transformation):
  - `CROSS JOIN UNNEST(x) [WITH ORDINALITY] [AS] t (c[, ord])`
    -> LATERAL VIEW posexplode/explode
  - quantified comparisons `op ALL/ANY (SELECT ...)`
    -> MIN/MAX scalar subquery form (Spark lacks quantified
       comparisons; Presto lowers them the same way —
       TransformQuantifiedComparisonApplyToLateralJoin.java)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from presto_0_235_spark.session import ensure_session_defaults

# The <arr> operand may itself contain one level of calls like
# split(x, ' ') — allow balanced single-depth parens.
_ARR = r"(?P<arr>[^()]*(?:\([^()]*\)[^()]*)*)"
_UNNEST_ORD = re.compile(
    rf"CROSS\s+JOIN\s+UNNEST\s*\({_ARR}\)\s+WITH\s+ORDINALITY\s+"
    r"(?:AS\s+)?(?P<t>\w+)\s*\(\s*(?P<c>\w+)\s*,\s*(?P<ord>\w+)\s*\)",
    re.IGNORECASE,
)
_UNNEST = re.compile(
    rf"CROSS\s+JOIN\s+UNNEST\s*\({_ARR}\)\s+"
    r"(?:AS\s+)?(?P<t>\w+)\s*\(\s*(?P<c>\w+)\s*\)",
    re.IGNORECASE,
)
_QUANT = re.compile(
    r"(?P<op>[<>]=?)\s*(?P<q>ALL|ANY|SOME)\s*\(\s*(?P<sub>SELECT\b[^()]*(?:\([^()]*\)[^()]*)*)\)",
    re.IGNORECASE,
)


def _rewrite_unnest(sql: str) -> str:
    sql = _UNNEST_ORD.sub(
        lambda m: (
            f"LATERAL VIEW posexplode({m.group('arr')}) {m.group('t')} "
            f"AS __pos, {m.group('c')}"
        ),
        sql,
    )
    sql = _UNNEST.sub(
        lambda m: (
            f"LATERAL VIEW explode({m.group('arr')}) {m.group('t')} "
            f"AS {m.group('c')}"
        ),
        sql,
    )
    return sql


def _rewrite_quantified(sql: str) -> str:
    """x > ALL (q) -> x > (SELECT MAX(...) FROM (q)); mirrors Presto's
    own lowering of quantified comparisons to aggregates."""

    def repl(m: re.Match) -> str:
        op, quant, sub = m.group("op"), m.group("q").upper(), m.group("sub")
        greater = op.startswith(">")
        # > ALL -> > max;  > ANY -> > min;  < ALL -> < min;  < ANY -> < max
        agg = "MAX" if (greater == (quant == "ALL")) else "MIN"
        return f"{op} (SELECT {agg}(__q.__v) FROM ({sub}) AS __q(__v))"

    return _QUANT.sub(repl, sql)


# Presto function names whose Spark twin differs only by name (or by a
# fixed argument shape). Applied lexically at call sites (`name(`) —
# the §2.9 survey's rename column. Names equal in both dialects
# (length, substr, concat, coalesce, …) need no entry.
PRESTO_FN_RENAMES: dict[str, str] = {
    # string
    "strpos": "instr",
    "codepoint": "ascii",
    "chr": "char",
    # array / map (Presto `contains` is the array-membership fn)
    "cardinality": "size",
    "contains": "array_contains",
    # aggregates
    "approx_distinct": "approx_count_distinct",
    "approx_percentile": "percentile_approx",
    "array_agg": "collect_list",
    "set_agg": "collect_set",
    "arbitrary": "any_value",
    "bool_and": "every",
    "bool_or": "any",
    # math
    "random": "rand",
    "is_nan": "isnan",
    # datetime (same-semantics renames only: day_of_week is ISO in
    # Presto but Sunday-based in Spark — NOT safe to rename lexically;
    # use functions/scalar.day_of_week_iso on the DataFrame path)
    "day_of_month": "dayofmonth",
    "day_of_year": "dayofyear",
    "week_of_year": "weekofyear",
    "to_unixtime": "unix_timestamp",
    # json
    "json_extract_scalar": "get_json_object",
    # binary
    "to_hex": "hex",
    "from_hex": "unhex",
    "to_base64": "base64",
    "from_base64": "unbase64",
}

_FN_CALL = re.compile(
    r"\b(" + "|".join(sorted(PRESTO_FN_RENAMES, key=len, reverse=True)) + r")\s*\(",
    re.IGNORECASE,
)


def _rewrite_function_names(sql: str) -> str:
    """Presto function name -> Spark function name at call sites."""
    return _FN_CALL.sub(
        lambda m: PRESTO_FN_RENAMES[m.group(1).lower()] + "(", sql
    )


def presto_to_spark_sql(sql: str) -> str:
    """Source-level Presto->Spark SQL dialect translation."""
    sql = _rewrite_unnest(sql)
    sql = _rewrite_quantified(sql)
    sql = _rewrite_function_names(sql)
    return sql


def run_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute Presto-dialect SQL against the registered catalog.

    WITH ORDINALITY emits a 1-based `__pos`-derived column; callers
    select `__pos + 1`. (Presto ordinality is 1-based,
    UnnestOperator.java:48.)
    """
    ensure_session_defaults(spark)
    return spark.sql(presto_to_spark_sql(sql))
