"""Differential expression fuzzing: random expressions from a
dialect-common grammar must evaluate identically on Spark and DuckDB.

This is the property-based generalization of the per-query oracles —
the reference's differential methodology (presto-tests
QueryAssertions.java / AbstractTestQueries.java runs fixed corpora;
hypothesis explores the expression space instead). The grammar stays
inside the subset where both engines' semantics provably coincide:

  - BIGINT arithmetic (+ - *) over small operands (no overflow, no
    division -> no div-by-zero discipline divergence)
  - comparisons and boolean connectives (two-valued here: operands
    are non-NULL)
  - searched CASE, greatest/least, abs, simple string concat/length

Each generated expression is ONE SQL text evaluated by both engines
over the same inline rows — any mismatch is a real dialect or
semantics drift in the front door's common subset.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# Randomized property sweeps; the deterministic pins they originally
# surfaced run in the default suite (corpus/pin modules).
pytestmark = pytest.mark.slow

ROWS = [(i, (i * 7) % 13 - 6, f"s{i % 5}") for i in range(-5, 10)]


def _int_expr(depth: int):
    leaf = st.sampled_from(["a", "b", "1", "2", "3", "7", "0", "-4"])
    if depth <= 0:
        return leaf
    sub = st.deferred(lambda: _int_expr(depth - 1))
    return st.one_of(
        leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"greatest({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"least({t[0]}, {t[1]})"),
        sub.map(lambda e: f"abs({e})"),
        st.tuples(st.deferred(lambda: _bool_expr(depth - 1)), sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} THEN {t[1]} ELSE {t[2]} END)"
        ),
    )


def _bool_expr(depth: int):
    cmp = st.tuples(
        _int_expr(depth - 1),
        st.sampled_from(["<", "<=", "=", ">", ">=", "<>"]),
        _int_expr(depth - 1),
    ).map(lambda t: f"({t[0]} {t[1]} {t[2]})")
    if depth <= 0:
        return cmp
    sub = st.deferred(lambda: _bool_expr(depth - 1))
    return st.one_of(
        cmp,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"(NOT {e})"),
    )


@pytest.fixture(scope="module")
def fuzz_views(spark):
    df = spark.createDataFrame(ROWS, schema="a long, b long, s string")
    df.createOrReplaceTempView("fuzz_t")
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_t (a BIGINT, b BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO fuzz_t VALUES (?, ?, ?)", ROWS)
    return spark, con


@given(expr=_int_expr(3))
@settings(max_examples=100, deadline=None)
def test_int_expressions_agree(fuzz_views, expr):
    spark, con = fuzz_views
    sql = f"SELECT a, CAST({expr} AS BIGINT) AS v FROM fuzz_t"
    srows = sorted(tuple(r) for r in spark.sql(sql).collect())
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == drows, f"\nexpr: {expr}\nspark: {srows}\nduck:  {drows}"


@given(expr=_bool_expr(3))
@settings(max_examples=100, deadline=None)
def test_bool_expressions_agree(fuzz_views, expr):
    spark, con = fuzz_views
    sql = f"SELECT a, ({expr}) AS v FROM fuzz_t"
    srows = sorted(tuple(r) for r in spark.sql(sql).collect())
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == drows, f"\nexpr: {expr}\nspark: {srows}\nduck:  {drows}"


# ---------------------------------------------------------------------------
# Query-level fuzzing through the SQL FRONT DOOR (round 8): random
# SELECT statements (projection/filter/group/order/limit/join shapes)
# over two small tables, the SAME Presto-dialect text run through
# sql/frontend.run_sql and on DuckDB. This exercises the dialect
# rewrites (NULLS LAST ordering, function renames) on texts nobody
# hand-wrote — the property-based analog of test_reference_corpus.
# ---------------------------------------------------------------------------

_FQ_INT = st.sampled_from(
    ["a", "b", "a + b", "a - b", "2 * a", "a % 5", "abs(b - 3)",
     "greatest(a, b)", "least(a, b + 1)"]
)
_FQ_BOOL = st.sampled_from(
    ["a < b", "a >= 3", "b <> 2", "a + b < 10", "a % 2 = 0",
     "(a < b) AND (b > 0)", "(a > 2) OR (b < 1)", "s LIKE 's1%'",
     "s IN ('s0', 's2', 's4')"]
)


@st.composite
def _fq_query(draw):
    grouped = draw(st.booleans())
    where = draw(st.one_of(st.none(), _FQ_BOOL))
    limit = draw(st.one_of(st.none(), st.integers(1, 8)))
    if grouped:
        key = draw(st.sampled_from(["s", "a % 3", "b % 2"]))
        aggs = draw(
            st.lists(
                st.sampled_from(
                    ["COUNT(*)", "SUM(a)", "SUM(a + b)", "MIN(b)",
                     "MAX(a)", "COUNT(DISTINCT b)"]
                ),
                min_size=1, max_size=3, unique=True,
            )
        )
        items = [f"{key} AS k"] + [
            f"{a} AS c{i}" for i, a in enumerate(aggs)
        ]
        order = "ORDER BY k" if limit else ""
        sql = f"SELECT {', '.join(items)} FROM fuzz_t"
        if where:
            sql += f" WHERE {where}"
        sql += f" GROUP BY {key} {order}"
    else:
        exprs = draw(
            st.lists(_FQ_INT, min_size=1, max_size=3, unique=True)
        )
        items = ["a AS pk"] + [f"{e} AS c{i}" for i, e in enumerate(exprs)]
        if draw(st.booleans()):
            win = draw(
                st.sampled_from(
                    ["row_number() OVER (ORDER BY a)",
                     "rank() OVER (ORDER BY b, a)",
                     "sum(b) OVER (ORDER BY a)",
                     "lag(b) OVER (ORDER BY a)",
                     "count(*) OVER (PARTITION BY s)"]
                )
            )
            items.append(f"{win} AS w")
        order = "ORDER BY pk" if limit else ""
        sql = f"SELECT {', '.join(items)} FROM fuzz_t"
        if where:
            sql += f" WHERE {where}"
        sql += f" {order}"
    if limit:
        sql += f" LIMIT {limit}"
    return sql, limit is not None


@given(q=_fq_query())
@settings(max_examples=80, deadline=None)
def test_front_door_queries_agree(fuzz_views, q):
    from presto_0_235_spark.sql.frontend import run_sql

    spark, con = fuzz_views
    sql, ordered = q
    srows = [tuple(r) for r in run_sql(spark, sql).collect()]
    drows = [tuple(r) for r in con.execute(sql).fetchall()]
    if not ordered:
        srows, drows = sorted(srows), sorted(drows)
    assert srows == drows, f"\nsql: {sql}\nspark: {srows}\nduck: {drows}"


@given(
    parts=st.lists(
        st.sampled_from(["s", "'x'", "s", "'_'", "upper(s)", "lower(s)"]),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=60, deadline=None)
def test_string_expressions_agree(fuzz_views, parts):
    spark, con = fuzz_views
    concat = " || ".join(parts)
    sql = (
        f"SELECT a, ({concat}) AS v, length({concat}) AS n, "
        f"substr({concat}, 1, 3) AS head FROM fuzz_t"
    )
    srows = sorted(
        tuple(int(x) if isinstance(x, int) else x for x in r)
        for r in spark.sql(sql).collect()
    )
    drows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == drows, f"\nexpr: {concat}"


# ---- codec roundtrip properties (pure-Python, no Spark session) ------------
# The r7 byte codecs must hold for ARBITRARY inputs, not just the
# fixture domains the oracles sample — hypothesis explores the space.


class TestAvroCodecProperties:
    @settings(max_examples=200, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(-(2**62), 2**62)),
                st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, allow_infinity=True),
                ),
                st.one_of(st.none(), st.text(max_size=40)),
                st.one_of(st.none(), st.binary(max_size=40)),
                st.one_of(st.none(), st.booleans()),
            ),
            max_size=30,
        )
    )
    def test_container_roundtrip_is_identity(self, rows):
        from presto_0_235_spark.sources import avro as A

        fields = [
            ("i", A.LONG), ("d", A.DOUBLE), ("s", A.STRING),
            ("b", A.BYTES), ("f", A.BOOLEAN),
        ]
        data = A.write_container(rows, fields, b"0123456789abcdef")
        got_fields, got_rows = A.read_container(data)
        assert [n for n, _ in got_fields] == [n for n, _ in fields]
        assert got_rows == rows


class TestPageFileCodecProperties:
    @settings(max_examples=150, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(-(2**62), 2**62)),
                st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, allow_infinity=True),
                ),
                st.one_of(st.none(), st.text(max_size=40)),
                st.one_of(st.none(), st.binary(max_size=40)),
            ),
            max_size=40,
        ),
        compression=st.sampled_from(["none", "zstd"]),
        page_positions=st.sampled_from([3, 7, 4096]),
    )
    def test_file_roundtrip_is_identity(
        self, rows, compression, page_positions, tmp_path_factory
    ):
        import pandas as pd

        from presto_0_235_spark.sources import pagefile as pf

        p = str(tmp_path_factory.mktemp("pgf") / "t.pagefile")
        pdf = pd.DataFrame(
            {
                "i": pd.array([r[0] for r in rows], dtype=object),
                "d": pd.array([r[1] for r in rows], dtype=object),
                "s": pd.array([r[2] for r in rows], dtype=object),
                "b": pd.array([r[3] for r in rows], dtype=object),
            }
        )
        kinds = [pf.LONG, pf.DOUBLE, pf.STRING, pf.BINARY]
        pf.write_file(
            p, pdf, kinds, compression=compression,
            page_positions=page_positions, stripe_max_bytes=2048,
        )
        offsets, fo = pf.read_footer(p)
        cols = [[] for _ in kinds]
        for i, start in enumerate(offsets):
            end = offsets[i + 1] if i + 1 < len(offsets) else fo
            for page_cols in pf.read_stripe(p, start, end, kinds):
                for j, c in enumerate(page_cols):
                    cols[j].extend(c)
        assert cols[0] == [r[0] for r in rows]
        assert cols[1] == [r[1] for r in rows]
        assert cols[2] == [r[2] for r in rows]
        assert cols[3] == [r[3] for r in rows]


class TestHllWireProperties:
    @settings(max_examples=200, deadline=None)
    @given(
        regs=st.dictionaries(
            st.integers(0, 2047), st.integers(1, 60), max_size=300
        )
    )
    def test_dense_roundtrip_is_identity(self, regs):
        from presto_0_235_spark.operators import sketches as S

        _, back = S.hll_deserialize_dense(S.hll_serialize_dense(regs))
        assert back == regs

    @settings(max_examples=100, deadline=None)
    @given(
        a=st.dictionaries(
            st.integers(0, 2047), st.integers(1, 60), max_size=200
        ),
        b=st.dictionaries(
            st.integers(0, 2047), st.integers(1, 60), max_size=200
        ),
    )
    def test_wire_merge_matches_register_max(self, a, b):
        from presto_0_235_spark.operators import sketches as S

        wire = S.hll_merge_bytes(
            S.hll_serialize_dense(a), S.hll_serialize_dense(b)
        )
        _, merged = S.hll_deserialize_dense(wire)
        assert merged == {
            k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)
        }


# ---------------------------------------------------------------------------
# Quantified-comparison fuzzing (r10): every op x quantifier over
# subqueries that hit all the lowering's CASE arms — empty,
# single-row, multi-row, and NULL-bearing — with both NULL and
# non-NULL left-hand sides, in projection position (the strictest
# context: filters erase the NULL/FALSE distinction, projections
# don't). The front door lowers these to Presto's count-guarded CASE
# (TransformQuantifiedComparisonApplyToLateralJoin.java); DuckDB
# implements the SQL standard natively — agreement means the
# 3-valued semantics are right.
# ---------------------------------------------------------------------------

_Q_OPS = ["<", "<=", ">", ">=", "=", "<>"]
_Q_QUANTS = ["ANY", "ALL", "SOME"]
_Q_SUBFILTERS = [
    "b > 100",          # empty subquery
    "b = 1",            # single value
    "b < 3",            # multi-row
    "TRUE",             # all rows (both NULL and non-NULL b)
]


@pytest.fixture(scope="module")
def quant_views(spark):
    rows = [(1, 1), (2, 3), (3, None), (None, 2), (4, 1)]
    df = spark.createDataFrame(rows, schema="a long, b long")
    df.createOrReplaceTempView("fuzz_q")
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_q (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO fuzz_q VALUES (?, ?)", rows)
    return spark, con


@given(
    op=st.sampled_from(_Q_OPS),
    quant=st.sampled_from(_Q_QUANTS),
    subfilter=st.sampled_from(_Q_SUBFILTERS),
)
@settings(max_examples=72, deadline=None)
def test_quantified_comparisons_agree(quant_views, op, quant, subfilter):
    from presto_0_235_spark.sql.frontend import run_sql

    spark, con = quant_views
    sql = (
        f"SELECT a, a {op} {quant} "
        f"(SELECT b FROM fuzz_q WHERE {subfilter}) AS v FROM fuzz_q"
    )
    key = lambda row: tuple((x is None, str(x)) for x in row)
    srows = sorted((tuple(r) for r in run_sql(spark, sql).collect()), key=key)
    drows = sorted((tuple(r) for r in con.execute(sql).fetchall()), key=key)
    assert srows == drows, f"\nsql: {sql}\nspark: {srows}\nduck:  {drows}"
