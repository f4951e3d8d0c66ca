"""Replica of the EXTERNAL driver gate's pandas canonicalizer.

The driver's correctness harness converts both the Spark result and
the DuckDB oracle result to pandas and canonicalizes with
``DataFrame.sort_values`` over every column before value-hashing.
``sort_values`` factorizes object columns through a pandas hash
table, so any UNHASHABLE cell — numpy ndarray (what an ARRAY column
becomes under Arrow), list, dict (a MAP/ROW column) — raises
``TypeError: unhashable type`` and the gate records a red row even
when the query is value-correct. That is exactly how
``sql_lambda_functions`` failed the r10 gate (CORRECTNESS_r10.json
carries the traceback: sort_values -> Categorical -> factorize ->
"unhashable type: 'numpy.ndarray'").

This module re-creates that canonicalization so a LOCAL test
(tests/test_registry.py::test_priority_queries_gate_shape_safe) can
run every ``_PRIORITY`` query through it BEFORE a rotation ships —
the shape check the r10 rotation was missing.

Only the failure-relevant behavior is replicated (column-wise
sort_values + per-cell canonicalization); the hash itself is not the
point — a query that survives ``canonicalize`` here cannot crash the
driver's sorter.
"""

from __future__ import annotations

import pandas as pd


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver-gate canonicalization: stable column order, then
    ``sort_values`` over ALL columns — raising exactly where the
    external harness raises (unhashable / unorderable cells)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns):
        # kind="stable" irrelevant to the failure mode; the factorize
        # path inside lexsort_indexer is what rejects ndarray cells.
        pdf = pdf.sort_values(by=list(pdf.columns))
    return pdf.reset_index(drop=True)


def assert_gate_shape_safe(pdf: pd.DataFrame, name: str = "?") -> None:
    """Raise AssertionError (with the offending column) if the frame
    would crash the external gate's canonicalizer."""
    try:
        canonicalize(pdf)
    except TypeError as exc:  # the driver's exact failure class
        bad = [
            c
            for c in pdf.columns
            if pdf[c].map(lambda v: isinstance(v, (list, dict, set))
                          or type(v).__name__ == "ndarray").any()
        ]
        raise AssertionError(
            f"query {name!r} returns a column the external gate "
            f"cannot sort (driver sort_values raises {exc!r}); "
            f"offending columns: {bad or 'unknown'} — flatten with "
            "array_join/to_json before rotating into _PRIORITY"
        ) from exc
