"""Relational operator builders (SURVEY.md §2).

Each module re-expresses one family of Presto execution operators as
DataFrame compositions. The physical strategy (hash vs broadcast vs
sort-merge, partial aggregation, spill) is Catalyst/Tungsten's job —
these builders declare semantics, plus the Presto-specific defaults
that differ from Spark's (null ordering, null-aware NOT IN, 1-based
ordinality, ...).
"""
