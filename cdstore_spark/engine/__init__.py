"""Distributed Spark pipeline — stages S1..S10 (SURVEY.md §2.C).

Declarative DataFrame plans wherever relational semantics allow (Catalyst
does pushdown/pruning/AQE for free); Arrow-vectorized mapInPandas only for
the four kernel stages Spark cannot express (decode+CDC featurize, suffix-
array verify). No per-row Python anywhere (BASELINE.json input_hint).
"""
