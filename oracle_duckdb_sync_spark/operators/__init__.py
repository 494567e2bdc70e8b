"""Relational / dataflow operators, each a pure DataFrame → DataFrame
transformation so Catalyst sees the whole plan (pushdown, pruning, AQE)."""
