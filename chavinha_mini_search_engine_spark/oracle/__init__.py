"""Pure-Python pinned reference semantics (no Spark imports).

Every module here is the single source of truth for one behavior of the
reference engine; the Spark operators are tested byte-/rank-identical
against these.
"""
