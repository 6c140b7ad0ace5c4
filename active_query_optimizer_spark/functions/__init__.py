"""Column-expression builders shared by the operator inventory.

``texttools`` and ``vector`` are *dual-rendering*: each primitive has a
Spark ``Column`` builder and a DuckDB SQL-snippet builder driven by the same
constants, so data-pipeline operators (dedup, similarity, text analysis) can
ship exact value-hash oracles instead of weaker rows-only checks.
"""

from . import texttools, vector  # noqa: F401
