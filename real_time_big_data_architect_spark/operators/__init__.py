"""Operator modules.

Each module implements one themed slice of the engine's operator inventory
(SURVEY.md §2) as declarative DataFrame builders, and exports two
registries consumed by ``plans.workload``:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  declared queries over the fixture tables,
- ``ORACLE: dict[str, str]`` — the DuckDB-SQL twin for each oracle-able
  query (omitted key ⇒ driver records the weaker rows-only check).
"""
