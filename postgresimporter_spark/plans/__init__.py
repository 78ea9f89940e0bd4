"""Query plans: the engine's declared query surface.

``catalog.registry()`` returns every named query as a (DataFrame builder,
DuckDB oracle SQL) pair — the contract consumed by ``__spark_entry__``.
"""

from .catalog import registry, QueryDef

__all__ = ["registry", "QueryDef"]
