from .registry import Query, all_queries, query

# importing the modules populates the registry
from . import core, events, llm, similarity  # noqa: F401  (registration side effect)

__all__ = ["Query", "all_queries", "query"]
