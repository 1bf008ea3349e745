from .registry import Query, all_queries, query

# importing the modules populates the registry
from . import (  # noqa: F401  (registration side effect)
    advanced,
    composed,
    core,
    events,
    llm,
    mathfmt,
    multimodal,
    relational2,
    similarity,
    stats,
    technical,
)

__all__ = ["Query", "all_queries", "query"]
