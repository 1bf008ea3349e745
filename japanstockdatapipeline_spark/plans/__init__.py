from .registry import Query, all_members, all_queries, member, query

# importing the modules populates the registry
from . import (  # noqa: F401  (registration side effect)
    advanced,
    composed,
    core,
    events,
    llm,
    governance,  # after llm: reuses the doc_dup_clusters member oracle
    mathfmt,
    multimodal,
    relational2,
    scrape,
    similarity,
    stats,
    technical,
)

# panels fold members into driver-checked composites; import last so
# every member is registered first
from . import panels  # noqa: F401  (registration side effect)

__all__ = ["Query", "all_members", "all_queries", "member", "query"]
