"""Query-plan inventory. Importing this package registers every query
module into the shared registry."""

from .queries import QuerySpec, all_oracles, all_queries, bench_queries, registry

# registration side-effects (each module adds its queries to the registry)
from . import flow_queries as _flow_queries  # noqa: F401, E402
from . import event_queries as _event_queries  # noqa: F401, E402
from . import extension_queries as _extension_queries  # noqa: F401, E402
from . import tpch_queries as _tpch_queries  # noqa: F401, E402

__all__ = [
    "QuerySpec",
    "all_oracles",
    "all_queries",
    "bench_queries",
    "registry",
]
