"""Query plan catalog.

Importing this package populates the registry with every declared query;
``registry.queries()`` / ``registry.oracle_sql()`` are the driver contract.
"""

from . import relational  # noqa: F401
from . import tpch_extra  # noqa: F401

try:  # modules added incrementally; keep the registry importable throughout
    from . import llm_ops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import streaming_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import connector_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from . import tpch_full  # noqa: F401
except ImportError:  # pragma: no cover
    pass

from .registry import REGISTRY, oracle_sql, queries  # noqa: F401
