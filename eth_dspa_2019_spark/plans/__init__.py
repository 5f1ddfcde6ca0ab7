"""Query registry: every operator from SURVEY.md §2 is exposed as a named
query over the driver testdata, with a DuckDB oracle SQL string where the
semantics are ANSI-SQL-expressible.

Importing this package registers all queries.
"""

from .registry import QuerySpec, all_queries, oracle_map, register

# Importing the plan modules populates the registry.
from . import relational  # noqa: E402,F401
from . import windowed  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import social  # noqa: E402,F401
from . import task2  # noqa: E402,F401
from . import task3  # noqa: E402,F401
from . import cleaning  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import misc  # noqa: E402,F401
from . import intervals  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import corpus  # noqa: E402,F401

__all__ = ["QuerySpec", "register", "all_queries", "oracle_map"]
