"""Catalog assembly: importing this module registers every query."""

from __future__ import annotations

from . import QUERIES, ORACLE_SQL  # noqa: F401
from . import crawl_catalog  # noqa: F401
from . import extras  # noqa: F401
from . import functions_catalog  # noqa: F401
from . import graph  # noqa: F401
from . import html_nested  # noqa: F401
from . import matching_pipeline  # noqa: F401
from . import relational  # noqa: F401
from . import sources_catalog  # noqa: F401
from ..operators import dedup  # noqa: F401
from ..operators import multimodal  # noqa: F401
from ..operators import similarity  # noqa: F401
from ..operators import textquality  # noqa: F401
from ..streaming import rounds  # noqa: F401
