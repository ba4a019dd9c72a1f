"""Import every operator module so their ``@query`` registrations run,
then expose the full QUERIES/ORACLE dicts to ``__spark_entry__.py``."""

from __future__ import annotations

from .registry import ORACLE, QUERIES

# Registration side-effect imports — order mirrors SURVEY.md §2.
from .operators import relational as _relational  # noqa: F401  B2/B6/B7
from .operators import joins as _joins  # noqa: F401  B3
from .operators import aggregates as _aggregates  # noqa: F401  B4
from .operators import windows as _windows  # noqa: F401  B5
from .functions import families as _families  # noqa: F401  B8
from .llm import text as _llm_text  # noqa: F401  B11
from .llm import similarity as _llm_similarity  # noqa: F401  B11
from .llm import dedup as _llm_dedup  # noqa: F401  B11
from .llm import multimodal as _llm_multimodal  # noqa: F401  B11
from .streaming import windows as _stream_windows  # noqa: F401  B9
from .streaming import ingest as _stream_ingest  # noqa: F401  A12/B9
from . import catalog_queries as _catalog_queries  # noqa: F401  A1-A9
from .operators import udfs as _udfs  # noqa: F401  B10
from .sources import landing as _landing  # noqa: F401  B1

__all__ = ["QUERIES", "ORACLE"]
