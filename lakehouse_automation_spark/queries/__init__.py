"""Named-query registry: the implementation of SURVEY.md §2.

Every operator in the survey's inventory is a key here, with

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (DataFrame-API
  first; Catalyst picks the physical plan), and
- where SQL-expressible, a DuckDB oracle SQL string used by the
  driver's correctness gate (row-count + schema + order-insensitive
  value hash). Keys without an oracle get rows-only checks — kept to
  the genuinely non-SQL-expressible (LSH, streaming state).

Determinism conventions (SURVEY §5, FIXTURES §4):
- money aggregates go through DECIMAL so sums are order-independent
  and exact, then CAST to DOUBLE in both engines;
- every computed column is aliased identically in Spark and oracle;
- float expressions use the same IEEE operation order in both engines;
- timestamps returned to the driver are us-precision (oracle casts
  ns->TIMESTAMP explicitly).
"""

from __future__ import annotations

from .base import Q, REGISTRY

from . import relational      # noqa: E402,F401
from . import analytic_sql    # noqa: E402,F401
from . import aggregates      # noqa: E402,F401
from . import windows         # noqa: E402,F401
from . import setops          # noqa: E402,F401
from . import scalar_fns      # noqa: E402,F401
from . import tier_a          # noqa: E402,F401
from . import streaming_batch # noqa: E402,F401
from . import text_pipeline   # noqa: E402,F401
from . import vector_pipeline # noqa: E402,F401
from . import multimodal      # noqa: E402,F401
from . import sinks           # noqa: E402,F401
from . import udfs            # noqa: E402,F401

__all__ = ["Q", "REGISTRY"]
