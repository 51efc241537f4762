"""ruleset_analysis_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the query and
data-processing capabilities of the public ``arnesund/ruleset-analysis``
tool (firewall-rule usage analytics over archived logs), extended with
the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) required by the project north star.

Provenance note (see SURVEY.md §0): the read-only reference mount at
``/root/reference/`` was empty at survey and build time, so reference
citations in this package are file-level reconstructions from public
knowledge of the upstream repo ([R-mem] tags), never fabricated
``file:line`` numbers.

Architecture: everything is declarative PySpark DataFrame code —
Catalyst is the optimizer, parquet the storage format, and Python UDFs
appear only on the explicitly-declared Arrow-vectorized surface
(`operators/udfs.py`, `operators/multimodal.py`).
"""

__version__ = "0.1.0"

from .session import ensure_session_defaults, get_spark  # noqa: F401
from .sources.parquet import TABLE_NAMES, load  # noqa: F401
