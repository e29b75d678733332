"""PySpark-native analytics/ETL engine with the capabilities of the
reference `light-etl-windows-container-poc` (pattern-routed file ETL into a
star-schema warehouse), re-expressed Spark-first, plus the LLM-training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)
a 100 TB pipeline needs.

See SURVEY.md for the operator inventory and architecture rationale.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .catalog import TABLES, load_tables, register_views  # noqa: F401
