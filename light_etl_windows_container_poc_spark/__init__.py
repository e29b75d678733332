"""PySpark-native analytics/ETL engine with the capabilities of the
reference `light-etl-windows-container-poc` (pattern-routed file ETL into a
star-schema warehouse), re-expressed Spark-first, plus the LLM-training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)
a 100 TB pipeline needs.

See SURVEY.md for the operator inventory and architecture rationale.
"""

__version__ = "0.1.0"

import os as _os

# Spark's Python workers resolve this package by name when unpickling
# Pandas-UDF / mapInPandas closures. Exporting the package's parent dir on
# PYTHONPATH at import time (before any worker daemon forks) makes the
# engine importable-anywhere without an install step; on a real cluster the
# package ships via --py-files / pip and this is a no-op.
_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _parent not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = _parent + (_os.pathsep + _pp if _pp else "")

from .session import get_spark  # noqa: F401,E402
from .catalog import TABLES, load_tables, register_views  # noqa: F401,E402
