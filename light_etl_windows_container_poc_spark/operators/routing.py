"""Pattern → table routing — reference parity.

The reference maps directory-path substrings to warehouse tables
(`pattern_based_cleaner_watcher.py:34-44,136-157`; configurable via
`config/pattern_config.yaml`). Matching is ordered substring-in-path,
first match wins, case-insensitive; no match → unrouted (skipped).

Here routing is a COLUMN EXPRESSION over a path column, so a single
ingest job routes billions of files in one pass (vs. the reference's
one-file-at-a-time Python loop).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference PATTERN_TABLE_MAPPING, pattern_based_cleaner_watcher.py:34-44
DEFAULT_PATTERN_MAPPING: dict[str, str] = {
    "tel_list": "dim_numbers",
    "customer_data": "dim_customers",
    "product_info": "dim_products",
    "sales_data": "fact_sales",
    "inventory": "dim_inventory",
    "transactions": "fact_transactions",
    "reports": "staging_reports",
}


@dataclass
class PatternRouter:
    """Ordered substring → table router (dict order = match priority)."""

    mapping: dict[str, str] = field(
        default_factory=lambda: dict(DEFAULT_PATTERN_MAPPING))

    def route_expr(self, path_col: Column) -> Column:
        """CASE expression: first pattern contained in the (normalized)
        path wins; NULL when nothing matches."""
        norm = F.lower(F.replace(path_col, F.lit("\\"), F.lit("/")))
        expr = F.lit(None).cast("string")
        for pattern, table in reversed(list(self.mapping.items())):
            expr = F.when(norm.contains(pattern.lower()), F.lit(table)).otherwise(expr)
        return expr

    def route(self, df: DataFrame, path_col: str = "path",
              out_col: str = "target_table",
              drop_unrouted: bool = True) -> DataFrame:
        out = df.withColumn(out_col, self.route_expr(F.col(path_col)))
        return out.filter(F.col(out_col).isNotNull()) if drop_unrouted else out

    def route_path(self, path: str) -> str | None:
        """Driver-side single-path routing (watcher parity / tests)."""
        norm = path.replace("\\", "/").lower()
        for pattern, table in self.mapping.items():
            if pattern.lower() in norm:
                return table
        return None

    @classmethod
    def from_yaml(cls, path: str) -> "PatternRouter":
        """Load the reference's YAML config format
        (`config/pattern_config.yaml` → `pattern_mappings.<pattern>.table`,
        consumed by `pattern_config_system.py`). Schema-qualified targets
        come back as `schema.table` when a schema is present."""
        import yaml

        with open(path) as fh:
            cfg = yaml.safe_load(fh) or {}
        mapping: dict[str, str] = {}
        for pattern, spec in (cfg.get("pattern_mappings") or {}).items():
            table = spec["table"] if isinstance(spec, dict) else str(spec)
            schema = spec.get("schema") if isinstance(spec, dict) else None
            mapping[pattern] = f"{schema}.{table}" \
                if schema and schema != "public" else table
        return cls(mapping=mapping)
