"""Reference-YAML config loading for the pattern router
(`config/pattern_config.yaml` format, `pattern_config_system.py` parity)."""

from light_etl_windows_container_poc_spark.operators.routing import \
    PatternRouter


def test_router_loads_reference_yaml_format(tmp_path):
    cfg = tmp_path / "pattern_config.yaml"
    cfg.write_text("""
watcher_settings:
  poll_interval: 10
pattern_mappings:
  tel_list:
    table: dim_numbers
    schema: public
  audit:
    table: fact_audit
    schema: compliance
""")
    r = PatternRouter.from_yaml(str(cfg))
    assert r.route_path(r"Z:\drop\tel_list\a.csv") == "dim_numbers"
    assert r.route_path("/mnt/audit/2024/log.xlsx") == "compliance.fact_audit"
    assert r.route_path("/mnt/other/x.csv") is None
