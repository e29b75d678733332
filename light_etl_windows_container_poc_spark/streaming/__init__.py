from .sinks import parquet_upsert_sink, start_upsert_stream  # noqa: F401
from .watcher import watch_csv_dir  # noqa: F401
from .windows import stateful_running_max, windowed_event_counts  # noqa: F401
