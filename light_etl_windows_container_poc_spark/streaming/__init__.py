from .watcher import watch_csv_dir  # noqa: F401
from .windows import stateful_running_max, windowed_event_counts  # noqa: F401
