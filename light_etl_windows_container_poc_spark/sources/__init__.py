from .files import read_csv_auto, read_excel, read_json_records  # noqa: F401
