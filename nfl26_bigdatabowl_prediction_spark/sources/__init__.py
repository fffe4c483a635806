from .io import table, read_csv_dir, write_csv, write_parquet  # noqa: F401
