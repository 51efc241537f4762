from .parquet import TABLE_NAMES, load, load_all  # noqa: F401
