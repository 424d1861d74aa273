from .writer import write_table, upsert_table, insert_ignore_table, read_table  # noqa: F401
