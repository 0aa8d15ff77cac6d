from .tables import TABLES, load, load_all_tables  # noqa: F401
