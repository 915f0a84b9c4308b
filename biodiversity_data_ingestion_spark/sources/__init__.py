from .tables import TABLES, load_tables, register_views  # noqa: F401
