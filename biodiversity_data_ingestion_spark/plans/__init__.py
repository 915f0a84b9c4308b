from .queries import QUERIES, oracle_sql_map, query_map  # noqa: F401
