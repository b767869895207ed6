from ent_fins_lakehouse_spark.plans.registry import QUERIES, QuerySpec, oracle_sql_map, queries_map, query

__all__ = ["QUERIES", "QuerySpec", "query", "queries_map", "oracle_sql_map"]
