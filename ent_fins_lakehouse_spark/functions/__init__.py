from ent_fins_lakehouse_spark.functions.numeric import davg, davg_sql, dec, dsum, dsum_sql

__all__ = ["davg", "davg_sql", "dec", "dsum", "dsum_sql"]
