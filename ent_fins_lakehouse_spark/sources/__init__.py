from ent_fins_lakehouse_spark.sources.readers import TABLE_NAMES, load_table, load_tables, register_views

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views"]
