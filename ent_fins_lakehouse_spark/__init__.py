"""ent_fins_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, locally runnable PySpark engine exposing the capability
surface of the reference enterprise-finance lakehouse
(SnehilPandey/Ent_Fins_Lakehouse): lakehouse table management (ACID
upsert/delete/time-travel over parquet + a JSON transaction log), batch
relational queries, streaming ingestion, ML feature/scoring dataflow —
plus the large-scale training-data-pipeline extension operators
(dedup, similarity search, text analysis, multimodal columns).

Everything is DataFrame-in / DataFrame-out; SQL and the DataFrame API
are thin peers. No custom execution engine: logical plans are declared
with the PySpark DataFrame/SQL API and Catalyst + Tungsten pick the
physical strategy.

Quick start::

    from ent_fins_lakehouse_spark import get_session, LakeTable, Medallion

    spark = get_session()
    t = LakeTable(spark, "/data/silver_loans")
    t.merge(updates, on=["id"])            # ACID upsert
    t.read(version_as_of=3)                # time travel
"""

from ent_fins_lakehouse_spark.session import get_session, stop_session


def __getattr__(name):
    # Lazy re-exports: keep `import ent_fins_lakehouse_spark` fast and
    # py4j-free until a symbol is actually touched.
    lazy = {
        "LakeTable": ("ent_fins_lakehouse_spark.sources.lakehouse", "LakeTable"),
        "DeltaLogTable": ("ent_fins_lakehouse_spark.sources.lakehouse", "DeltaLogTable"),
        "IcebergTable": ("ent_fins_lakehouse_spark.sources.iceberg", "IcebergTable"),
        "open_table": ("ent_fins_lakehouse_spark.sources.lakehouse", "open_table"),
        "AutoLoader": ("ent_fins_lakehouse_spark.streaming.autoloader", "AutoLoader"),
        "LakehouseCatalog": ("ent_fins_lakehouse_spark.sources.catalog", "LakehouseCatalog"),
        "LakehouseSession": ("ent_fins_lakehouse_spark.sources.catalog", "LakehouseSession"),
        "Medallion": ("ent_fins_lakehouse_spark.etl", "Medallion"),
        "load_table": ("ent_fins_lakehouse_spark.sources.readers", "load_table"),
        "register_views": ("ent_fins_lakehouse_spark.sources.readers", "register_views"),
        "read_lake_stream": ("ent_fins_lakehouse_spark.streaming.lake_source", "read_lake_stream"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_session",
    "stop_session",
    "LakeTable",
    "DeltaLogTable",
    "IcebergTable",
    "open_table",
    "AutoLoader",
    "LakehouseCatalog",
    "LakehouseSession",
    "Medallion",
    "load_table",
    "register_views",
    "read_lake_stream",
]
__version__ = "0.1.0"
