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
"""

from ent_fins_lakehouse_spark.session import get_session, stop_session

__all__ = ["get_session", "stop_session"]
__version__ = "0.1.0"
