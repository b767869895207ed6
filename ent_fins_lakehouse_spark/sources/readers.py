"""Batch sources (SURVEY.md §2.1 S1-S4, S7).

The reference reads headered CSV with inferred schema
(`/root/reference/Instructor/01-Fraud-Delta.py:37-51`) and catalogued
Delta paths. Our engine's canonical batch source is parquet (columnar,
predicate-pushdown, column-pruning — the format the driver testdata
ships); CSV/JSON readers reproduce the reference call-sites.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SHIPPED_SESSIONS: set[int] = set()


def _ship_package_to_workers(spark: SparkSession) -> None:
    """Make this package importable in Python workers (UDF closures may
    reference module globals): zip it and addPyFile once per session.
    The driver process added the repo to sys.path; workers don't
    inherit that. On a real cluster this is the --py-files step."""
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    import tempfile
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(tempfile.mkdtemp(prefix="pkgship_"), "ent_fins_lakehouse_spark.zip")
    base = os.path.dirname(pkg_root)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, base))
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added under the same name in this JVM
    _SHIPPED_SESSIONS.add(key)


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver table. Filters/projections composed on
    top of this are pushed into the scan by Catalyst.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader refuses by default; read it as nano-epoch longs
    and convert to a microsecond timestamp (truncation — the same
    ns→us truncation DuckDB's epoch_us applies, keeping oracles exact).
    """
    # The caller may hand us an arbitrarily-configured session (the
    # driver harness does). Timestamp semantics must not depend on the
    # ambient zone: pin UTC so literals, date_format and window
    # bucketing match the (UTC-naive) oracle everywhere.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Size shuffles to the cluster, not Spark's static 200 default:
    # if the session still carries the default, scale to parallelism
    # (local[N] → N) and let AQE coalesce below that at runtime.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(8, spark.sparkContext.defaultParallelism)),
        )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # Read naive parquet timestamp[us] as TIMESTAMP (LTZ) at the SCAN,
    # not as TIMESTAMP_NTZ cast afterwards: the session zone is pinned
    # UTC so the values are identical, but doing it at the scan keeps
    # timestamp predicates pushdown-eligible — a post-scan cast
    # projection (the _ntz_to_utc fallback below) blocks PushedFilters
    # on those columns (measured: q01's l_shipdate filter stopped
    # pushing and cost +0.9 s at sf0.1).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    _ship_package_to_workers(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_utc(df)
    return _ntz_to_utc(spark.read.parquet(path))


def _strip_ntz(dt: T.DataType) -> tuple[T.DataType, bool]:
    """Return ``dt`` with every TIMESTAMP_NTZ (at any nesting depth:
    struct field, array element, map key/value) replaced by TIMESTAMP,
    plus a flag saying whether anything changed."""
    if isinstance(dt, T.TimestampNTZType):
        return T.TimestampType(), True
    if isinstance(dt, T.StructType):
        fields, changed = [], False
        for f in dt.fields:
            inner, ch = _strip_ntz(f.dataType)
            changed = changed or ch
            fields.append(T.StructField(f.name, inner, f.nullable, f.metadata))
        return (T.StructType(fields), True) if changed else (dt, False)
    if isinstance(dt, T.ArrayType):
        inner, ch = _strip_ntz(dt.elementType)
        return (T.ArrayType(inner, dt.containsNull), True) if ch else (dt, False)
    if isinstance(dt, T.MapType):
        k, ck = _strip_ntz(dt.keyType)
        v, cv = _strip_ntz(dt.valueType)
        if ck or cv:
            return T.MapType(k, v, dt.valueContainsNull), True
        return dt, False
    return dt, False


def _ntz_to_utc(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP (LTZ), including NTZ
    nested inside struct/array/map types.

    The driver's parquet writer has emitted both isAdjustedToUTC=true
    (→ TIMESTAMP) and naive timestamp[us] (→ TIMESTAMP_NTZ under Spark
    4's NTZ inference) across rounds. The session zone is pinned UTC
    above, so the cast is numerically exact, and every timestamp
    function (unix_micros, watermarks, windows) sees one stable type —
    the same wall-clock instants the UTC-naive DuckDB oracle computes
    on. All casts happen in one select() projection (one plan analysis,
    not one per column).
    """
    from pyspark.sql import functions as F

    cols, changed = [], False
    for f in df.schema.fields:
        new_dt, ch = _strip_ntz(f.dataType)
        if ch:
            cols.append(F.col(f.name).cast(new_dt).alias(f.name))
            changed = True
        else:
            cols.append(F.col(f.name))
    return df.select(*cols) if changed else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Bind every driver table as a temp view so ``spark.sql`` works
    (reference idiom: `Instructor/01-Fraud-Delta.py:176,225`)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    infer_schema: bool = True,
    header: bool = True,
    sep: str = ",",
    schema: T.StructType | None = None,
) -> DataFrame:
    """CSV scan — S1 (inferred) and S2 (header-only strings) from
    `Instructor/01-Fraud-Delta.py:47-51,220`."""
    reader = spark.read.format("csv").option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """JSON scan (batch shape of the Auto Loader source,
    `Auto Loader demo.py:69-76`). Always pass a schema in production —
    inference triggers an extra full scan."""
    reader = spark.read.format("json")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def from_rows(spark: SparkSession, rows: list[tuple], names: list[str]) -> DataFrame:
    """In-memory source — S7, `Auto Loader demo.py:33-38`."""
    return spark.createDataFrame(rows).toDF(*names)
