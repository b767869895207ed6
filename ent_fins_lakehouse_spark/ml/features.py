"""Feature-table registry — open-source stand-in for the Databricks
Feature Store used at `/root/reference/Instructor/03-Fraud-ML.py:
249-302` (`@feature_table` decorator `:249`, ``FeatureStoreClient.
create_feature_table`` `:283-296`, ``write_table`` `:299-302`).

A feature table here is (a) a registered computation — a decorated
DataFrame→DataFrame function — plus (b) an optional materialization to
the lakehouse layer keyed by primary key. No external service: the
registry is in-process metadata; persistence is ordinary ACID lake
tables, which is all the Databricks client does underneath.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class FeatureTableSpec:
    name: str
    keys: list[str]
    description: str
    fn: Callable[..., DataFrame]


class FeatureRegistry:
    """Name → feature-computation registry with lakehouse
    materialization (M14)."""

    def __init__(self) -> None:
        self._tables: dict[str, FeatureTableSpec] = {}

    def register(
        self, name: str, keys: list[str], description: str = ""
    ) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
        def deco(fn: Callable[..., DataFrame]) -> Callable[..., DataFrame]:
            self._tables[name] = FeatureTableSpec(name, keys, description, fn)
            return fn

        return deco

    def compute(self, name: str, *args, **kwargs) -> DataFrame:
        return self._tables[name].fn(*args, **kwargs)

    def spec(self, name: str) -> FeatureTableSpec:
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)

    def materialize(self, name: str, path: str, *args, **kwargs) -> DataFrame:
        """Compute and write the feature table as an ACID lake table
        (overwrite = recompute semantics, like ``write_table(...,
        mode='overwrite')`` at `03-Fraud-ML.py:299-302`)."""
        from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

        df = self.compute(name, *args, **kwargs)
        LakeTable(df.sparkSession, path).write(df, mode="overwrite")
        return df


DEFAULT_REGISTRY = FeatureRegistry()


def feature_table(name: str, keys: list[str], description: str = ""):
    """Module-level decorator against the default registry — the
    reference's ``@feature_table`` shape (`03-Fraud-ML.py:249-255`)."""
    return DEFAULT_REGISTRY.register(name, keys, description)
