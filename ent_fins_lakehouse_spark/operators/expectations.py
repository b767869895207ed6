"""Data-quality expectations — the Delta Live Tables surface, engine-side.

The reference's platform ships pipeline expectations (`@dlt.expect`,
`expect_or_drop`, `expect_or_fail`) as the declarative data-quality
layer over exactly the kind of medallion ETL the reference builds
(`/root/reference/Instructor/01-Fraud-Delta.py` bronze→silver cleanup);
this module provides the same three enforcement levels as a plain
DataFrame operator:

- ``warn``  — violations are COUNTED, rows pass through
- ``drop``  — violating rows are diverted to a quarantine relation
- ``fail``  — any violation aborts the batch (loudly, with the rule)

Semantics follow DLT, not SQL CHECK: a rule passes only when its
expression is TRUE — NULL is a violation (CHECK's null-passes rule is
the constraint surface, `LakeTable.add_constraint`).

Scale shape: metrics for ALL rules come from ONE aggregation pass
(sum of casted predicates — partial-agg friendly, no per-rule scan);
the clean/quarantine split is one filter each on the same scan, and at
100 TB both materialize downstream without ever collecting rows to the
driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")


@dataclass(frozen=True)
class Expectation:
    name: str
    expr: str  # SQL boolean expression; TRUE = pass, FALSE/NULL = violation
    action: str = "warn"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation action must be one of {_ACTIONS}, got {self.action!r}"
            )


class ExpectationError(ValueError):
    """A ``fail``-level expectation was violated."""


def _passes(e: Expectation) -> F.Column:
    return F.coalesce(F.expr(e.expr), F.lit(False))


def gate_condition(expectations: list[Expectation]) -> F.Column:
    """The drop/fail gate conjunction — TRUE exactly for the rows
    :func:`apply_expectations` returns in ``clean``. Public so callers
    tallying the clean/quarantine split (q234) share ONE definition
    with the operator; if the gate semantics ever change, both move
    together (ADVICE r14)."""
    cond = F.lit(True)
    for e in expectations:
        if e.action in ("drop", "fail"):
            cond = cond & _passes(e)
    return cond


def apply_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns ``(clean, quarantine, metrics)``.

    ``clean``      — rows passing every drop/fail-level rule
    ``quarantine`` — rows failing at least one drop-level rule, with a
                     ``_violations`` array naming the failed rules (the
                     DLT quarantine-table pattern)
    ``metrics``    — one row per rule: (rule, action, n_violations,
                     n_rows) from a single aggregation pass

    ``fail``-level violations raise :class:`ExpectationError` with the
    rule name and count before anything is returned.
    """
    if not expectations:
        raise ValueError("no expectations given")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names in {names}")

    metrics_row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum((~_passes(e)).cast("long")).alias(f"__v_{e.name}")
            for e in expectations
        ],
    ).first()
    n_rows = int(metrics_row["__n"] or 0)
    counts = {e.name: int(metrics_row[f"__v_{e.name}"] or 0) for e in expectations}

    for e in expectations:
        if e.action == "fail" and counts[e.name] > 0:
            raise ExpectationError(
                f"expectation {e.name!r} ({e.expr}) violated by "
                f"{counts[e.name]} of {n_rows} rows"
            )

    spark = df.sparkSession
    metrics = spark.createDataFrame(
        [(e.name, e.action, counts[e.name], n_rows) for e in expectations],
        "rule STRING, action STRING, n_violations LONG, n_rows LONG",
    )

    gate = [e for e in expectations if e.action in ("drop", "fail")]
    if gate:
        all_pass = gate_condition(expectations)
        clean = df.filter(all_pass)
        quarantine = df.filter(~all_pass).withColumn(
            "_violations",
            F.filter(
                F.array(
                    *[
                        F.when(~_passes(e), F.lit(e.name))
                        for e in gate
                    ]
                ),
                lambda x: x.isNotNull(),
            ),
        )
    else:
        clean = df
        quarantine = df.filter(F.lit(False)).withColumn(
            "_violations", F.array().cast("array<string>")
        )
    return clean, quarantine, metrics
