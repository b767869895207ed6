"""Temporal join operators: as-of join and range join.

Spark has no native ASOF JOIN (the staple of financial tick data —
"for each trade, the latest quote at or before it"). The naive
formulation (inequality join + groupBy max) explodes quadratically per
key. This implementation uses the union + ordered-window trick:

    1. tag right rows side=0, left rows side=1
    2. union into one relation
    3. one shuffle: partition by key, order by (ts, side)
    4. last(right_value, ignorenulls) over the running window carries
       the most recent right row forward onto each left row
    5. keep side=1 rows

Cost at 100 TB: exactly ONE shuffle of left+right on the join key (the
same lower bound as any co-partitioned join) and a per-partition sort
— no row explosion, no per-key driver loops, skew handled by AQE.
Same-timestamp ties resolve as "at or before" (right sorts first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    how: str = "left",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, append the right row
    with the greatest ``right_ts`` ≤ ``left_ts`` within the same
    ``on`` key group.

    ``how``: 'left' keeps unmatched left rows (right columns null),
    'inner' drops them. ``tolerance_seconds`` nulls out matches older
    than the window (then 'inner' also drops them).
    Output: left columns + ``matched_ts`` + ``value_cols``.
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in set(on) | {right_ts}
        ]
    lcols = left.columns
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    combined = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = combined.select(
        "_side",
        "_l",
        F.last("_r_ts", ignorenulls=True).over(w).alias("matched_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
        F.col("_ts").alias("_lts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_window = (
            F.col("matched_ts").isNotNull()
            & (
                F.unix_micros(F.col("_lts")) - F.unix_micros(F.col("matched_ts"))
                <= int(tolerance_seconds * 1_000_000)
            )
        )
        out = out.select(
            "_side",
            "_l",
            F.when(in_window, F.col("matched_ts")).alias("matched_ts"),
            *[F.when(in_window, F.col(f"_m_{c}")).alias(f"_m_{c}") for c in value_cols],
        )
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        "matched_ts",
        *[F.col(f"_m_{c}").alias(c) for c in value_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
) -> DataFrame:
    """Band/range join: pairs where ``right_ts - left_ts`` falls inside
    [lower, upper] seconds, equi-keyed on ``on``.

    A raw inequality join degenerates to a per-key cross product;
    instead both sides are bucketed to ``upper - lower``-sized time
    bins and each left row joins only its own and the adjacent bin —
    an equi-join on (key, bin) with a bounded fan-out of 2, then an
    exact band filter. This is the standard interval-bucketing
    rewrite Spark's optimizer doesn't do for you.
    """
    span = max(upper_seconds - lower_seconds, 1e-9)
    l_us, u_us = int(lower_seconds * 1e6), int(upper_seconds * 1e6)
    span_us = max(u_us - l_us, 1)

    lb = left.withColumn(
        "_shifted", F.unix_micros(F.col(left_ts)) + F.lit(l_us)
    ).withColumn("_bin", F.floor(F.col("_shifted") / F.lit(span_us)))
    # each left row probes its bin and the next (the band spans ≤ 2 bins)
    lb = lb.withColumn("_probe", F.explode(F.array(F.col("_bin"), F.col("_bin") + 1)))
    rb = right.withColumn(
        "_rus", F.unix_micros(F.col(right_ts))
    ).withColumn("_probe", F.floor(F.col("_rus") / F.lit(span_us)))

    delta = F.col("_rus") - F.unix_micros(F.col(left_ts))
    return (
        lb.join(rb, [*on, "_probe"])
        .filter((delta >= F.lit(l_us)) & (delta <= F.lit(u_us)))
        .drop("_shifted", "_bin", "_probe", "_rus")
    )


def scd2_apply(
    table,
    changes: DataFrame,
    key: list[str],
    tracked: list[str],
    effective_date: str,
) -> dict:
    """Apply one change batch to a Slowly-Changing-Dimension Type 2
    history table (columns: ``key`` + ``tracked`` + ``valid_from`` /
    ``valid_to`` DATE + ``is_current`` BOOLEAN) in ONE transactional
    MERGE commit.

    Semantics per batch (the standard warehouse contract):

    - a key whose tracked attributes changed → its current row CLOSES
      (``valid_to`` = effective date, ``is_current`` = false) and a new
      current version inserts (``valid_from`` = effective date);
    - a brand-new key → inserts as current;
    - an unchanged key → untouched (its files are never rewritten);
    - ``changes`` may be a full snapshot — unchanged rows are filtered
      by a null-safe attribute comparison, so feeding the whole
      dimension is safe.

    Scale shape: ONE :meth:`LakeTable.merge` keyed on
    ``key + [valid_from]`` — close directives match exactly the current
    version of each changed key (its ``valid_from`` is carried from the
    target), new versions match nothing and ride the INSERT path; the
    merge's own key pruning rewrites only dirs holding changed keys.
    No full-table rewrite, no per-key driver loop, history rows are
    never scanned beyond the ``is_current`` filter.

    First call (table does not exist) bootstraps the dimension:
    every change row becomes a current version at ``effective_date``.
    """
    eff_lit = F.to_date(F.lit(effective_date))
    payload = key + tracked
    incoming = changes.select(*payload)

    def as_current(df: DataFrame) -> DataFrame:
        return df.select(
            *payload,
            eff_lit.alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    if not table.exists():
        table.write(as_current(incoming), mode="overwrite")
        return {"closed": 0, "inserted": incoming.count(), "bootstrap": True}

    cur = table.read().filter("is_current")
    neq = None
    for c in tracked:
        term = ~F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}"))
        neq = term if neq is None else (neq | term)
    joined = incoming.alias("s").join(cur.alias("t"), on=key, how="inner")
    changed = joined.filter(neq)
    # close directives: the target current row's identity (key,
    # valid_from) with the closing assignments applied by the merge
    close_rows = changed.select(
        *[F.col(f"t.{c}").alias(c) for c in payload],
        F.col("t.valid_from").alias("valid_from"),
        F.col("t.valid_to").alias("valid_to"),
        F.col("t.is_current").alias("is_current"),
    )
    ins_changed = as_current(changed.select(*[F.col(f"s.{c}").alias(c) for c in payload]))
    ins_new = as_current(incoming.join(cur, on=key, how="left_anti"))
    src = close_rows.unionByName(ins_changed).unionByName(ins_new)
    metrics = table.merge(
        src,
        on=key + ["valid_from"],
        when_matched_update_all=False,
        matched_update={
            "valid_to": f"DATE '{effective_date}'",
            "is_current": "false",
        },
        when_not_matched_insert_all=True,
    )
    return {"merge": metrics}
