"""Property-based invariants (SURVEY.md §5.5, hypothesis).

Few, fat examples: every example round-trips through Spark jobs, so
the per-property example budget is small but each example is an
adversarial batch (duplicate keys, nulls, negative/huge values,
unicode text)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (key, value) batches with deliberate key collisions
kv_batches = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-(10**9), 10**9)),
    min_size=1,
    max_size=30,
)

texts = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40,
    ),
    min_size=1,
    max_size=15,
)


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


@SET
@given(target=kv_batches, source=kv_batches)
def test_merge_equals_groupby_last(sparkm, tmp_path_factory, target, source):
    """MERGE(update-all/insert-all) == pandas 'source wins, last
    occurrence per key' upsert semantics (J1/D7)."""
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    path = str(tmp_path_factory.mktemp("merge"))
    # lake MERGE requires unique keys on both sides (ambiguous matches
    # are rejected, like Delta): last-wins pre-dedup on both
    t = {k: v for k, v in target}
    s = {k: v for k, v in source}
    tdf = sparkm.createDataFrame(list(t.items()), "id LONG, v LONG")
    sdf = sparkm.createDataFrame(list(s.items()), "id LONG, v LONG")
    lt = LakeTable(sparkm, path)
    lt.write(tdf, mode="overwrite")
    lt.merge(sdf, on=["id"])
    got = {r["id"]: r["v"] for r in lt.read().collect()}
    assert got == {**t, **s}


@SET
@given(batch=kv_batches)
def test_delete_partitions_rows_exactly(sparkm, tmp_path_factory, batch):
    """DELETE(pred) removes exactly the matching rows (D5) —
    complement survives untouched."""
    from ent_fins_lakehouse_spark.sources.lakehouse import LakeTable

    path = str(tmp_path_factory.mktemp("del"))
    df = sparkm.createDataFrame(batch, "id LONG, v LONG")
    lt = LakeTable(sparkm, path)
    lt.write(df, mode="overwrite")
    lt.delete("v < 0")
    kept = [(k, v) for k, v in batch if not (v < 0)]
    got = sorted((r["id"], r["v"]) for r in lt.read().collect())
    assert got == sorted(kept)


@SET
@given(docs=texts)
def test_exact_dedup_idempotent_and_canonical(sparkm, docs):
    """dedup(dedup(x)) == dedup(x); canonical_dedup survivor is the
    min id and group sizes sum to the input size."""
    from ent_fins_lakehouse_spark.operators.dedup import canonical_dedup, exact_dedup

    rows = [(i, t) for i, t in enumerate(docs)] + [
        (len(docs) + i, t) for i, t in enumerate(docs[: len(docs) // 2])
    ]
    df = sparkm.createDataFrame(rows, "doc_id LONG, text STRING")
    once = exact_dedup(df, ["text"])
    twice = exact_dedup(once, ["text"])
    assert once.count() == twice.count() == len(set(docs))
    canon = canonical_dedup(df, ["text"], "doc_id").collect()
    assert sum(r["n_copies"] for r in canon) == len(rows)
    by_text = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    assert {r["doc_id"] for r in canon} == {min(v) for v in by_text.values()}


@SET
@given(batch=kv_batches)
def test_partial_agg_equals_global(sparkm, batch):
    """sum of per-key partial sums == global sum regardless of
    partitioning (the partial+final split Catalyst performs)."""
    df = sparkm.createDataFrame(batch, "k LONG, v LONG").repartition(7)
    per_key = df.groupBy("k").agg(F.sum("v").alias("s"))
    total_from_parts = per_key.agg(F.sum("s")).collect()[0][0]
    total = df.agg(F.sum("v")).collect()[0][0]
    assert total_from_parts == total == sum(v for _, v in batch)


@SET
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=25,
    )
)
def test_decimal_sum_order_insensitive(sparkm, vals):
    """dsum (decimal-pathed double sum) is identical under any
    partitioning — the property the oracle hashes rely on."""
    from ent_fins_lakehouse_spark.functions.numeric import dsum

    rows = [(float(v),) for v in vals]
    a = sparkm.createDataFrame(rows, "v DOUBLE").coalesce(1)
    b = sparkm.createDataFrame(list(reversed(rows)), "v DOUBLE").repartition(5)
    ra = a.agg(dsum("v").alias("s")).collect()[0]["s"]
    rb = b.agg(dsum("v").alias("s")).collect()[0]["s"]
    assert (ra is None and rb is None) or math.isclose(ra, rb, rel_tol=0, abs_tol=0)


@SET
@given(
    rows=st.lists(
        st.integers(min_value=0, max_value=(1 << 40) - 1), max_size=300
    )
)
def test_roaring64_codec_roundtrip(rows):
    """DV bitmap codec: encode→decode is the identity on any row-index
    set (spans multiple 16-bit containers and 32-bit buckets)."""
    from ent_fins_lakehouse_spark.sources.roaring import (
        roaring64_payload,
        roaring64_rows,
    )

    assert sorted(roaring64_rows(roaring64_payload(rows))) == sorted(set(rows))


# DML arcs for the materialized-view invariant: a sequence of appends
# (batches of (group, value) rows) and predicate deletes over a small
# group domain — adversarial for the MERGE maintenance (groups hitting
# zero, re-inserted groups, negative values)
mv_arcs = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(
                st.tuples(st.integers(0, 4), st.integers(-1000, 1000)),
                min_size=1,
                max_size=12,
            ),
        ),
        st.tuples(st.just("delete"), st.integers(0, 4)),
    ),
    min_size=2,
    max_size=5,
)


@SET
@given(arc=mv_arcs)
def test_mv_incremental_equals_recompute(sparkm, tmp_path_factory, arc):
    """Gupta-Mumick maintenance invariant, property-tested: after ANY
    interleaving of appends and predicate deletes, refresh() applied
    per commit leaves the view BIT-IDENTICAL (decimal sums) to a full
    recompute of the final base state; groups whose count reaches zero
    leave the view entirely."""
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable
    from ent_fins_lakehouse_spark.sources.matview import MaterializedAggView

    root = str(tmp_path_factory.mktemp("mvprop"))
    base = DeltaLogTable(sparkm, root + "/b")
    base.write(
        sparkm.createDataFrame([], "g LONG, v LONG"),
        mode="append",
    )
    base.set_property("delta.enableChangeDataFeed", "true")
    mv = MaterializedAggView(sparkm, base, root + "/v")
    mv.create(["g"], ["v"])
    for step in arc:
        if step[0] == "append":
            base.write(
                sparkm.createDataFrame(step[1], "g LONG, v LONG"), mode="append"
            )
        else:
            base.delete(f"g = {step[1]}")
        mv.refresh()  # tick per commit — the live-view cadence
    got = mv.read()
    want = mv._aggregate(base.read(), ["g"], ["v"])
    diff = got.exceptAll(want).unionByName(want.exceptAll(got)).count()
    assert diff == 0
    # zero-count groups never linger
    assert got.filter("n_rows <= 0").count() == 0


edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=14,
)


@SET
@given(edges=edge_lists)
def test_recursive_cte_closure_matches_duckdb(sparkm, tmp_path_factory, edges):
    """The facade's WITH RECURSIVE lowering computes the SAME
    transitive closure as DuckDB's native recursive CTE on arbitrary
    small digraphs — cycles, self-loops, and duplicate edges included
    (UNION set semantics must terminate and dedupe identically)."""
    import duckdb

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    root = tmp_path_factory.mktemp("rcte")
    t = DeltaLogTable(sparkm, str(root / "e"))
    t.write(
        sparkm.createDataFrame(edges, "src int, dst int"), mode="overwrite"
    )
    lh = LakehouseSession(sparkm, str(root / "wh"))
    lh.sql("CREATE DATABASE g")
    lh.sql(f"CREATE TABLE g.edges USING DELTA LOCATION '{t.path}'")
    stmt = """
        WITH RECURSIVE reach (src, dst) AS (
          SELECT src, dst FROM {tbl}
          UNION
          SELECT r.src, e.dst FROM reach r JOIN {tbl} e ON r.dst = e.src
        )
        SELECT src, dst FROM reach
    """
    got = {
        (r["src"], r["dst"])
        for r in lh.sql(stmt.format(tbl="g.edges")).collect()
    }
    duck = duckdb.connect()
    duck.execute("CREATE TABLE edges (src INT, dst INT)")
    duck.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    want = set(map(tuple, duck.execute(stmt.format(tbl="edges")).fetchall()))
    assert got == want


dup_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=60),
    min_size=2,
    max_size=12,
)


@SET
@given(texts=dup_texts, thr=st.sampled_from([0.7, 0.8, 0.9]), n=st.sampled_from([1, 2]))
def test_prefix_join_equals_quadratic_on_random_text(sparkm, texts, thr, n):
    """jaccard_pairs_prefix == the quadratic ground truth on random
    tiny-alphabet texts (maximal shingle collisions, duplicates,
    empty/whitespace strings) at several thresholds and shingle
    sizes — the prefix-length guarantee has no data-shape escape
    hatch."""
    from ent_fins_lakehouse_spark.operators.dedup import (
        jaccard_pairs_blocked,
        jaccard_pairs_prefix,
    )

    # plant guaranteed duplicates so the pair set is non-trivial
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(1000 + i, t) for i, t in enumerate(texts[:2])]
    df = sparkm.createDataFrame(rows, "doc_id long, text string")
    quad = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs_blocked(
            df.withColumn("_all", F.lit(1)),
            "doc_id", "text", ["_all"], thr, shingle_n=n,
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs_prefix(
            df, "doc_id", "text", thr, shingle_n=n
        ).collect()
    }
    assert pref == quad


@SET
@given(target=kv_batches, source=kv_batches)
def test_merge_key_skipping_is_invisible(sparkm, tmp_path_factory, target, source):
    """Merge-key data skipping may only change WHICH FILES ARE READ:
    the same delete-merge applied with pruning forced on and forced
    off lands identical final tables (rows and values)."""
    from ent_fins_lakehouse_spark.sources import lakehouse as lh
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    root = tmp_path_factory.mktemp("mks")
    src = sparkm.createDataFrame(
        sorted({k for k, _ in source}), "int"
    ).toDF("k")
    finals = []
    for gate, tag in ((0, "on"), (1 << 60, "off")):
        t = DeltaLogTable(sparkm, str(root / f"t_{tag}"))
        t.write(
            sparkm.createDataFrame(target, "k int, v long")
            .repartitionByRange(3, "k")
            .sortWithinPartitions("k"),
            mode="overwrite",
        )
        old = lh.MERGE_PRUNE_MIN_BYTES
        lh.MERGE_PRUNE_MIN_BYTES = gate
        try:
            t.merge(
                src,
                on=["k"],
                when_matched_update_all=False,
                when_not_matched_insert_all=False,
                matched_delete=True,
            )
        finally:
            lh.MERGE_PRUNE_MIN_BYTES = old
        finals.append(
            sorted((r["k"], r["v"]) for r in t.read().collect())
        )
    assert finals[0] == finals[1]
