"""SQL facade surface for materialized views (sources/catalog.py):
CREATE MATERIALIZED VIEW … AS SELECT <maintainable algebra> /
REFRESH MATERIALIZED VIEW [FULL] / plain SELECT over the view data
(a public Delta table at table_path), plus the general SELECT/CTE
fallthrough that resolves qualified catalog references.
"""

from __future__ import annotations

import pytest

from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable


@pytest.fixture()
def lh(spark, tmp_path):
    s = LakehouseSession(spark, str(tmp_path / "wh"))
    s.sql("CREATE DATABASE db")
    s.sql("USE db")
    return s


def _expected(n):
    exp = {}
    for i in range(n):
        e = exp.setdefault(i % 5, [0, 0.0])
        e[0] += 1
        e[1] += float(i)
    return {g: tuple(v) for g, v in exp.items()}


def test_mv_sql_lifecycle_delta_base(spark, lh, tmp_path):
    dl = DeltaLogTable(spark, str(tmp_path / "wh" / "db" / "base"))
    dl.write(
        spark.range(0, 100).selectExpr("id % 5 AS g", "CAST(id AS DOUBLE) AS x"),
        mode="append",
    )
    lh.sql(f"CREATE TABLE base USING DELTA LOCATION '{dl.path}'")
    lh.sql(
        "CREATE MATERIALIZED VIEW mv AS "
        "SELECT g, COUNT(*) AS n_rows, SUM(x) AS sum_x FROM base GROUP BY g"
    )
    assert lh.sql("SELECT * FROM db.mv ORDER BY g").count() == 5
    dl.write(
        spark.range(100, 120).selectExpr("id % 5 AS g", "CAST(id AS DOUBLE) AS x"),
        mode="append",
    )
    lh.sql("REFRESH MATERIALIZED VIEW mv")
    got = {
        r.g: (r.n_rows, float(r.sum_x))
        for r in lh.sql("SELECT g, n_rows, sum_x FROM db.mv").collect()
    }
    assert got == _expected(120)
    lh.sql("REFRESH MATERIALIZED VIEW mv FULL")
    got2 = {
        r.g: (r.n_rows, float(r.sum_x))
        for r in lh.sql("SELECT g, n_rows, sum_x FROM db.mv").collect()
    }
    assert got2 == got
    # general CTE fallthrough resolves catalog refs
    n = lh.sql(
        "WITH t AS (SELECT g FROM db.mv WHERE g < 3) SELECT COUNT(*) AS n FROM t"
    ).collect()[0].n
    assert n == 3


def test_mv_sql_iceberg_base(spark, lh, tmp_path):
    ice = IcebergTable(spark, str(tmp_path / "wh" / "db" / "ibase"))
    ice.append(
        spark.range(0, 60).selectExpr("id % 3 AS g", "CAST(id AS DOUBLE) AS x")
    )
    lh.sql(f"CREATE TABLE ibase USING ICEBERG LOCATION '{ice.path}'")
    lh.sql(
        "CREATE MATERIALIZED VIEW imv AS "
        "SELECT g, COUNT(*), SUM(x) FROM ibase GROUP BY g"
    )
    ice.append(
        spark.range(60, 90).selectExpr("id % 3 AS g", "CAST(id AS DOUBLE) AS x")
    )
    lh.sql("REFRESH MATERIALIZED VIEW imv")
    got = {
        r.g: (r.n_rows, float(r.sum_x))
        for r in lh.sql("SELECT * FROM db.imv").collect()
    }
    assert got == {g: (30, float(sum(i for i in range(90) if i % 3 == g))) for g in range(3)}


def test_mv_sql_refusals(spark, lh, tmp_path):
    dl = DeltaLogTable(spark, str(tmp_path / "wh" / "db" / "b2"))
    dl.write(spark.range(10).selectExpr("id AS g", "CAST(id AS DOUBLE) AS x"), mode="append")
    lh.sql(f"CREATE TABLE b2 USING DELTA LOCATION '{dl.path}'")
    with pytest.raises(ValueError, match="SUM/MIN/MAX"):
        lh.sql("CREATE MATERIALIZED VIEW m1 AS SELECT g, AVG(x) FROM b2 GROUP BY g")
    with pytest.raises(ValueError, match="GROUP BY keys"):
        lh.sql("CREATE MATERIALIZED VIEW m2 AS SELECT x, SUM(x) FROM b2 GROUP BY g")
    with pytest.raises(ValueError, match="not a materialized view"):
        lh.sql("REFRESH MATERIALIZED VIEW b2")


def test_show_partitions_and_columns(spark, lh, tmp_path):
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    dl = DeltaLogTable(spark, str(tmp_path / "wh" / "db" / "pt"))
    dl.write(
        spark.range(0, 30).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
        mode="append",
        partition_by=["p"],
    )
    lh.sql(f"CREATE TABLE pt USING DELTA LOCATION '{dl.path}'")
    parts = [r.partition for r in lh.sql("SHOW PARTITIONS pt").collect()]
    assert len(parts) == 3 and all('"p"' in v for v in parts)
    cols = {r.col_name: r.data_type for r in lh.sql("SHOW COLUMNS IN pt").collect()}
    assert cols == {"k": "bigint", "p": "string"}

    ice = IcebergTable(spark, str(tmp_path / "wh" / "db" / "ipt"))
    ice.append(
        spark.range(0, 30).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
        partition_by=["p"],
    )
    lh.sql(f"CREATE TABLE ipt USING ICEBERG LOCATION '{ice.path}'")
    assert lh.sql("SHOW PARTITIONS ipt").count() == 3
    import pytest as _pytest

    dl2 = DeltaLogTable(spark, str(tmp_path / "wh" / "db" / "np"))
    dl2.write(spark.range(3).selectExpr("id AS k"), mode="append")
    lh.sql(f"CREATE TABLE np USING DELTA LOCATION '{dl2.path}'")
    with _pytest.raises(ValueError, match="not a partitioned table"):
        lh.sql("SHOW PARTITIONS np")


def test_mv_sql_approx_count_distinct(spark, lh, tmp_path):
    """APPROX_COUNT_DISTINCT(col) in CREATE MATERIALIZED VIEW maps to
    the mergeable HLL ndv column (insert-only maintenance; estimate
    exact at sparse-mode cardinalities)."""
    dl = DeltaLogTable(spark, str(tmp_path / "wh" / "db" / "nb"))
    dl.write(
        spark.range(0, 300).selectExpr("id % 3 AS g", "id AS ck"), mode="append"
    )
    lh.sql(f"CREATE TABLE nb USING DELTA LOCATION '{dl.path}'")
    lh.sql(
        "CREATE MATERIALIZED VIEW nmv AS "
        "SELECT g, COUNT(*), APPROX_COUNT_DISTINCT(ck) FROM nb GROUP BY g"
    )
    got = {r.g: (r.n_rows, r.ndv_ck) for r in lh.sql("SELECT g, n_rows, ndv_ck FROM db.nmv").collect()}
    assert all(got[g][0] == 100 for g in (0, 1, 2))
    assert all(abs(got[g][1] - 100) <= 2 for g in (0, 1, 2))
    # overlapping insert-only tick: 50 repeats + 50 fresh per group
    dl.write(
        spark.range(150, 450).selectExpr("id % 3 AS g", "id AS ck"), mode="append"
    )
    lh.sql("REFRESH MATERIALIZED VIEW nmv")
    got2 = {r.g: (r.n_rows, r.ndv_ck) for r in lh.sql("SELECT g, n_rows, ndv_ck FROM db.nmv").collect()}
    assert all(got2[g][0] == 200 for g in (0, 1, 2))
    assert all(abs(got2[g][1] - 150) <= 3 for g in (0, 1, 2))


def test_sql_time_travel_select(spark, lh, tmp_path):
    """SELECT ... FROM db.t VERSION AS OF n / TIMESTAMP AS OF 'ts'
    resolves the as-of snapshot through the format shims for BOTH lake
    formats; policies still apply; views refuse."""
    # Delta base: v0 = 10 rows, v1 = +10
    dl = DeltaLogTable(spark, str(tmp_path / "wh" / "db" / "tt"))
    dl.write(spark.range(0, 10).selectExpr("id AS k"), mode="append")
    dl.write(spark.range(10, 20).selectExpr("id AS k"), mode="append")
    lh.sql(f"CREATE TABLE tt USING DELTA LOCATION '{dl.path}'")
    assert lh.sql("SELECT COUNT(*) AS n FROM db.tt").collect()[0].n == 20
    assert (
        lh.sql("SELECT COUNT(*) AS n FROM db.tt VERSION AS OF 0").collect()[0].n == 10
    )
    # timestamp at v0's commit time
    import json as _json
    import os as _os

    v0 = _os.path.join(dl.log_path, "00000000000000000000.json")
    with open(v0) as fh:
        ts0 = _json.loads(fh.readline())["commitInfo"]["timestamp"]
    got = lh.sql(
        f"SELECT COUNT(*) AS n FROM db.tt TIMESTAMP AS OF '{ts0}'"
    ).collect()[0].n
    assert got == 10

    # Iceberg base: snapshots 1 and 2
    ice = IcebergTable(spark, str(tmp_path / "wh" / "db" / "itt"))
    ice.append(spark.range(0, 7).selectExpr("id AS k").coalesce(1))
    ice.append(spark.range(7, 12).selectExpr("id AS k").coalesce(1))
    lh.sql(f"CREATE TABLE itt USING ICEBERG LOCATION '{ice.path}'")
    assert (
        lh.sql("SELECT COUNT(*) AS n FROM db.itt VERSION AS OF 1").collect()[0].n == 7
    )
    assert lh.sql("SELECT COUNT(*) AS n FROM db.itt").collect()[0].n == 12

    # join of two as-of states plans through the same path
    n = lh.sql(
        "SELECT COUNT(*) AS n FROM db.tt VERSION AS OF 0 a "
        "JOIN db.itt VERSION AS OF 1 b ON a.k = b.k"
    ).collect()[0].n
    assert n == 7

    # views refuse AS OF
    lh.sql("CREATE VIEW vv AS SELECT k FROM db.tt")
    with pytest.raises(ValueError, match="not supported"):
        lh.sql("SELECT * FROM db.vv VERSION AS OF 0")


def test_sql_table_changes_tvf(spark, lh, tmp_path):
    """table_changes('db.t', a[, b]) in the facade: Delta versions
    (inclusive start, delta-spark's rule), Delta timestamps (quoted
    args), and Iceberg snapshot ids (exclusive start, its native
    rule)."""
    dl = DeltaLogTable(spark, str(tmp_path / "wh" / "db" / "cd"))
    dl.write(spark.range(0, 10).selectExpr("id AS k"), mode="append")  # v0
    dl.set_property("delta.enableChangeDataFeed", "true")  # v1
    dl.delete("k < 3")  # v2
    dl.write(spark.range(10, 15).selectExpr("id AS k"), mode="append")  # v3
    lh.sql(f"CREATE TABLE cd USING DELTA LOCATION '{dl.path}'")

    got = lh.sql(
        "SELECT _change_type, COUNT(*) AS n FROM table_changes('db.cd', 2, 3) "
        "GROUP BY _change_type ORDER BY _change_type"
    ).collect()
    by = {r._change_type: r.n for r in got}
    assert by == {"delete": 3, "insert": 5}

    # aggregate over the feed joined against the current state
    n = lh.sql(
        "SELECT COUNT(*) AS n FROM table_changes('db.cd', 0, 3) c "
        "JOIN db.cd t ON c.k = t.k WHERE c._change_type = 'insert'"
    ).collect()[0].n
    assert n == 7 + 5  # v0 inserts still live (10-3) + v3 inserts 5

    # Iceberg base: exclusive-from snapshot convention
    ice = IcebergTable(spark, str(tmp_path / "wh" / "db" / "ci"))
    ice.append(spark.range(0, 6).selectExpr("id AS k").coalesce(1))
    ice.append(spark.range(6, 9).selectExpr("id AS k").coalesce(1))
    lh.sql(f"CREATE TABLE ci USING ICEBERG LOCATION '{ice.path}'")
    rows = lh.sql(
        "SELECT k, _change_type FROM table_changes('db.ci', 1) ORDER BY k"
    ).collect()
    assert [r.k for r in rows] == list(range(6, 9))
    assert all(r._change_type == "insert" for r in rows)


def test_metadata_suffix_tables_in_facade(spark, tmp_path):
    """db.t.files / .snapshots / .partitions / .history resolve for an
    Iceberg table; db.t.history resolves for a Delta table; the
    unsupported combination refuses loudly."""
    import pytest

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    ice = IcebergTable(spark, str(tmp_path / "ice"))
    ice.append(spark.range(20).selectExpr("id", "id % 2 AS p").coalesce(1))
    ice.append(spark.range(20, 30).selectExpr("id", "id % 2 AS p").coalesce(1))
    dl = DeltaLogTable(spark, str(tmp_path / "dl"))
    dl.write(spark.range(5).selectExpr("id"), mode="overwrite")

    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE m")
    lh.sql(f"CREATE TABLE m.ice USING ICEBERG LOCATION '{tmp_path / 'ice'}'")
    lh.sql(f"CREATE TABLE m.dl USING DELTA LOCATION '{tmp_path / 'dl'}'")

    assert lh.sql("SELECT COUNT(*) AS n FROM m.ice.snapshots").first()["n"] == 2
    files = lh.sql("SELECT record_count FROM m.ice.files WHERE content = 0").collect()
    assert sum(r["record_count"] for r in files) == 30
    parts = lh.sql("SELECT SUM(record_count) AS n FROM m.ice.partitions").first()
    assert parts["n"] == 30
    assert lh.sql("SELECT COUNT(*) AS n FROM m.ice.history").first()["n"] == 2
    assert lh.sql("SELECT COUNT(*) AS n FROM m.dl.history").first()["n"] >= 1
    with pytest.raises(NotImplementedError, match="metadata table"):
        lh.sql("SELECT * FROM m.dl.files")


def test_sql_join_mv_lifecycle(spark, tmp_path):
    """CREATE MATERIALIZED VIEW … JOIN … USING … KEYED BY, both-side
    DML, REFRESH (incremental AND FULL), and the Delta-base refusal
    for non-Delta sides."""
    import pytest

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.iceberg import IcebergTable
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    a = DeltaLogTable(spark, str(tmp_path / "a"))
    a.write(
        spark.createDataFrame([(1, 10, 1.0), (2, 20, 2.0)], "pk LONG, k LONG, v DOUBLE"),
        mode="overwrite",
    )
    a.set_property("delta.enableChangeDataFeed", "true")
    b = DeltaLogTable(spark, str(tmp_path / "b"))
    b.write(spark.createDataFrame([(10, "x"), (20, "y")], "k LONG, tag STRING"), mode="overwrite")
    b.set_property("delta.enableChangeDataFeed", "true")

    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE j")
    lh.sql(f"CREATE TABLE j.a USING DELTA LOCATION '{tmp_path / 'a'}'")
    lh.sql(f"CREATE TABLE j.b USING DELTA LOCATION '{tmp_path / 'b'}'")
    lh.sql(
        "CREATE MATERIALIZED VIEW j.v AS SELECT pk, k, v, tag "
        "FROM j.a JOIN j.b USING (k) KEYED BY (pk, k)"
    )
    assert {r["pk"] for r in lh.sql("SELECT pk FROM j.v").collect()} == {1, 2}

    # facade DML on both sides, one incremental refresh window
    lh.sql("INSERT INTO j.a VALUES (3, 10, 3.0)")
    lh.sql("DELETE FROM j.b WHERE k = 20")
    lh.sql("REFRESH MATERIALIZED VIEW j.v")
    rows = {(r["pk"], r["k"]) for r in lh.sql("SELECT pk, k FROM j.v").collect()}
    assert rows == {(1, 10), (3, 10)}, rows

    # FULL refresh replays create() from the stored config
    lh.sql("REFRESH MATERIALIZED VIEW j.v FULL")
    rows2 = {(r["pk"], r["k"]) for r in lh.sql("SELECT pk, k FROM j.v").collect()}
    assert rows2 == rows

    ice = IcebergTable(spark, str(tmp_path / "ice"))
    ice.append(spark.createDataFrame([(10, 1)], "k LONG, z LONG").coalesce(1))
    lh.sql(f"CREATE TABLE j.ice USING ICEBERG LOCATION '{tmp_path / 'ice'}'")
    with pytest.raises(NotImplementedError, match="Delta CDF bases"):
        lh.sql(
            "CREATE MATERIALIZED VIEW j.v2 AS SELECT pk, k, z "
            "FROM j.a JOIN j.ice USING (k) KEYED BY (pk, k)"
        )


def test_with_recursive_union_distinct_terminates_on_cycle(spark, tmp_path):
    """UNION (set) semantics dedupe the frontier against everything
    seen (semi-naive evaluation), so a CYCLIC graph's transitive
    closure terminates — the case UNION ALL would loop forever on."""
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src int, dst int"
    )
    t = DeltaLogTable(spark, str(tmp_path / "e"))
    t.write(edges, mode="overwrite")
    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE g")
    lh.sql(f"CREATE TABLE g.edges USING DELTA LOCATION '{t.path}'")
    got = lh.sql(
        """
        WITH RECURSIVE reach (src, dst) AS (
          SELECT src, dst FROM g.edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN g.edges e ON r.dst = e.src
        )
        SELECT src, dst FROM reach ORDER BY src, dst
        """
    )
    rows = {(r["src"], r["dst"]) for r in got.collect()}
    # transitive closure of {1->2->3->1, 3->4}: every node in the cycle
    # reaches every node (incl. itself) and 4; 4 reaches nothing
    want = {(s, d) for s in (1, 2, 3) for d in (1, 2, 3, 4)}
    assert rows == want
    # cross-engine: DuckDB's native recursive CTE agrees
    import duckdb

    duck = duckdb.connect()
    duck.execute("CREATE TABLE edges (src INT, dst INT)")
    duck.executemany(
        "INSERT INTO edges VALUES (?, ?)", [(1, 2), (2, 3), (3, 1), (3, 4)]
    )
    dk = set(
        map(
            tuple,
            duck.execute(
                """
        WITH RECURSIVE reach (src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src, dst FROM reach ORDER BY src, dst
        """
            ).fetchall(),
        )
    )
    assert rows == dk


def test_with_recursive_divergence_fails_loudly(spark, tmp_path, monkeypatch):
    """A step with no termination condition hits MAX_RECURSION and
    raises instead of looping forever."""
    import pytest

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    t = DeltaLogTable(spark, str(tmp_path / "n"))
    t.write(spark.createDataFrame([(1,)], "x int"), mode="overwrite")
    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE d")
    lh.sql(f"CREATE TABLE d.n USING DELTA LOCATION '{t.path}'")
    monkeypatch.setattr(type(lh), "MAX_RECURSION", 5)
    with pytest.raises(ValueError, match="did not converge"):
        lh.sql(
            """
            WITH RECURSIVE r (x) AS (
              SELECT x FROM d.n
              UNION ALL
              SELECT x + 1 FROM r
            )
            SELECT COUNT(*) FROM r
            """
        )


def test_with_recursive_name_in_string_literal_survives(spark, tmp_path):
    """The CTE-name → internal-alias rewrite is quote-aware: a step or
    final SELECT whose STRING LITERALS contain the CTE name (here a
    CTE named ``frontier`` filtered by ``label <> 'frontier'``) must
    keep those literals byte-identical — rewriting inside them silently
    corrupts predicates (VERDICT r12 finding 2). Verified against
    DuckDB running the SAME statement natively."""
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    rows = [
        (1, 0, "seed"),
        (2, 1, "frontier"),
        (3, 1, "keep"),
        (4, 3, "keep"),
        (5, 4, "frontier"),
    ]
    nodes = spark.createDataFrame(rows, "id int, parent int, label string")
    t = DeltaLogTable(spark, str(tmp_path / "nodes"))
    t.write(nodes, mode="overwrite")
    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE g")
    lh.sql(f"CREATE TABLE g.nodes USING DELTA LOCATION '{t.path}'")
    stmt = """
        WITH RECURSIVE frontier (id, label) AS (
          SELECT id, label FROM {tbl} WHERE parent = 0
          UNION ALL
          SELECT n.id, n.label
          FROM frontier JOIN {tbl} n ON n.parent = frontier.id
          WHERE n.label <> 'frontier'
        )
        SELECT id, concat(label, ' via frontier') AS tag
        FROM frontier WHERE label <> 'not frontier' ORDER BY id
    """
    got = [tuple(r) for r in lh.sql(stmt.format(tbl="g.nodes")).collect()]
    # seed(1) expands to 3, then 4; 2 and 5 are pruned by the literal
    assert got == [
        (1, "seed via frontier"),
        (3, "keep via frontier"),
        (4, "keep via frontier"),
    ]
    import duckdb

    duck = duckdb.connect()
    duck.execute("CREATE TABLE nodes (id INT, parent INT, label VARCHAR)")
    duck.executemany("INSERT INTO nodes VALUES (?, ?, ?)", rows)
    assert got == [
        tuple(r) for r in duck.execute(stmt.format(tbl="nodes")).fetchall()
    ]


def test_sub_ident_outside_literals_unit():
    """Unit coverage of the quote-skipping substitution: word
    boundaries, single/double-quoted literals, doubled quotes, and
    backtick identifiers (which MUST rebind — they reference the CTE)."""
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    sub = LakehouseSession._sub_ident_outside_literals
    assert sub("SELECT x FROM r", "r", "A") == "SELECT x FROM A"
    assert sub("SELECT 'r' FROM r", "r", "A") == "SELECT 'r' FROM A"
    assert sub('SELECT "no r here", r.x FROM r', "r", "A") == (
        'SELECT "no r here", A.x FROM A'
    )
    assert sub("SELECT 'it''s r' FROM r", "r", "A") == "SELECT 'it''s r' FROM A"
    assert sub("SELECT rr, r_x, x_r FROM r", "r", "A") == (
        "SELECT rr, r_x, x_r FROM A"
    )
    assert sub("SELECT x FROM `r`", "r", "A") == "SELECT x FROM `A`"
    # unterminated literal: everything after the quote stays untouched
    assert sub("SELECT 'r FROM r", "r", "A") == "SELECT 'r FROM r"
    # backslash-escaped quote stays INSIDE the literal (Spark's default
    # non-ANSI string parser): the CTE name in the literal's tail must
    # not be rewritten, and real references after it still rebind
    assert sub(
        "SELECT x FROM r WHERE lbl <> 'it\\'s r' AND r.x > 0", "r", "A"
    ) == "SELECT x FROM A WHERE lbl <> 'it\\'s r' AND A.x > 0"
    # escaped backslash at literal end: quote after \\ DOES terminate
    assert sub("SELECT 'p\\\\' , r.x FROM r", "r", "A") == (
        "SELECT 'p\\\\' , A.x FROM A"
    )
    # double-quoted literal with an escaped double quote
    assert sub('SELECT "a \\" r tail", r.x FROM r', "r", "A") == (
        'SELECT "a \\" r tail", A.x FROM A'
    )


def test_with_recursive_rejects_malformed_body(spark, tmp_path):
    import pytest

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="UNION"):
        lh.sql("WITH RECURSIVE r AS (SELECT 1 AS x) SELECT * FROM r")
    with pytest.raises(ValueError, match="final SELECT"):
        lh.sql(
            "WITH RECURSIVE r AS (SELECT 1 AS x UNION ALL "
            "SELECT x + 1 FROM r WHERE x < 3) DELETE FROM r"
        )


def test_near_dup_tvf_composes_and_respects_policies(spark, tmp_path):
    """The near_dup_pairs TVF behaves like any table: it composes with
    aggregates, and the scanned base rows pass through read policies —
    a ROW FILTER that hides one near-dup twin removes its pairs."""
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession
    from ent_fins_lakehouse_spark.sources.lakehouse import DeltaLogTable

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact twin of 1
        (3, "one two three four five six seven"),
        (4, "one two three four five six seven"),     # exact twin of 3
        (5, "completely different text with no twin"),
    ]
    t = DeltaLogTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(rows, "doc_id long, text string"))
    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE dd")
    lh.sql(f"CREATE TABLE dd.docs USING DELTA LOCATION '{t.path}'")

    got = lh.sql(
        "SELECT id_a, id_b FROM near_dup_pairs('dd.docs', 'doc_id', 'text', 0.9) "
        "ORDER BY id_a"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2), (3, 4)]
    # composes with aggregates
    n = lh.sql(
        "SELECT COUNT(*) AS n FROM near_dup_pairs('dd.docs', 'doc_id', 'text', 0.9)"
    ).collect()[0]["n"]
    assert n == 2
    # governance rides the scan: hide doc 2 -> its pair disappears
    lh.sql("ALTER TABLE dd.docs SET ROW FILTER (doc_id <> 2)")
    filtered = lh.sql(
        "SELECT id_a, id_b FROM near_dup_pairs('dd.docs', 'doc_id', 'text', 0.9) "
        "ORDER BY id_a"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in filtered] == [(3, 4)]


def test_sub_ident_literal_segmentation_property():
    """Property fuzz of the literal scanner (r13 ADVICE hardening): an
    INDEPENDENT char-walk state machine (backslash escapes the next
    char; a doubled quote re-enters; unterminated extends to the end)
    segments randomized quote/escape soup, the same \\b-regex is applied
    to the model's outside segments only, and the result must equal
    _sub_ident_outside_literals byte-for-byte. Catches any divergence
    in escape/doubled-quote/unterminated handling."""
    import random
    import re

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    sub = LakehouseSession._sub_ident_outside_literals
    pat = re.compile(r"\br\b")

    def model(sql: str, alias: str) -> str:
        out, seg, i, n = [], [], 0, len(sql)
        while i < n:
            c = sql[i]
            if c in ("'", '"'):
                out.append(pat.sub(alias, "".join(seg)))
                seg = []
                q, j = c, i + 1
                lit = [c]
                while j < n:
                    if sql[j] == "\\":
                        lit.append(sql[j : j + 2])
                        j += 2
                        continue
                    if sql[j] == q:
                        lit.append(q)
                        j += 1
                        break
                    lit.append(sql[j])
                    j += 1
                out.append("".join(lit))
                i = j if j > i else n
            else:
                seg.append(c)
                i += 1
        out.append(pat.sub(alias, "".join(seg)))
        return "".join(out)

    rng = random.Random(140_002)
    alphabet = ["r", "x", " ", "'", '"', "\\", "(", ")", ".", ",", "r", " r "]
    for trial in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        got = sub(s, "r", "A")
        want = model(s, "A")
        assert got == want, (trial, repr(s), repr(got), repr(want))
