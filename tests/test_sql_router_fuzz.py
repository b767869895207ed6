"""SQL facade router fuzz (VERDICT r12 item 5).

The facade routes ~30 statement shapes by anchored regex
(`sources/catalog.py LakehouseSession.sql`). Two property families:

1. **Robustness** — every supported verb must route identically under
   randomized KEYWORD case, whitespace (spaces/tabs/newlines between
   tokens), leading ``--``/``/* */`` comments, and trailing semicolons.
   Each trial replays a full DDL+DML script through a fresh session
   with every statement independently mutated, then asserts the final
   table state — a mis-route would either error or corrupt the state.

2. **Loud refusal** — near-miss variants of owned verbs (extra tokens,
   unsupported clauses) must raise ValueError, NOT fall through to
   spark.sql: a ``DROP TABLE`` landing on Spark's own (empty) session
   catalog is a silent no-op against the wrong catalog, the exact
   wrong-effect class the ``_OWNED_VERB`` gate pins. Statements the
   facade never claims (plain SELECT, temp-view DDL, EXPLAIN, SHOW
   FUNCTIONS) still pass through.
"""

from __future__ import annotations

import random

import pytest

# Each script line is (kw_or_text, ...) segments; segments tagged "k"
# are SQL keywords safe to case-mutate, "i" segments (identifiers,
# literals, predicates) are left byte-identical.
K, I = "k", "i"


def _script(loc: str) -> list[list[tuple[str, str]]]:
    return [
        [(K, "CREATE DATABASE"), (I, " fz")],
        [(K, "USE"), (I, " fz")],
        [
            (K, "CREATE TABLE"),
            (I, " fz.t "),
            (K, "USING DELTA LOCATION"),
            (I, f" '{loc}' "),
            (K, "AS SELECT"),
            (I, " 1 "),
            (K, "AS"),
            (I, " k, 'a' "),
            (K, "AS"),
            (I, " v"),
        ],
        [(K, "INSERT INTO"), (I, " fz.t "), (K, "VALUES"), (I, " (2, 'b'), (3, 'c')")],
        [(K, "UPDATE"), (I, " fz.t "), (K, "SET"), (I, " v = 'z' "), (K, "WHERE"), (I, " k = 2")],
        [(K, "DELETE FROM"), (I, " fz.t "), (K, "WHERE"), (I, " k = 3")],
        [(K, "INSERT INTO"), (I, " fz.t "), (K, "SELECT"), (I, " 4 "), (K, "AS"), (I, " k, 'd' "), (K, "AS"), (I, " v")],
        [(K, "ALTER TABLE"), (I, " fz.t "), (K, "SET TBLPROPERTIES"), (I, " ('delta.appendOnly' = 'false')")],
        [(K, "SHOW TBLPROPERTIES"), (I, " fz.t")],
        [(K, "DESCRIBE HISTORY"), (I, " fz.t")],
        [(K, "SHOW COLUMNS IN"), (I, " fz.t")],
        [(K, "SHOW TABLES IN"), (I, " fz")],
        [(K, "SHOW DATABASES")],
        [(K, "ANALYZE TABLE"), (I, " fz.t "), (K, "COMPUTE STATISTICS")],
        [(K, "OPTIMIZE"), (I, " fz.t")],
        [(K, "VACUUM"), (I, " fz.t "), (K, "RETAIN"), (I, " 168 "), (K, "HOURS DRY RUN")],
        [(K, "CREATE VIEW"), (I, " fz.v "), (K, "AS SELECT"), (I, " k "), (K, "FROM"), (I, " fz.t")],
        [(K, "SELECT * FROM"), (I, " fz.t")],
        [(K, "DROP VIEW"), (I, " fz.v")],
    ]


def _mutate(segments, rng: random.Random) -> str:
    """Randomize keyword case + inter-token whitespace, then wrap with
    random leading comments / whitespace and trailing semicolons."""
    parts = []
    for kind, text in segments:
        if kind == K:
            toks = text.split(" ")
            toks = [
                "".join(
                    c.upper() if rng.random() < 0.5 else c.lower() for c in t
                )
                for t in toks
            ]
            ws = rng.choice([" ", "  ", "\n", "\t", " \n "])
            parts.append(ws.join(toks))
        else:
            parts.append(text)
        parts.append(rng.choice(["", " ", "\n"]))
    s = "".join(parts).strip()
    if rng.random() < 0.4:
        s = rng.choice(["-- fuzz comment\n", "/* fuzz */ ", "/* a\nb */\n", "  -- x\n  -- y\n"]) + s
    if rng.random() < 0.5:
        s = "   " + s
    s = s + rng.choice(["", ";", " ;", ";;", ";\n"])
    return s


@pytest.mark.parametrize("seed", range(8))
def test_router_robust_to_case_whitespace_comments(spark, tmp_path, seed):
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    rng = random.Random(seed)
    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    last = None
    for segs in _script(str(tmp_path / "t")):
        stmt = _mutate(segs, rng)
        last = lh.sql(stmt)
    # final state: k=1 'a', k=2 updated to 'z', k=3 deleted, k=4 'd'
    rows = {(r["k"], r["v"]) for r in lh.sql("SELECT * FROM fz.t").collect()}
    assert rows == {(1, "a"), (2, "z"), (4, "d")}, (seed, rows)
    assert last is None  # DROP VIEW returns None


NEAR_MISSES = [
    # (statement, why it must refuse rather than hit spark.sql)
    "DROP TABLE fz.t CASCADE",  # extra token after the routed shape
    "CREATE DATABASE fz2 WITH DBPROPERTIES ('a'='b')",  # unsupported clause
    "CREATE TABLE fz.t2 (k INT) USING CSV",  # column list + format not routed
    "INSERT INTO fz.t (k, v) VALUES (9, 'x')",  # column list unsupported
    "DELETE FROM fz.t",  # full-table delete without WHERE is not routed
    "MERGE INTO fz.t USING src ON t.k = src.k",  # no WHEN clauses
    "OPTIMIZE fz.t WHERE k > 0",  # predicate clause unsupported
    "VACUUM fz.t RETAIN 7 DAYS",  # unit must be HOURS
    "REORG TABLE fz.t APPLY (REWRITE)",  # only PURGE is routed
    "ANALYZE TABLE fz.t COMPUTE STATISTICS NOSCAN",  # NOSCAN unsupported
    "DESCRIBE HISTORY",  # missing target
    "SHOW TABLES FROM fz",  # routed form is IN, FROM would hit spark's catalog
    "SHOW PARTITIONS",  # missing target
    "ALTER TABLE fz.t ADD COLUMNS (c1 INT, c2 INT)",  # multi-add unsupported
    "ALTER TABLE fz.t RENAME TO fz.t9",  # table rename not routed
    "REFRESH MATERIALIZED VIEW",  # missing target
    "USE",  # missing database
    "UPDATE fz.t SET",  # missing assignments
]


def test_router_refuses_near_misses_loudly(spark, tmp_path):
    """Every near-miss raises the facade's ValueError — never a silent
    spark.sql fallthrough (asserted via the error text), never an
    AnalysisException from Spark's own parser over the wrong catalog."""
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("CREATE DATABASE fz")
    lh.sql(
        f"CREATE TABLE fz.t USING DELTA LOCATION '{tmp_path / 't'}' "
        "AS SELECT 1 AS k, 'a' AS v"
    )
    for stmt in NEAR_MISSES:
        with pytest.raises(ValueError, match="facade-owned verb|UPDATE SET"):
            lh.sql(stmt)
    # and the table is intact — no near-miss had a side effect
    assert lh.sql("SELECT * FROM fz.t").count() == 1


def test_router_still_passes_through_unowned_statements(spark, tmp_path):
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    assert lh.sql("SELECT 1 AS x").collect()[0]["x"] == 1
    lh.sql("CREATE OR REPLACE TEMPORARY VIEW fuzz_tmp AS SELECT 2 AS x")
    assert lh.sql("SELECT * FROM fuzz_tmp").collect()[0]["x"] == 2
    assert lh.sql("SHOW FUNCTIONS").count() > 0
    assert lh.sql("EXPLAIN SELECT 1").count() == 1
    lh.sql("DROP VIEW fuzz_tmp") if False else None  # temp views die with session


def test_router_comment_handling_edge_cases(spark, tmp_path):
    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    lh = LakehouseSession(spark, str(tmp_path / "wh"))
    lh.sql("-- make the db\nCREATE DATABASE fz")
    assert "fz" in [r[0] for r in lh.sql("/* list */ SHOW DATABASES").collect()]
    with pytest.raises(ValueError, match="unterminated block comment"):
        lh.sql("/* oops CREATE DATABASE nope")
    # a comment-only statement is empty — spark.sql refuses it loudly
    with pytest.raises(Exception):
        lh.sql("-- nothing here")
