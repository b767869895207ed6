"""Grammar-level fuzz of the facade's SELECT composition (VERDICT r13
item 4).

The router fuzz (test_sql_router_fuzz.py) covers VERB dispatch; this
suite covers what the SELECT path COMPOSES once dispatched:
CTEs, ``VERSION/TIMESTAMP AS OF`` time travel, the ``table_changes``
and ``near_dup_pairs`` TVFs, metadata-suffix tables, stored views
(including views-on-views), and read policies (row filter + column
mask) — in randomized combination, not one feature per test.

Two property families, same contract as the router fuzz:

1. **Parity** — ≥120 generated statements composing random atoms into
   projections / aggregations / joins / CTEs / UNIONs run through
   ``LakehouseSession.sql`` AND through DuckDB over an INDEPENDENT
   model: every table state, every CDF row, every policy effect, and
   the exact near-dup pair set are maintained in plain Python while
   the fixture script runs, then registered as DuckDB relations. A
   composition bug anywhere in the rewrite chain (TVF aliasing,
   as-of resolution, view expansion, policy application, identifier
   substitution) diverges the row sets.
2. **Loud refusal** — compositions the facade documents as
   unsupported (as-of over a view, timestamp CDF on an Iceberg base,
   metadata suffix a format doesn't expose) must raise, never fall
   through to a wrong-catalog or wrong-semantics answer.
"""

from __future__ import annotations

import itertools
import math
import random

import pandas as pd
import pytest

N_STATEMENTS = 120
SEED = 140_001


# ------------------------------------------------------------- fixture


def _jaccard_pairs(docs: list[tuple[int, str]], thr: float) -> list[tuple[int, int, float]]:
    """Independent exact all-pairs Jaccard over whitespace unigrams —
    the operator's contract (normalize = lower + collapse whitespace,
    distinct tokens, J >= threshold, id_a < id_b)."""
    sets = {i: set(" ".join(t.lower().split()).split(" ")) for i, t in docs}
    out = []
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        j = len(sa & sb) / len(sa | sb)
        if j >= thr:
            out.append((a, b, j))
    return out


class _Fixture:
    pass


@pytest.fixture(scope="module")
def fz(spark, tmp_path_factory):
    import duckdb

    from ent_fins_lakehouse_spark.sources.catalog import LakehouseSession

    root = tmp_path_factory.mktemp("selfuzz")
    lh = LakehouseSession(spark, str(root / "wh"))
    duck = duckdb.connect()
    fx = _Fixture()
    fx.lh, fx.duck = lh, duck

    lh.sql("CREATE DATABASE fz")

    # ---- fz.d: Delta table with CDF on, 6 versions. The MODEL (state
    # per version + expected CDF rows) is maintained in plain Python as
    # the script runs — DuckDB never sees the engine's answers.
    def vals(rows):
        return ", ".join(f"({k}, '{v}', {g})" for k, v, g in rows)

    d0 = [(k, f"w{k % 4}", k % 3) for k in range(8)]
    lh.sql(
        "CREATE TABLE fz.d USING DELTA AS SELECT * FROM "
        f"(VALUES {vals(d0)}) AS t(k, v, g)"
    )  # version 0
    model = {k: (v, g) for k, v, g in d0}
    states = [dict(model)]  # states[n] = content as of version n
    cdf: list[tuple[int, str, int, str, int]] = []  # k,v,g,type,version

    lh.sql(
        "ALTER TABLE fz.d SET TBLPROPERTIES "
        "('delta.enableChangeDataFeed' = 'true')"
    )  # version 1 (metadata commit)
    states.append(dict(model))

    ins2 = [(k, f"w{k % 4}", k % 3) for k in range(10, 14)]
    lh.sql(f"INSERT INTO fz.d VALUES {vals(ins2)}")  # version 2
    for k, v, g in ins2:
        model[k] = (v, g)
        cdf.append((k, v, g, "insert", 2))
    states.append(dict(model))

    lh.sql("UPDATE fz.d SET v = 'u' WHERE g = 2")  # version 3
    for k, (v, g) in sorted(model.items()):
        if g == 2:
            cdf.append((k, v, g, "update_preimage", 3))
            model[k] = ("u", g)
            cdf.append((k, "u", g, "update_postimage", 3))
    states.append(dict(model))

    lh.sql("DELETE FROM fz.d WHERE k >= 11")  # version 4
    for k, (v, g) in sorted(model.items()):
        if k >= 11:
            cdf.append((k, v, g, "delete", 4))
    model = {k: vg for k, vg in model.items() if k < 11}
    states.append(dict(model))

    ins5 = [(20, "zz", 0), (21, "zz", 1)]
    lh.sql(f"INSERT INTO fz.d VALUES {vals(ins5)}")  # version 5
    for k, v, g in ins5:
        model[k] = (v, g)
        cdf.append((k, v, g, "insert", 5))
    states.append(dict(model))

    hist = lh.sql("DESCRIBE HISTORY fz.d").collect()
    assert len(hist) == len(states), "fixture version accounting drifted"
    # timestamp-as-of probe literal: version 2's commit timestamp as
    # quoted epoch-millis (the facade's pass-through form)
    fx.ts_v2 = next(
        str(r["timestamp_ms"]) for r in hist if int(r["version"]) == 2
    )

    def reg(name: str, df: pd.DataFrame) -> None:
        duck.register(f"_{name}_pdf", df)
        duck.execute(f"CREATE TABLE {name} AS SELECT * FROM _{name}_pdf")

    for n, st in enumerate(states):
        reg(
            f"d_v{n}",
            pd.DataFrame(
                [(k, v, g) for k, (v, g) in sorted(st.items())],
                columns=["k", "v", "g"],
            ),
        )
    duck.execute(f"CREATE VIEW d AS SELECT * FROM d_v{len(states) - 1}")
    reg(
        "cdf",
        pd.DataFrame(
            cdf, columns=["k", "v", "g", "_change_type", "_commit_version"]
        ),
    )
    fx.n_versions = len(states)

    # ---- fz.i: Iceberg table, 3 snapshots
    i0 = [(k, f"s{k % 3}", k % 2) for k in range(6)]
    lh.sql(
        "CREATE TABLE fz.i USING ICEBERG AS SELECT * FROM "
        f"(VALUES {vals(i0)}) AS t(k, v, g)"
    )
    imodel = {k: (v, g) for k, v, g in i0}
    for batch in ([(6, "s0", 0), (7, "s1", 1)], [(8, "s2", 0)]):
        lh.sql(f"INSERT INTO fz.i VALUES {vals(batch)}")
        for k, v, g in batch:
            imodel[k] = (v, g)
    reg(
        "i",
        pd.DataFrame(
            [(k, v, g) for k, (v, g) in sorted(imodel.items())],
            columns=["k", "v", "g"],
        ),
    )
    fx.i_snapshots = 3

    # ---- fz.p: policy-governed table (row filter + column mask)
    p0 = [(k, f"p{k % 5}", k % 3) for k in range(9)]
    lh.sql(
        "CREATE TABLE fz.p USING DELTA AS SELECT * FROM "
        f"(VALUES {vals(p0)}) AS t(k, v, g)"
    )
    lh.sql("ALTER TABLE fz.p SET ROW FILTER (g <> 1)")
    lh.sql(
        "ALTER TABLE fz.p SET COLUMN MASK v = "
        "CASE WHEN g = 2 THEN '***' ELSE v END"
    )
    reg("p_raw", pd.DataFrame(p0, columns=["k", "v", "g"]))
    duck.execute(
        "CREATE VIEW p_eff AS SELECT k, "
        "CASE WHEN g = 2 THEN '***' ELSE v END AS v, g "
        "FROM p_raw WHERE g <> 1"
    )

    # ---- stored views (view + view-on-view), over the FINAL d state
    lh.sql("CREATE VIEW fz.vw AS SELECT k, v, g FROM fz.d WHERE g > 0")
    lh.sql("CREATE VIEW fz.vv AS SELECT k, g FROM fz.vw WHERE k % 2 = 0")
    duck.execute("CREATE VIEW vw AS SELECT k, v, g FROM d WHERE g > 0")
    duck.execute("CREATE VIEW vv AS SELECT k, g FROM vw WHERE k % 2 = 0")

    # ---- fz.docs: near-dup corpus; expected pair set computed by an
    # independent pure-Python Jaccard
    docs = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox leaps"),
        (3, "a slow red fox sits"),
        (4, "the quick brown fox jumps"),
        (5, "entirely different words here now"),
        (6, "entirely different words here soon"),
        (7, "the quick red fox jumps"),
    ]
    lh.sql(
        "CREATE TABLE fz.docs USING DELTA AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") AS t(id, txt)"
    )
    fx.nd_thresholds = (0.5, 0.75)
    for thr in fx.nd_thresholds:
        tag = str(thr).replace(".", "_")
        reg(
            f"nd_{tag}",
            pd.DataFrame(
                _jaccard_pairs(docs, thr), columns=["id_a", "id_b", "jaccard"]
            ),
        )

    yield fx
    duck.close()


# ---------------------------------------------------------- generation


class _Atom:
    def __init__(self, spark_ref: str, duck_ref: str, int_cols, str_cols):
        self.spark_ref = spark_ref
        self.duck_ref = duck_ref
        self.int_cols = list(int_cols)
        self.str_cols = list(str_cols)

    @property
    def cols(self):
        return self.int_cols + self.str_cols


def _atoms(fx) -> list[_Atom]:
    out = [
        _Atom("fz.d", "d", ["k", "g"], ["v"]),
        _Atom("fz.i", "i", ["k", "g"], ["v"]),
        _Atom("fz.p", "p_eff", ["k", "g"], ["v"]),
        _Atom("fz.vw", "vw", ["k", "g"], ["v"]),
        _Atom("fz.vv", "vv", ["k", "g"], []),
    ]
    for n in range(fx.n_versions):
        out.append(_Atom(f"fz.d VERSION AS OF {n}", f"d_v{n}", ["k", "g"], ["v"]))
    out.append(_Atom(f"fz.d TIMESTAMP AS OF '{fx.ts_v2}'", "d_v2", ["k", "g"], ["v"]))
    return out


def _cdf_atom(rng: random.Random, fx) -> tuple[str, str]:
    a = rng.randint(2, fx.n_versions - 1)
    b = rng.choice([None, rng.randint(a, fx.n_versions - 1)])
    spark_ref = f"table_changes('fz.d', {a}" + (f", {b})" if b is not None else ")")
    hi = b if b is not None else fx.n_versions - 1
    duck_ref = (
        "(SELECT k, v, g, _change_type, _commit_version FROM cdf "
        f"WHERE _commit_version BETWEEN {a} AND {hi})"
    )
    return spark_ref, duck_ref


def _pred(rng: random.Random, atom: _Atom, alias: str = "") -> str:
    p = f"{alias}." if alias else ""
    choices = []
    for c in atom.int_cols:
        choices += [
            f"{p}{c} % 3 = {rng.randint(0, 2)}",
            f"{p}{c} >= {rng.randint(0, 6)}",
            f"{p}{c} <> {rng.randint(0, 4)}",
        ]
    for c in atom.str_cols:
        choices += [f"{p}{c} <> 'u'", f"length({p}{c}) >= 2"]
    a = rng.choice(choices)
    if rng.random() < 0.4:
        b = rng.choice(choices)
        return f"({a} {rng.choice(['AND', 'OR'])} {b})"
    return a


def _gen_statement(rng: random.Random, fx) -> tuple[str, str]:
    """One randomized composition → (facade SQL, duck SQL). Both sides
    are rendered from the same choices, so any divergence is the
    engine's, not the generator's."""
    atoms = _atoms(fx)
    kind = rng.randrange(6)

    if kind == 0:  # filtered projection over one atom
        at = rng.choice(atoms)
        cols = rng.sample(at.cols, rng.randint(1, len(at.cols)))
        w = _pred(rng, at)
        s = f"SELECT {', '.join(cols)} FROM {{ref}} WHERE {w}"
        return s.format(ref=at.spark_ref), s.format(ref=at.duck_ref)

    if kind == 1:  # aggregation with GROUP BY
        at = rng.choice(atoms)
        grp = rng.choice(at.int_cols)
        mcol = rng.choice(at.int_cols)
        s = (
            f"SELECT {grp}, count(*) AS c, sum({mcol}) AS s, "
            f"min({mcol}) AS mn, max({mcol}) AS mx "
            f"FROM {{ref}} WHERE {_pred(rng, at)} GROUP BY {grp}"
        )
        return s.format(ref=at.spark_ref), s.format(ref=at.duck_ref)

    if kind == 2:  # join of two atoms on k
        a, b = rng.sample([at for at in atoms if "k" in at.int_cols], 2)
        s = (
            "SELECT a.k AS k, a.g AS ga, b.g AS gb "
            "FROM {ra} a JOIN {rb} b ON a.k = b.k "
            f"WHERE {_pred(rng, a, 'a')}"
        )
        return (
            s.format(ra=a.spark_ref, rb=b.spark_ref),
            s.format(ra=a.duck_ref, rb=b.duck_ref),
        )

    if kind == 3:  # CTE over one atom, consumed with agg or join-back
        at = rng.choice(atoms)
        w = _pred(rng, at)
        if rng.random() < 0.5:
            s = (
                f"WITH c AS (SELECT k, g FROM {{ref}} WHERE {w}) "
                "SELECT g, count(*) AS c FROM c GROUP BY g"
            )
            return s.format(ref=at.spark_ref), s.format(ref=at.duck_ref)
        bt = rng.choice([x for x in atoms if x is not at])
        s = (
            f"WITH c AS (SELECT k, g FROM {{ra}} WHERE {w}) "
            "SELECT c.k AS k, b.g AS g FROM c JOIN {rb} b ON c.k = b.k"
        )
        return (
            s.format(ra=at.spark_ref, rb=bt.spark_ref),
            s.format(ra=at.duck_ref, rb=bt.duck_ref),
        )

    if kind == 4:  # CDF feed: projection/agg over table_changes
        sref, dref = _cdf_atom(rng, fx)
        if rng.random() < 0.5:
            s = (
                "SELECT _change_type AS ct, count(*) AS c, sum(k) AS sk "
                "FROM {ref} GROUP BY _change_type"
            )
        else:
            s = (
                "SELECT k, v, g, _change_type AS ct, _commit_version AS cv "
                "FROM {ref} WHERE k % 2 = " + str(rng.randint(0, 1))
            )
        return s.format(ref=sref), s.format(ref=dref)

    # kind == 5: near-dup TVF composed with a join or aggregate
    thr = rng.choice(fx.nd_thresholds)
    tag = str(thr).replace(".", "_")
    sref = f"near_dup_pairs('fz.docs', 'id', 'txt', {thr})"
    dref = f"nd_{tag}"
    if rng.random() < 0.5:
        s = "SELECT count(*) AS pairs, sum(id_a + id_b) AS sk FROM {ref}"
    else:
        s = (
            "SELECT id_a, id_b, round(jaccard, 6) AS j FROM {ref} "
            f"WHERE id_a <> {rng.randint(1, 7)}"
        )
    return s.format(ref=sref), s.format(ref=dref)


def _mutate_keywords(stmt: str, rng: random.Random) -> str:
    """Randomize the case of SQL keywords and stretch inter-token
    whitespace — the router fuzz's robustness family applied to the
    COMPOSED statement. Only fully-uppercase tokens are keywords by
    construction (the generator emits identifiers/literals lowercase),
    so identifiers and quoted literals stay byte-identical."""
    out = []
    for tok in stmt.split(" "):
        if tok.isalpha() and tok.isupper():
            tok = "".join(
                c.lower() if rng.random() < 0.5 else c for c in tok
            )
        out.append(tok)
    sep = lambda: rng.choice([" ", "  ", "\n", " \t"])  # noqa: E731
    return sep().join(out) if rng.random() < 0.5 else " ".join(out)


def _compare(sdf, duck, dsql: str, stmt: str) -> None:
    drel = duck.execute(dsql)
    dcols = [c[0] for c in drel.description]
    assert list(sdf.columns) == dcols, (stmt, sdf.columns, dcols)
    srows = sorted([tuple(r) for r in sdf.collect()], key=repr)
    drows = sorted([tuple(r) for r in drel.fetchall()], key=repr)
    assert len(srows) == len(drows), (stmt, len(srows), len(drows))
    for sr, dr in zip(srows, drows):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) or isinstance(dv, float):
                assert math.isclose(
                    float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-12
                ), (stmt, sr, dr)
            else:
                assert sv == dv, (stmt, sr, dr)


# --------------------------------------------------------------- tests


def test_select_composition_parity(fz):
    """≥120 randomized compositions of time travel, TVFs, views,
    policies, CTEs, joins, unions — facade result == DuckDB over the
    independent model, every time."""
    rng = random.Random(SEED)
    for n in range(N_STATEMENTS):
        stmt, dsql = _gen_statement(rng, fz)
        if rng.random() < 0.4:  # router-fuzz robustness, composed level
            stmt = _mutate_keywords(stmt, rng)
        try:
            sdf = fz.lh.sql(stmt)
            _compare(sdf, fz.duck, dsql, stmt)
        except AssertionError:
            raise
        except Exception as e:  # pragma: no cover - failure reporting
            raise AssertionError(f"statement #{n} failed: {stmt!r}: {e}") from e


def test_select_composition_union_all(fz):
    """UNION ALL across feature families (as-of state + live view),
    still pure parity."""
    stmt = (
        "SELECT k, g FROM fz.d VERSION AS OF 2 WHERE g = 0 "
        "UNION ALL SELECT k, g FROM fz.vv WHERE k >= 4"
    )
    dsql = (
        "SELECT k, g FROM d_v2 WHERE g = 0 "
        "UNION ALL SELECT k, g FROM vv WHERE k >= 4"
    )
    _compare(fz.lh.sql(stmt), fz.duck, dsql, stmt)


def test_select_refusals_stay_loud(fz):
    """Unsupported compositions raise — never a silent wrong answer."""
    with pytest.raises(ValueError, match="view"):
        fz.lh.sql("SELECT k FROM fz.vw VERSION AS OF 1")
    with pytest.raises(ValueError, match="view"):
        fz.lh.sql(
            "WITH c AS (SELECT k FROM fz.vw TIMESTAMP AS OF '2024-01-01') "
            "SELECT * FROM c"
        )
    with pytest.raises(NotImplementedError, match="Delta"):
        fz.lh.sql("SELECT count(*) FROM table_changes('fz.i', '2024-01-01')")
    with pytest.raises(NotImplementedError, match="metadata table"):
        fz.lh.sql("SELECT count(*) FROM fz.d.files")


def test_metadata_suffix_counts_match_model(fz):
    """Iceberg metadata-suffix tables inside a composed SELECT: the
    snapshot/history cardinality equals the number of commits the
    fixture script made (model-known, not engine-echoed)."""
    got = fz.lh.sql(
        "WITH s AS (SELECT * FROM fz.i.snapshots) SELECT count(*) AS c FROM s"
    ).collect()
    assert got[0]["c"] == fz.i_snapshots
    got = fz.lh.sql("SELECT count(*) AS c FROM fz.i.history").collect()
    assert got[0]["c"] == fz.i_snapshots
