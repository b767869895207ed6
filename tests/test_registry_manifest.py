"""The generated registry manifest must stay in lockstep with the live
decorator registrations (VERDICT r9 item 3: lazy-split registry).

A stale manifest would silently hide a new query from the driver (it
reads queries() through the manifest), so staleness is a hard test
failure with the regeneration command in the message.
"""

from __future__ import annotations

import subprocess
import sys

from ent_fins_lakehouse_spark.plans import _manifest, registry


def test_manifest_matches_live_registry():
    registry._load_all()
    live_modules = {n: s.fn.__module__ for n, s in registry.QUERIES.items()}
    live_oracles = {n: s.oracle for n, s in registry.QUERIES.items() if s.oracle is not None}
    assert _manifest.MODULES == live_modules, (
        "manifest stale — run: python tools/gen_manifest.py"
    )
    assert _manifest.ORACLES == live_oracles, (
        "manifest stale — run: python tools/gen_manifest.py"
    )


def test_registry_import_is_lazy():
    """Building the query/oracle maps must not import any plan module —
    the whole point of the manifest. Checked in a subprocess so this
    test's own imports can't contaminate sys.modules."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from ent_fins_lakehouse_spark.plans.registry import queries_map, oracle_sql_map\n"
        "q = queries_map(); o = oracle_sql_map()\n"
        "assert len(q) > 300 and len(o) > 300, (len(q), len(o))\n"
        "heavy = [m for m in sys.modules if m.startswith('ent_fins_lakehouse_spark.plans.')\n"
        "         and not m.endswith(('registry', '_manifest'))]\n"
        "assert not heavy, heavy\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)


def test_lazy_wrapper_resolves_and_runs(spark):
    """A manifest-served wrapper must import its module on first call
    and produce the same result as the direct registration."""
    qmap = registry.queries_map()
    df = qmap["q01_pricing_summary"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
