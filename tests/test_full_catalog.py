"""Full-catalog gate: every `catalog.QUERIES` entry runs at sf0.001
and must match its DuckDB oracle (or pass its in-plan asserts when
approximate by design). This makes `pytest tests/` alone certify all
catalog queries every round — the sf0.01 sweep in
tools/full_correctness.py remains the standing deeper evidence, but a
regression can no longer hide in the driver's rotating stamp window.

Runs the same comparison code as the CLI tool (run_sweep) so the two
gates cannot diverge.
"""

from __future__ import annotations

import importlib.util
import os

from conftest import SF_SMOKE

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "full_correctness.py",
)
_spec = importlib.util.spec_from_file_location("full_correctness", _TOOL)
full_correctness = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(full_correctness)


def test_full_catalog_sweep_sf0001(spark):
    results, bad = full_correctness.run_sweep(spark, SF_SMOKE, echo=False)
    failures = {
        name: row
        for name, row in results.items()
        if row.get("err") is not None
        or not row.get("rows_match")
        or row.get("hash_match") is False
    }
    assert bad == 0 and not failures, (
        f"{len(failures)} catalog queries failed at sf0.001: "
        + "; ".join(
            f"{n}: {r.get('err') or 'mismatch'}" for n, r in failures.items()
        )
    )
    # the sweep must actually cover the catalog (guards against an
    # accidentally-empty QUERIES import passing vacuously)
    assert len(results) >= 80
