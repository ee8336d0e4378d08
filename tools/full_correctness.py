#!/usr/bin/env python3
"""Full-catalog correctness sweep: run EVERY `queries()` entry at a
scale factor and compare against its DuckDB oracle (order-insensitive,
column-name-sorted, floats rounded to 6 places — the driver's check),
writing one JSON row per query to CORRECTNESS_FULL.json.

The driver's own CORRECTNESS_r{N}.json stamps a bounded prefix of the
catalog per round (~50 of 78); this sweep is the standing local
evidence that the WHOLE catalog is green, including the tail the
driver's window hasn't rotated to yet. Queries without an oracle
(approximate by construction) run with their in-plan asserts — their
row records rows_match only.

Usage: python tools/full_correctness.py [sf_dir] [out_json]
Exit 1 if any query fails.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import get_spark  # noqa: E402


def _canon(v):
    import datetime

    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def run_sweep(spark, sf: str, echo: bool = True) -> tuple[dict, int]:
    """Run every catalog query at ``sf`` against its oracle; return
    ({name: result_row}, n_failed). Shared by the CLI below and the
    pytest gate (tests/test_full_catalog.py) so `pytest tests/` alone
    certifies the whole catalog every round."""
    results: dict[str, dict] = {}
    bad = 0
    for name, fn in catalog.QUERIES.items():
        t0 = time.time()
        row: dict = {}
        try:
            sdf = fn(spark, sf)
            scols = sorted(sdf.columns)
            srows = [
                tuple(_canon(r[c]) for c in scols) for r in sdf.collect()
            ]
            row["spark_rows"] = len(srows)
            oracle = catalog.ORACLES.get(name)
            if oracle is None:
                row.update(
                    rows_match=True, schema_match=None, hash_match=None,
                    oracle_rows=None,
                    note="no oracle by design; in-plan asserts executed",
                )
            else:
                con = duckdb.connect()
                for t in catalog.TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf}/{t}.parquet')"
                    )
                rel = con.sql(oracle)
                dcols_all = [d[0] for d in rel.description]
                idx = [dcols_all.index(c) for c in scols]
                drows = [
                    tuple(_canon(r[i]) for i in idx) for r in rel.fetchall()
                ]
                row["oracle_rows"] = len(drows)
                row["rows_match"] = len(srows) == len(drows)
                row["schema_match"] = sorted(dcols_all) == scols
                row["hash_match"] = sorted(srows, key=repr) == sorted(
                    drows, key=repr
                )
            row["err"] = None
        except Exception as exc:  # noqa: BLE001 - sweep must finish
            row.update(
                rows_match=False, schema_match=False, hash_match=False,
                err=f"{type(exc).__name__}: {exc}"[:300],
            )
        row["sec"] = round(time.time() - t0, 2)
        ok = row.get("err") is None and row.get("rows_match") and (
            row.get("hash_match") in (True, None)
        )
        if not ok:
            bad += 1
        results[name] = row
        if echo:
            print(
                f"{name:26s} {'ok' if ok else 'FAIL':4s} "
                f"rows={row.get('spark_rows')} {row['sec']}s",
                flush=True,
            )
    return results, bad


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "CORRECTNESS_FULL.json")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "full-correctness", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    results, bad = run_sweep(spark, sf)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf, "results": results}, f, indent=1)
    n = len(results)
    print(f"\n{n - bad}/{n} green -> {out_path}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
