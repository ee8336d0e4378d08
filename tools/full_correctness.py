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


def _canon_pdf(pdf):
    """Driver-style canonicalization (round-4 verdict item 4): the
    driver compares via pandas, NOT fetchall() — so dtype differences
    (DuckDB HUGEINT -> float64 vs Spark int64) and unhashable
    array<...> columns must FAIL here exactly as they fail there.
    Columns sorted by name, rows sorted over all columns (pandas
    multi-column sort_values uses a hash-table factorize and raises
    TypeError on list cells — intentionally not caught per-column),
    datetimes normalized to tz-naive datetime64[ns]."""
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            col = pdf[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            pdf[c] = col.astype("datetime64[ns]")
    pdf = pdf.sort_values(
        by=list(pdf.columns), kind="mergesort", ignore_index=True
    )
    return pdf


def _hash_pdf(pdf) -> str:
    """Order-insensitive value hash with the driver's exact dtype
    sensitivity: hash_pandas_object widens every integer dtype to
    uint64 (int32 == int64 for equal values) but hashes float64 by
    bit pattern (float64 1.0 != int64 1) — which is precisely why
    DuckDB HUGEINT->float64 sums fail against Spark int64 while
    INT-vs-BIGINT column pairs pass. Do NOT mix dtype names into the
    digest; that would be stricter than the driver."""
    import hashlib

    from pandas.util import hash_pandas_object

    h = hash_pandas_object(pdf, index=False)
    return hashlib.md5(h.values.tobytes()).hexdigest()


def _oracle_df(con, oracle: str, timeout: float | None):
    """Evaluate an oracle with an optional wall-clock bound: a timer
    thread calls con.interrupt() and the InterruptException surfaces
    here as TimeoutError. Bounding exists for the LARGE-sf sweep only
    (r08 verdict item 3: budget the quadratic oracles) — a handful of
    DuckDB replays are O(n²) by construction (recursive-CTE ε-graphs,
    brute-force list-cosine joins) and would run for hours at sf0.1;
    the Spark plans under test are never touched."""
    import threading

    if not timeout:
        return con.sql(oracle).df()
    timer = threading.Timer(timeout, con.interrupt)
    timer.start()
    try:
        return con.sql(oracle).df()
    except duckdb.InterruptException:
        raise TimeoutError
    finally:
        timer.cancel()


def run_sweep(
    spark,
    sf: str,
    echo: bool = True,
    oracle_timeout: float | None = None,
    flush_path: str | None = None,
) -> tuple[dict, int]:
    """Run every catalog query at ``sf`` against its oracle; return
    ({name: result_row}, n_failed). Shared by the CLI below and the
    pytest gate (tests/test_full_catalog.py) so `pytest tests/` alone
    certifies the whole catalog every round. ``oracle_timeout`` bounds
    each DuckDB replay; a timed-out oracle records an EXPLICIT weaker
    stamp (oracle_timeout=true, hash_match=null) — visibly distinct
    from green, never counted as a pass of the hash gate."""
    results: dict[str, dict] = {}
    bad = 0
    for name, fn in catalog.QUERIES.items():
        t0 = time.time()
        row: dict = {}
        try:
            sdf = fn(spark, sf)
            spdf = sdf.toPandas()
            row["spark_rows"] = len(spdf)
            oracle = catalog.ORACLES.get(name)
            if oracle is None:
                # Run the query (in-plan asserts fire on collect) but
                # record the weaker rows-only stamp, like the driver.
                row.update(
                    rows_match=True, schema_match=None, hash_match=None,
                    oracle_rows=None,
                    note="no oracle by design; in-plan asserts executed",
                )
            else:
                con = duckdb.connect()
                # quadratic oracles materialize huge CTEs at large sf:
                # spill to disk instead of taking down the box
                con.execute("SET memory_limit='48GB'")
                con.execute("SET temp_directory='/tmp/duckdb_sweep_tmp'")
                for t in catalog.TABLES:
                    # driver testdata tables are single files; the
                    # gen_scale_data fixtures are Spark-written
                    # DIRECTORIES — DuckDB needs the glob form there
                    tp = f"{sf}/{t}.parquet"
                    if os.path.isdir(tp):
                        tp = f"{tp}/*.parquet"
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{tp}')"
                    )
                try:
                    opdf = _oracle_df(con, oracle, oracle_timeout)
                except TimeoutError:
                    # No oracle rowcount exists, so rows_match is None
                    # (unknown) like schema/hash — NOT True: downstream
                    # consumers must not mistake a timed-out oracle for
                    # even a rows-only pass (r09 advisor finding).
                    row.update(
                        rows_match=None, schema_match=None,
                        hash_match=None, oracle_rows=None,
                        oracle_timeout=True,
                        note=(
                            f"oracle interrupted after {oracle_timeout}s "
                            "at this sf (quadratic DuckDB replay); the "
                            "hash gate for this query is the sf0.01 sweep"
                        ),
                        err=None,
                        sec=round(time.time() - t0, 2),
                    )
                    results[name] = row
                    _flush(flush_path, sf, results)
                    if echo:
                        print(
                            f"{name:26s} TIMEOUT(oracle) "
                            f"rows={row['spark_rows']} {row['sec']}s",
                            flush=True,
                        )
                    continue
                row["oracle_rows"] = len(opdf)
                row["rows_match"] = len(spdf) == len(opdf)
                row["schema_match"] = sorted(opdf.columns) == sorted(
                    spdf.columns
                )
                # Canonicalize AFTER the cheap checks: this is the
                # driver's pandas path and raises on unhashable cells.
                row["hash_match"] = _hash_pdf(_canon_pdf(spdf)) == _hash_pdf(
                    _canon_pdf(opdf)
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
        _flush(flush_path, sf, results)
        if echo:
            print(
                f"{name:26s} {'ok' if ok else 'FAIL':4s} "
                f"rows={row.get('spark_rows')} {row['sec']}s",
                flush=True,
            )
    return results, bad


def _flush(flush_path: str | None, sf: str, results: dict) -> None:
    """Incremental write-through for LONG sweeps (sf1 takes hours):
    a cut-off run still leaves every completed row on disk, marked
    partial until the final write."""
    if not flush_path:
        return
    tmp = flush_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"sf_dir": sf, "partial": True, "results": results}, f, indent=1
        )
    os.replace(tmp, flush_path)


def main() -> int:
    args = list(sys.argv[1:])
    oracle_timeout = None
    if "--oracle-timeout" in args:
        i = args.index("--oracle-timeout")
        oracle_timeout = float(args[i + 1])
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    out_path = (
        args[1] if len(args) > 1
        else os.path.join(REPO, "CORRECTNESS_FULL.json")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "full-correctness", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    results, bad = run_sweep(
        spark, sf, oracle_timeout=oracle_timeout, flush_path=out_path
    )
    spark.stop()
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf, "results": results}, f, indent=1)
    n = len(results)
    n_to = sum(1 for r in results.values() if r.get("oracle_timeout"))
    extra = f" ({n_to} oracle-timeout, weaker stamp)" if n_to else ""
    print(f"\n{n - bad - n_to}/{n} green{extra} -> {out_path}")
    # exit 0 = all green; 2 = no fails but some oracles timed out
    # (weaker stamp present); 1 = at least one real fail.
    return 1 if bad else (2 if n_to else 0)


if __name__ == "__main__":
    sys.exit(main())
