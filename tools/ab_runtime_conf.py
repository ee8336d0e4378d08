#!/usr/bin/env python3
"""Interleaved A/B of RUNTIME SQL confs over catalog queries.

The sandbox boxes suffer host-level memory-bandwidth throttling on
30-90 min scales (OPTIMIZATION_r11.md session 2), so sequential
baseline-then-variant timing is untrustworthy. This harness runs ONE
session and alternates variant conf-sets rep by rep (base, var, base,
var, ...), so both variants sample the same throttle windows; the
per-variant medians are then comparable.

Usage:
  python tools/ab_runtime_conf.py q1 [q2 ...] --conf k=v [--conf k=v]
      [--reps N] [--sf DIR] [--noop]

Only works for confs settable via spark.conf.set after session start
(join strategy prefs, AQE knobs, Arrow batch sizing). Static confs
(codec, local.dir) need separate-session A/Bs.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from news_clustering_and_summarization_spark.plans import catalog  # noqa: E402
from news_clustering_and_summarization_spark.session import (  # noqa: E402
    auto_driver_mem,
    get_spark,
)


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    noop = False
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    confs: dict[str, str] = {}
    while "--conf" in args:
        i = args.index("--conf")
        k, v = args[i + 1].split("=", 1)
        confs[k] = v
        del args[i: i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i: i + 2]
    if "--noop" in args:
        noop = True
        args.remove("--noop")
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i: i + 2]
    names = args
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    os.environ.setdefault("SPARK_DRIVER_MEM", auto_driver_mem(sf, cpus))
    spark = get_spark(
        "ab-runtime-conf", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    base = {k: spark.conf.get(k, None) for k in confs}

    def run_once(name: str) -> float:
        # time construction + action, like bench.py: eager
        # localCheckpoints at construction ARE the heavy legs of
        # several flagship queries
        t0 = time.time()
        df = catalog.QUERIES[name](spark, sf)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return time.time() - t0

    def set_confs(vals: dict[str, str | None]) -> None:
        for k, v in vals.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # one discarded warm-up per query under the BASE confs
    for n in names:
        run_once(n)

    # base/var back-to-back PER QUERY (seconds apart, not minutes):
    # the host throttle moves on minute scales, so the paired ratio
    # var/base of adjacent runs is robust to it even when absolute
    # times are not; alternate which variant goes first per rep so a
    # monotone drift cannot bias one side.
    times: dict[tuple[str, str], list[float]] = {}
    ratios: dict[str, list[float]] = {}
    for rep in range(reps):
        order = (
            (("base", base), ("var", confs))
            if rep % 2 == 0
            else (("var", confs), ("base", base))
        )
        for n in names:
            pair: dict[str, float] = {}
            for variant, vals in order:
                set_confs(vals)
                dt = run_once(n)
                pair[variant] = dt
                times.setdefault((n, variant), []).append(dt)
                print(
                    f"rep{rep} {variant:4} {n:24} {dt:7.3f}s", flush=True
                )
            ratios.setdefault(n, []).append(pair["var"] / pair["base"])
    set_confs(base)
    print("\n== medians (paired ratio = median over per-rep var/base) ==")
    tot = {"base": 0.0, "var": 0.0}
    for n in names:
        b = statistics.median(times[(n, "base")])
        v = statistics.median(times[(n, "var")])
        tot["base"] += b
        tot["var"] += v
        r = statistics.median(ratios[n])
        print(
            f"{n:24} base {b:7.3f}  var {v:7.3f}  paired-ratio {r:5.2f}"
        )
    print(
        f"{'TOTAL':24} base {tot['base']:7.3f}  var {tot['var']:7.3f}"
        f"  ratio {tot['var'] / tot['base']:5.2f}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
