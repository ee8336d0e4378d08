#!/usr/bin/env python3
"""Unify the flagship's scale evidence into one artifact (r09 verdict
item 7): SCALE_REHEARSAL.json carries the catalog-variant rows the
rehearsal harness can run, plus the PRODUCTION auto-sized rows from
the probe artifacts for the tiers where the pinned-oracle catalog
variant is deliberately not runnable.

Why the pinned variants stop at sf1: the catalog cluster_lsh pins
nbits=18 so DuckDB can replay it — at 5M vectors that is 19 rows per
bucket x 172 probe masks, quadratic BY CONSTRUCTION (the r09 probe's
whole point). The production path (signlsh_params auto-sizing / the
IVF index) is what a deployment runs at that scale, so its probe
rows ARE the sf10 story — this script folds them in as explicitly
labeled `production_probe` entries so one artifact tells it.

Usage: python tools/merge_rehearsal.py [base_json] [out_json]
  (reads LSH_SCALE_PROBE.json + IVF_SCALE_PROBE.json from the repo
  root; base defaults to SCALE_REHEARSAL_r09.json)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    base_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "SCALE_REHEARSAL_r09.json")
    )
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "SCALE_REHEARSAL.json")
    )
    with open(base_path) as f:
        base = json.load(f)
    results = base["results"]
    for probe_file, key in [
        ("LSH_SCALE_PROBE.json", "cluster_lsh_production_autosized"),
        ("IVF_SCALE_PROBE.json", "cluster_ivf_production"),
    ]:
        path = os.path.join(REPO, probe_file)
        if not os.path.exists(path):
            print(f"missing {probe_file}, skipped")
            continue
        with open(path) as f:
            probe = json.load(f)
        row: dict = {"source": probe_file}
        for label, r in probe["results"].items():
            row[label] = {
                "wall_sec": r["wall_sec"],
                "shuffle_mb": r["shuffle_mb"],
                "rows": r["eps_pairs"],
            }
            for extra in ("sampled_recall", "nbits", "n_tables",
                          "nprobe", "probe_radius"):
                if extra in r:
                    row[label][extra] = r[extra]
            if "shuffle_ratio_vs_sf0.1" in r:
                row[f"shuffle_ratio_{label}"] = r["shuffle_ratio_vs_sf0.1"]
                row[f"wall_ratio_{label}"] = r["wall_ratio_vs_sf0.1"]
        results[key] = row
    notes = base.setdefault("notes", [])
    notes.append(
        "flagship unification (r10): cluster_lsh / cluster_lsh_verify "
        "/ dbscan_full stop at sf1 because the catalog variants pin "
        "parameters for DuckDB oracle replay (quadratic by "
        "construction past their tier); the *_production rows fold "
        "in the auto-sized probe runs (LSH_SCALE_PROBE / "
        "IVF_SCALE_PROBE, identical 25x-inflated corpus and eps) so "
        "this artifact carries the full-decade story for the "
        "flagship similarity join."
    )
    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"-> {out_path} ({len(results)} result families)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
