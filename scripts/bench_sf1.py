"""Scaling spot-check: the FULL bench headline at sf0.1 vs a 10x replica.

Round 5 measured the 5 heaviest entries; round 6 covers all headline
entries (judge item #6). For each entry the bench harness's isolated
per-query subprocess (warmup + min-of-3, bench.py) runs at sf0.1 and at
the make_sf1.py 10x dataset; the artifact records both timings, the
ratio, and a mechanism note for any entry whose ratio exceeds the 15x
sublinearity bar (10x data -> <=15x time allows linear growth plus
shuffle/log factors; anything above needs an explanation or a fix).

Usage: python scripts/bench_sf1.py [sf1_dir] [name ...]
Writes BENCH_sf1.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF01 = "/root/testdata/sf0.1"

#: Mechanism notes for entries that may legitimately exceed simple
#: linearity, plus context for the heavy ones. Recorded into the artifact.
NOTES = {
    "seasonal_decompose_events": (
        "densest per-key grids: grid explode + two off-center windows per "
        "key; parallelizes by user key, superlinear-looking constants come "
        "from window frame work per key growing with series length"),
    "minhash_neardup": (
        "banded bucket join; replicas' shingles are Caesar-disjoint so "
        "bucket sizes stay constant and candidate pairs scale linearly"),
    "triangle_count_parts": (
        "degree-ordered orientation bounds adjacency lists; replicas are "
        "disjoint co-order graphs so wedge counts scale linearly"),
    "pagerank_parts": (
        "fixed iteration count; per-iteration join+agg scales with edges"),
    "embedding_cosine_topk": (
        "brute-force linear scan + TakeOrderedAndProject; 10x rows = 10x "
        "scan"),
}


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    only = set(sys.argv[2:])
    names = [n for n in bench.HEADLINE if not only or n in only]

    entries: dict[str, dict] = {"sf0.1": {}, "sf1": {}}
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", sf1_dir)):
        for name in names:
            got = bench.time_isolated(name, sf_dir)
            if got is None:
                entries[sf_label][name] = None
                print(f"FAIL  {name} @ {sf_label}", flush=True)
                continue
            sec, runs = got
            entries[sf_label][name] = {"sec": sec, "runs": runs}
            print(f"{sf_label:6} {name}: {sec}s {runs}", flush=True)

    ratios = {}
    flagged = {}
    for name in names:
        a, b = entries["sf0.1"].get(name), entries["sf1"].get(name)
        if a and b:
            ratios[name] = round(b["sec"] / max(a["sec"], 1e-9), 2)
            if ratios[name] > 15.0:
                flagged[name] = NOTES.get(
                    name, "UNEXPLAINED — investigate before shipping")

    artifact = {
        "metric": "sf_scaling_spot_check",
        "n_entries": len(names),
        "data": "10 disjoint FK-consistent replicas of sf0.1 "
                "(scripts/make_sf1.py); dims region/nation unreplicated",
        "estimator": "min_of_steady_state_runs (bench.py isolation)",
        "bar": "ratio <= 15x at 10x data (linear + shuffle/log factors)",
        "entries": entries,
        "ratio_sf1_over_sf0.1": ratios,
        "over_bar": flagged,
        "notes": {k: v for k, v in NOTES.items() if k in names},
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_sf1.json")
    with open(out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out}")
    print(json.dumps({"ratios": ratios, "over_bar": flagged}))


if __name__ == "__main__":
    main()
