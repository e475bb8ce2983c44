"""Compare two bench records on their shared headline entries.

Usage: python scripts/bench_compare.py OLD.json NEW.json

Prints total/median per-entry ratios and, when both records carry the
round-12 ``calibration_sec`` pure-CPU probe, the CALIBRATED ratio
(query ratio divided by the probe ratio) — the one-line machine-weather
deconvolution VERDICT r11 asked for. Reads the LAST line of each file
that parses as the metrics record (bench.py emits spread + metrics
lines).
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    """Accept bench.py's line format, the driver's wrapper (the metrics
    record under "parsed"), or a bare metrics object."""
    rec = None
    with open(path) as fh:
        text = fh.read()
    try:
        whole = json.loads(text)
        if isinstance(whole, dict):
            if "queries" in whole:
                rec = whole
            elif isinstance(whole.get("parsed"), dict) \
                    and "queries" in whole["parsed"]:
                rec = whole["parsed"]
    except json.JSONDecodeError:
        pass
    if rec is None:
        for line in text.splitlines():
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "queries" in obj:
                rec = obj
    if rec is None:
        raise SystemExit(f"no metrics record in {path}")
    return rec


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    shared = [n for n, v in old["queries"].items()
              if v is not None and new["queries"].get(n) is not None]
    o_total = sum(old["queries"][n] for n in shared)
    n_total = sum(new["queries"][n] for n in shared)
    ratios = {n: new["queries"][n] / max(old["queries"][n], 1e-9)
              for n in shared}
    out = {
        "n_shared": len(shared),
        "old_total_sec": round(o_total, 2),
        "new_total_sec": round(n_total, 2),
        "total_ratio": round(n_total / max(o_total, 1e-9), 3),
        "median_entry_ratio": round(statistics.median(ratios.values()), 3),
        "worst_entries": dict(sorted(ratios.items(),
                                     key=lambda kv: -kv[1])[:5]),
    }
    oc, nc = old.get("calibration_sec"), new.get("calibration_sec")
    if oc and nc:
        probe = nc / oc
        out["calibration_probe_ratio"] = round(probe, 3)
        out["calibrated_total_ratio"] = round(out["total_ratio"] / probe, 3)
        out["calibrated_median_ratio"] = round(
            out["median_entry_ratio"] / probe, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
