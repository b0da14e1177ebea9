"""Consolidate every BENCH/multiexec_*.json into one distribution table.

For each artifact: the sequential (alternated-leg) raw pair efficiencies,
the best cross pair, per-leg throughputs, and — where the artifact carries
per-leg host-supply probes (sha256 + memcpy on the leg's own cores, sampled
immediately before the leg) — the probe-implied supply ratio. Emits the
markdown table embedded in BENCH/BASELINE.md plus a JSON summary.
"""

from __future__ import annotations

import glob
import json
import os
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH")


def pairs(d: dict) -> dict:
    lo = d["all_runs"]["1"]
    n_hi = max(int(k) for k in d["all_runs"])
    hi = d["all_runs"][str(n_hi)]
    seq = [round((h["events_per_sec"] / l["events_per_sec"]) / n_hi, 3)
           for l, h in zip(lo, hi) if l["events_per_sec"]]
    cross = [round((h["events_per_sec"] / l["events_per_sec"]) / n_hi, 3)
             for l in lo for h in hi if l["events_per_sec"]]
    probes = []
    for l, h in zip(lo, hi):
        pl, ph = l.get("host_supply_probe"), h.get("host_supply_probe")
        if pl and ph:
            probes.append(round(
                (ph["sha_iters_per_s_total"] / pl["sha_iters_per_s_total"])
                / n_hi, 3))
    return {
        "n_events": d["n_events"],
        "cpus_per_executor": lo[0]["cpus_per_executor"],
        "lo_eps": [round(r["events_per_sec"], 0) for r in lo],
        "hi_eps": [round(r["events_per_sec"], 0) for r in hi],
        "seq_pairs": seq,
        "best_cross": max(cross) if cross else None,
        "probe_supply_ratio": probes or None,
    }


def main() -> None:
    rows = {}
    for f in sorted(glob.glob(os.path.join(BENCH, "multiexec_*.json"))):
        try:
            rows[os.path.basename(f)] = pairs(json.load(open(f)))
        except Exception as exc:  # noqa: BLE001 - summarizer, keep going
            print(f"skip {f}: {exc}", file=sys.stderr)
    all_seq = sorted(e for r in rows.values() for e in r["seq_pairs"])
    summary = {
        "artifacts": rows,
        "all_sequential_pairs": all_seq,
        "best": max(all_seq) if all_seq else None,
        "median": all_seq[len(all_seq) // 2] if all_seq else None,
    }
    print("| artifact | cores/exec | events | 1-exec k-ev/s | 4-exec k-ev/s |"
          " raw pairs | best cross |")
    print("|---|---|---|---|---|---|---|")
    for name, r in rows.items():
        print(f"| `{name}` | {r['cpus_per_executor']} | "
              f"{r['n_events'] // 1_000_000}M | "
              f"{' / '.join(str(round(x / 1000, 1)) for x in r['lo_eps'])} | "
              f"{' / '.join(str(round(x / 1000, 1)) for x in r['hi_eps'])} | "
              f"{' / '.join(str(x) for x in r['seq_pairs'])} | "
              f"{r['best_cross']} |")
    print()
    print(json.dumps({k: v for k, v in summary.items() if k != "artifacts"}))
    with open(os.path.join(BENCH, "multiexec_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)


if __name__ == "__main__":
    main()
