"""Summarize results/protocol_parity.jsonl into the BASELINE.md table.

Per model: per-head mean AUC over seeds for both sides, delta of means,
seed-variance band (max of the two sides' sample std, floored at 0.005 =
half a 4th-decimal AUC point, the protocol's own rounding granularity),
and the in-band verdict.  Later rows for the same (model, seed) key win
(re-runs after fixes).

Usage: python benchmarks/protocol_parity_summary.py [results/protocol_parity.jsonl]
"""

from __future__ import annotations

import collections
import json
import sys

import numpy as np

BAND_FLOOR = 0.005


def main(path: str = "results/protocol_parity.jsonl") -> None:
    rows = [json.loads(l) for l in open(path)]
    by_model: dict = collections.defaultdict(dict)
    errors = []
    for r in rows:
        by_model[r["model"]][r["seed"]] = r
        if r.get("ref_error") or r.get("our_error"):
            errors.append((r["key"], r.get("ref_error"), r.get("our_error")))
    print("| model | seeds | ref AUC (t1/t2) | ours AUC (t1/t2) | Δmean | band (max σ) | in-band |")
    print("|---|---|---|---|---|---|---|")
    all_ok = True
    for m in sorted(by_model):
        rs = [r for r in by_model[m].values() if r["reference"] and r["ours"]]
        ref = np.array([r["reference"] for r in rs])
        ours = np.array([r["ours"] for r in rs])
        d = ours.mean(0) - ref.mean(0)
        band = np.maximum(ref.std(0, ddof=1), ours.std(0, ddof=1))
        ok = bool(np.all(np.abs(d) <= np.maximum(band, BAND_FLOOR)))
        all_ok &= ok
        print(
            f"| {m} | {len(rs)} "
            f"| {ref.mean(0)[0]:.4f} / {ref.mean(0)[1]:.4f} "
            f"| {ours.mean(0)[0]:.4f} / {ours.mean(0)[1]:.4f} "
            f"| {d[0]:+.4f} / {d[1]:+.4f} "
            f"| {band[0]:.4f} / {band[1]:.4f} | {'yes' if ok else 'NO'} |"
        )
    if errors:
        print("\nsuperseded error rows (later same-key rows win):", errors)
    print(f"\nall in-band: {all_ok}")


if __name__ == "__main__":
    main(*sys.argv[1:])
