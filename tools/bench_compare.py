#!/usr/bin/env python3
"""Canary-normalized bench comparison (round-over-round adjudication).

The r13 close-out burned hours re-litigating box noise: a contended host
made six queries look >1.5x slower while a pure-CPU canary run beside the
sweep degraded by the same factor. Bench now brackets every sweep with
that canary (canary_sec at start, canary_end_sec at end); this script
folds it in so the compare ritual flags only ratios that survive
normalization by the box-speed ratio.

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
      [--min-sec 0.3] [--json OUT.json]

Exit code 1 when any normalized regression exceeds the threshold on a
query whose slower side is >= --min-sec (below that, JIT jitter dominates).
Artifacts without canary fields compare un-normalized (factor 1.0, noted).
"""
import argparse
import json
import sys


def canary_of(d):
    vals = [d[k] for k in ("canary_sec", "canary_end_sec") if k in d]
    return (sum(vals) / len(vals)) if vals else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.3)
    ap.add_argument("--json", help="write the machine-readable result here")
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    c_old, c_new = canary_of(old), canary_of(new)
    cfac = (c_new / c_old) if (c_old and c_new) else 1.0

    # anchors.json carries a per-query "meta" side-table with the canary
    # AT RECORD TIME — entries recorded in different rounds normalize by
    # their own box condition instead of one whole-file factor.
    meta = old.get("meta", {})
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for q in shared:
        o, n = old["queries"][q], new["queries"][q]
        raw = (n / o) if o > 0 else float("inf")
        c_old_q = meta.get(q, {}).get("canary_sec") or c_old
        cfac_q = (c_new / c_old_q) if (c_old_q and c_new) else 1.0
        norm = raw / cfac_q
        rows.append({"query": q, "old_sec": o, "new_sec": n,
                     "raw_ratio": round(raw, 3), "norm_ratio": round(norm, 3)})

    flagged = [r for r in rows
               if r["norm_ratio"] > args.threshold
               and max(r["old_sec"], r["new_sec"]) >= args.min_sec]
    tot_old = sum(old["queries"][q] for q in shared)
    tot_new = sum(new["queries"][q] for q in shared)
    result = {
        "shared_queries": len(shared),
        "only_old": sorted(set(old["queries"]) - set(new["queries"])),
        "only_new": sorted(set(new["queries"]) - set(old["queries"])),
        "total_old_sec": round(tot_old, 3),
        "total_new_sec": round(tot_new, 3),
        "raw_total_ratio": round(tot_new / tot_old, 4) if tot_old else None,
        "canary_old_sec": c_old, "canary_new_sec": c_new,
        "canary_factor": round(cfac, 4),
        "norm_total_ratio": round(tot_new / tot_old / cfac, 4) if tot_old else None,
        "threshold": args.threshold, "min_sec": args.min_sec,
        "flagged": sorted(flagged, key=lambda r: -r["norm_ratio"]),
    }
    if args.json:
        json.dump(result, open(args.json, "w"), indent=1)

    print(f"shared {len(shared)} queries | total {tot_old:.1f}s -> {tot_new:.1f}s "
          f"(raw {result['raw_total_ratio']}x, canary-normalized {result['norm_total_ratio']}x; "
          f"canary factor {cfac:.3f}{'' if c_old and c_new else ' — NO CANARY in one artifact, un-normalized'})")
    if result["only_new"]:
        print(f"new-only queries ({len(result['only_new'])}): {', '.join(result['only_new'][:8])}"
              + (" …" if len(result["only_new"]) > 8 else ""))
    if flagged:
        print(f"REGRESSIONS (> {args.threshold}x normalized, slower side >= {args.min_sec}s):")
        for r in result["flagged"]:
            print(f"  {r['query']:40s} {r['old_sec']:7.2f}s -> {r['new_sec']:7.2f}s "
                  f"raw {r['raw_ratio']}x norm {r['norm_ratio']}x")
        sys.exit(1)
    print("no normalized regressions above threshold")


if __name__ == "__main__":
    main()
