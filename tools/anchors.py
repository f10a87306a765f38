#!/usr/bin/env python3
"""Machine-readable bench-anchor ledger (anchors.json).

BASELINE.md's prose tables made the >2x drift rule archaeology: every
adjudication hand-located a query's quiet-window anchor, its sweep
position, and the box condition when it was recorded. This ledger holds
all three per query, is UPDATED by the closeout ritual and CONSUMED by
tools/bench_compare.py (anchors.json is bench-artifact-compatible: it
carries top-level "queries" + "canary_sec", plus a per-query "meta"
side-table bench_compare uses for per-query canary normalization).

Format:
  {
    "kind": "anchors",
    "reference_canary_sec": <canary of the FIRST recording — the box unit>,
    "canary_sec": <canary of the latest update (compat: whole-file factor)>,
    "queries": {"q": sweep_sec, ...},
    "meta": {"q": {"recorded": "r15", "canary_sec": ..., "standalone_sec": ...}, ...}
  }

Usage:
  # merge a bench sweep's numbers (each query's sweep anchor + the
  # sweep's own canary stamped per query):
  python3 tools/anchors.py update anchors.json BENCH.json --round r15

  # record a standalone (best-of-N) anchor for one query:
  python3 tools/anchors.py standalone anchors.json q_bm25_maintain_stream 4.21 --round r15

A contended sweep (canary > 1.25x the ledger's reference canary) is
refused without --force: anchors must be quiet-window numbers or they
stop meaning anything.
"""
import argparse
import json
import os
import sys


def load(path):
    if os.path.exists(path):
        return json.load(open(path))
    return {"kind": "anchors", "reference_canary_sec": None,
            "canary_sec": None, "queries": {}, "meta": {}}


def canary_of(d):
    vals = [d[k] for k in ("canary_sec", "canary_end_sec") if k in d and d[k]]
    return (sum(vals) / len(vals)) if vals else None


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    up = sub.add_parser("update")
    up.add_argument("anchors")
    up.add_argument("bench")
    up.add_argument("--round", required=True)
    up.add_argument("--force", action="store_true",
                    help="record even from a contended sweep (canary hot)")
    st = sub.add_parser("standalone")
    st.add_argument("anchors")
    st.add_argument("query")
    st.add_argument("sec", type=float)
    st.add_argument("--round", required=True)
    st.add_argument("--canary", type=float, default=None)
    args = ap.parse_args()

    a = load(args.anchors)
    if args.cmd == "update":
        b = json.load(open(args.bench))
        c = canary_of(b)
        if a["reference_canary_sec"] is None and c:
            a["reference_canary_sec"] = round(c, 3)
        if c and a["reference_canary_sec"] and c > 1.25 * a["reference_canary_sec"] \
                and not args.force:
            print(f"REFUSED: sweep canary {c:.3f}s is {c / a['reference_canary_sec']:.2f}x the "
                  f"ledger's reference {a['reference_canary_sec']:.3f}s — contended window; "
                  "anchors must be quiet numbers (--force to override)", file=sys.stderr)
            sys.exit(1)
        for q, sec in b["queries"].items():
            a["queries"][q] = sec
            m = a["meta"].setdefault(q, {})
            m["recorded"] = args.round
            if c:
                m["canary_sec"] = round(c, 3)
        if c:
            a["canary_sec"] = round(c, 3)
        print(f"anchored {len(b['queries'])} sweep entries from {args.bench} "
              f"(canary {c and round(c, 3)})")
    else:
        m = a["meta"].setdefault(args.query, {})
        m["standalone_sec"] = args.sec
        m["standalone_recorded"] = getattr(args, "round")
        if args.canary is not None:
            m["standalone_canary_sec"] = args.canary
        print(f"standalone anchor {args.query} = {args.sec}s ({getattr(args, 'round')})")

    json.dump(a, open(args.anchors, "w"), indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
