#!/usr/bin/env python3
"""Mechanical bench-noise discrimination (r16 verdict task 5).

Per-query bench times swing ±20-35% with host load, and until now each
round's swings had to be argued away by hand. This tool makes the noise
claim mechanical: it compares a bench run's per-query seconds against
the MEDIAN of the same query over the last `--window` (default 3)
historical runs at the SAME sf, and prints every query outside
±`--band` (default 35%) of that median — subject to an absolute floor
(default 0.1 s) so a 0.05->0.08 s jitter on a trivial query is not
"out of band".

History sources, newest first:
  1. bench_history/*.json — FULL bench lines persisted by graft.Bench
     itself on every run (all queries);
  2. BENCH_r*.json — the driver's per-round snapshots, which keep only
     a 2000-char TAIL of the line (the alphabetical tail of the query
     list; partial but better than nothing for old rounds).

Usage:
  python3 tools/bench_band.py                      # newest history entry vs its predecessors
  python3 tools/bench_band.py target/bench.json    # a fresh bench line vs history
  python3 tools/bench_band.py --strict ...         # exit 1 if anything is out of band

Exit code is 0 unless --strict: the report is information for a human
(or a verdict) to read, not a gate — a genuinely faster query would
otherwise go red.
"""
import argparse
import glob
import json
import os
import re
import statistics
import sys

QUERY_RE = re.compile(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)')


def norm_sf(sf):
    """'/root/testdata/sf0.1' -> '0.1'; 0.1 -> '0.1'."""
    m = re.search(r"sf([0-9.]+)", str(sf))
    return m.group(1) if m else str(sf)


def parse_line(text):
    """(queries dict, sf) from a full bench JSON line."""
    line = [l for l in text.splitlines() if '"queries"' in l][-1]
    d = json.loads(line[line.index('{'):])
    return d.get("queries", {}), norm_sf(d.get("sf", ""))


def parse_tail(d):
    """(partial queries dict, sf) from a driver BENCH_rN.json tail."""
    tail = d.get("tail", "")
    qpart = tail.split('"queries":')[-1]
    qs = {k: float(v) for k, v in QUERY_RE.findall(qpart)
          if k not in ("value", "total_sec", "sf")}
    # drop the (possibly truncated) FIRST pair: its leading digits may
    # have been cut off mid-number by the 2000-char window
    m = QUERY_RE.search(qpart)
    if m and qpart[:m.start()].strip(' {"') == "" and not qpart.startswith('{"' + m.group(1)):
        qs.pop(m.group(1), None)
    return qs, norm_sf(d.get("sf", ""))


def history_entries():
    """[(label, queries, sf, full?)] newest LAST."""
    out = []
    for p in sorted(glob.glob("BENCH_r*.json"),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1))):
        try:
            qs, sf = parse_tail(json.load(open(p)))
            if qs:
                out.append((p, qs, sf, False))
        except Exception:
            pass
    for p in sorted(glob.glob("bench_history/*.json"), key=os.path.getmtime):
        try:
            qs, sf = parse_line(open(p).read())
            if qs:
                out.append((p, qs, sf, True))
        except Exception:
            pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", nargs="?", default=None,
                    help="bench JSON line file (default: newest history entry)")
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--band", type=float, default=0.35)
    ap.add_argument("--floor", type=float, default=0.1,
                    help="ignore absolute deltas below this many seconds")
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    hist = history_entries()
    if args.bench is not None:
        # accept either a full bench line or a driver BENCH_rN tail file
        try:
            cur, cur_sf = parse_line(open(args.bench).read())
        except (IndexError, ValueError):
            try:
                cur, cur_sf = parse_tail(json.load(open(args.bench)))
            except Exception as e:
                print(f"bench_band: cannot parse {args.bench}: {e}")
                return 0
        if not cur:
            print(f"bench_band: no per-query data in {args.bench}")
            return 0
        label = args.bench
    else:
        if not hist:
            print("bench_band: no bench history found; nothing to compare")
            return 0
        label, cur, cur_sf, _ = hist[-1]
        hist = hist[:-1]

    window = []
    for p, qs, sf, full in reversed(hist):
        if sf == cur_sf and p != label:
            window.append((p, qs))
        if len(window) == args.window:
            break
    window.reverse()
    if not window:
        print(f"bench_band: no history at sf {cur_sf} to compare {label} against")
        return 0

    print(f"bench_band: {label} ({len(cur)} queries) vs per-query median of "
          f"{[p for p, _ in window]} (band ±{args.band:.0%}, floor {args.floor}s)")
    out_of_band, no_history = [], 0
    for q, t in sorted(cur.items()):
        vals = [h[q] for _, h in window if q in h]
        if not vals:
            no_history += 1
            continue
        med = statistics.median(vals)
        if abs(t - med) < args.floor:
            continue
        ratio = t / med if med > 0 else float("inf")
        if ratio > 1 + args.band or ratio < 1 - args.band:
            out_of_band.append((q, t, med, ratio))
    for q, t, med, ratio in sorted(out_of_band, key=lambda x: -abs(x[3] - 1)):
        print(f"  OUT-OF-BAND {q}: {t:.2f}s vs median {med:.2f}s ({ratio:.2f}x)")
    if not out_of_band:
        print("  all compared queries inside the band")
    if no_history:
        print(f"  {no_history} queries had no history in the window "
              "(new, or outside the driver-snapshot tails)")
    return 1 if (args.strict and out_of_band) else 0


if __name__ == "__main__":
    sys.exit(main())
