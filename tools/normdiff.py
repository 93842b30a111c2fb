#!/usr/bin/env python3
"""Mops-normalized cross-round bench comparison (dev tooling).

Usage: python3 tools/normdiff.py OLD.json NEW.json [topN] [--allow-raw]

Joins two bench artifacts on query name and compares NORMALIZED walls:
each side's wall is scaled by its own recorded host calibration
(host_mops_<n>t, the all-core integer-mix throughput measured at run
time) against the shared reference (ref_mops when recorded, else
15500.0 — the round-15 quiet baseline host). This removes
hypervisor-delivery swings from regression triage: a uniform 1.3x wall
drift with matching calibration ratios is host, not plan.

Handles BOTH artifact shapes:
  - Bench lines (BENCH_LOCAL.json / BENCH_r*.json): queries = {name: sec}
  - BenchScale lines (BENCH_SCALE*.json, metric "scale_x<N>"):
    queries = {name: {"sec": s, "shuffle_records": r, ...}} — compared
    on raw "sec" normalized by the artifact's own calibration bracket,
    with shuffle-record deltas printed alongside (records are
    host-independent: a record regression IS a plan regression).

If either side lacks a calibration the comparison would silently mix a
normalized side with a raw one (20-30% skew at observed 0.8x-class
factors), so the tool EXITS unless --allow-raw is passed — which then
compares raw walls and says so.

Prints the common-query normalized totals and the topN largest
normalized regressions/improvements.
"""
import json
import re
import sys

REF_DEFAULT = 15500.0


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # artifacts are one JSON object per line; take the first parseable
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no JSON object found in {path}")


def calib(d):
    # the ALL-CORE throughput (largest thread count present — never the
    # 1t probe); prefer the start/end mean when both are present
    keys = [k for k in d if re.fullmatch(r"host_mops_\d+t", k)]
    if not keys:
        return None
    key = max(keys, key=lambda k: int(re.findall(r"\d+", k)[0]))
    start = d[key]
    end = d.get(key + "_end")
    vals = [v for v in (start, end) if isinstance(v, (int, float)) and v > 0]
    return sum(vals) / len(vals) if vals else None


def queries_of(d):
    """(name -> wall sec, name -> shuffle records or None)."""
    qs = d.get("queries", {})
    walls, recs = {}, {}
    for k, v in qs.items():
        if isinstance(v, dict):  # BenchScale per-case object
            if isinstance(v.get("sec"), (int, float)):
                walls[k] = v["sec"]
                recs[k] = v.get("shuffle_records")
        elif isinstance(v, (int, float)):
            walls[k] = v
    return walls, recs


def main():
    args = [a for a in sys.argv[1:] if a != "--allow-raw"]
    allow_raw = "--allow-raw" in sys.argv
    old, new = load(args[0]), load(args[1])
    top_n = int(args[2]) if len(args) > 2 else 15
    ref = new.get("ref_mops") or old.get("ref_mops") or REF_DEFAULT
    co, cn = calib(old), calib(new)
    if (co is None or cn is None) and not allow_raw:
        missing = [p for p, c in ((args[0], co), (args[1], cn)) if c is None]
        raise SystemExit(
            "ERROR: no host calibration (host_mops_<n>t) in: "
            + ", ".join(missing)
            + "\nA raw-vs-normalized comparison skews ratios 20-30% at "
            "observed delivery factors.\nPass --allow-raw to compare raw "
            "walls anyway (both sides unnormalized).")
    if allow_raw and (co is None or cn is None):
        co = cn = None
        print("WARNING: comparing RAW walls (no calibration on one or "
              "both sides) — host delivery swings are NOT removed")
    fo = (co / ref) if co else 1.0
    fn = (cn / ref) if cn else 1.0
    print(f"ref_mops={ref:.0f}  old calib={co and round(co)} "
          f"(factor {fo:.3f})  new calib={cn and round(cn)} "
          f"(factor {fn:.3f})")
    qo, ro = queries_of(old)
    qn, rn_ = queries_of(new)
    common = sorted(k for k in qo.keys() & qn.keys()
                    if qo[k] >= 0 and qn[k] >= 0)
    if not common:
        raise SystemExit("no common queries")
    rows = []
    for k in common:
        no, nn = qo[k] * fo, qn[k] * fn
        rows.append((k, qo[k], qn[k], no, nn, nn / no if no > 0 else 0.0))
    so, sn = sum(r[3] for r in rows), sum(r[4] for r in rows)
    print(f"common queries: {len(common)}  normalized total "
          f"{so:.1f}s -> {sn:.1f}s  ({sn / so:.3f}x)")
    # shuffle-record deltas (scale artifacts only): host-independent
    rec_moves = [(k, ro[k], rn_[k]) for k in common
                 if ro.get(k) is not None and rn_.get(k) is not None
                 and ro[k] != rn_[k]]
    if rec_moves:
        print("\nshuffle-record changes (host-independent — a record "
              "move IS a plan move):")
        for k, a, b in sorted(rec_moves,
                              key=lambda x: -abs(x[2] - x[1]))[:top_n]:
            print(f"  {k:34s} {a:>14,d} -> {b:>14,d}  "
                  f"({b / a if a else float('inf'):5.2f}x)")
    rows.sort(key=lambda r: -r[5])
    print(f"\ntop {top_n} normalized regressions (raw old/new -> "
          "norm old/new, ratio):")
    for k, ro2, rn2, no, nn, ratio in rows[:top_n]:
        print(f"  {k:34s} {ro2:7.2f}/{rn2:7.2f} -> {no:7.2f}/{nn:7.2f}  "
              f"{ratio:5.2f}x")
    print(f"\ntop {top_n} normalized improvements:")
    for k, ro2, rn2, no, nn, ratio in rows[-top_n:][::-1]:
        print(f"  {k:34s} {ro2:7.2f}/{rn2:7.2f} -> {no:7.2f}/{nn:7.2f}  "
              f"{ratio:5.2f}x")


if __name__ == "__main__":
    main()
