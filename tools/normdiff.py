#!/usr/bin/env python3
"""Mops-normalized cross-round bench comparison (dev tooling).

Usage: python3 tools/normdiff.py OLD.json NEW.json [topN]

Joins two Bench artifacts (BENCH_LOCAL.json / BENCH_r*.json lines) on
query name and compares NORMALIZED walls: each side's wall is scaled by
its own recorded host calibration (host_mops_<n>t, the all-core
integer-mix throughput measured at run time) against the shared
reference (ref_mops when recorded, else 15500.0 — the round-15 quiet
baseline host). This removes hypervisor-delivery swings from regression
triage: a uniform 1.3x wall drift with matching calibration ratios is
host, not plan.

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


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    ref = new.get("ref_mops") or old.get("ref_mops") or REF_DEFAULT
    co, cn = calib(old), calib(new)
    fo = (co / ref) if co else 1.0
    fn = (cn / ref) if cn else 1.0
    print(f"ref_mops={ref:.0f}  old calib={co and round(co)} "
          f"(factor {fo:.3f})  new calib={cn and round(cn)} "
          f"(factor {fn:.3f})")
    qo, qn = old.get("queries", {}), new.get("queries", {})
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
    rows.sort(key=lambda r: -r[5])
    print(f"\ntop {top_n} normalized regressions (raw old/new -> "
          "norm old/new, ratio):")
    for k, ro, rn, no, nn, ratio in rows[:top_n]:
        print(f"  {k:34s} {ro:7.2f}/{rn:7.2f} -> {no:7.2f}/{nn:7.2f}  "
              f"{ratio:5.2f}x")
    print(f"\ntop {top_n} normalized improvements:")
    for k, ro, rn, no, nn, ratio in rows[-top_n:][::-1]:
        print(f"  {k:34s} {ro:7.2f}/{rn:7.2f} -> {no:7.2f}/{nn:7.2f}  "
              f"{ratio:5.2f}x")


if __name__ == "__main__":
    main()
