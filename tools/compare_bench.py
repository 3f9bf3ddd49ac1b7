#!/usr/bin/env python3
"""Round-over-round bench comparison (driver-side dev aid, not shipped).

Usage:
  python3 tools/compare_bench.py <prev.json> <new.json> \
      <prev_names.txt> <new_names.txt> [threshold]

Each run's `qds` lists deciseconds for its catalog's SORTED query
names; the name files carry one name per line for the matching run.
Reconstructs per-query seconds, normalizes by the calib_cpu ratio,
prints the common-row normalized total and movers beyond the
threshold (default 1.35x).
"""
import json, sys


def load(path):
    d = json.load(open(path))
    if "parsed" in d:
        d = d["parsed"]
    return d


def qmap(run, names_path):
    names = sorted(l.strip() for l in open(names_path) if l.strip())
    ds = [int(x) for x in run["qds"].split(",")]
    assert len(names) == len(ds), (len(names), len(ds))
    return dict(zip(names, ds))


def main(prev_path, new_path, prev_names, new_names, threshold=1.35):
    prev, new = load(prev_path), load(new_path)
    pm, nm = qmap(prev, prev_names), qmap(new, new_names)
    ratio_cal = new["calib_cpu"] / prev["calib_cpu"]
    print(f"calib_cpu {prev['calib_cpu']} -> {new['calib_cpu']} "
          f"(machine ratio {ratio_cal:.2f})")
    common = sorted(set(pm) & set(nm))
    added = sorted(set(nm) - set(pm))
    tot_p = sum(pm[n] for n in common)
    tot_n = sum(nm[n] for n in common)
    print(f"common rows {len(common)} (new rows: {added}): "
          f"raw {tot_p/10:.1f}s -> {tot_n/10:.1f}s; "
          f"normalized x{(tot_n/ratio_cal)/max(tot_p,1):.3f}")
    movers = []
    for n in common:
        p, q = max(pm[n], 1), max(nm[n], 1)
        r = (q / ratio_cal) / p
        if (r >= threshold or r <= 1 / threshold) and max(p, q) >= 10:
            movers.append((r, n, p / 10, q / 10))
    for r, n, p, q in sorted(movers, reverse=True):
        print(f"  {'UP ' if r > 1 else 'DOWN'} x{r:4.2f}  {n:40s} "
              f"{p:6.1f}s -> {q:6.1f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
         float(sys.argv[5]) if len(sys.argv) > 5 else 1.35)
