#!/usr/bin/env python3
"""Merge several BENCH_FULL.json dumps into one per-query-MIN record.

The committed BENCH_FULL.json is the min over N full bench runs (the
round-record protocol): per-query batch minima, per-stream minima, total
recomputed as the sum of the query minima. Metadata (loadavg, sf, calib)
comes from the LAST run, with the per-run totals recorded alongside so
the record states its own provenance.

Usage: min_merge_bench.py run1.json run2.json [...] > BENCH_FULL.json
"""
import json
import sys


def main(paths):
    runs = [json.load(open(p)) for p in paths]
    base = dict(runs[-1])
    qs = {}
    for q in runs[0]["queries"]:
        vals = [r["queries"][q] for r in runs if q in r.get("queries", {})]
        qs[q] = min(vals)
    base["queries"] = qs
    if all("streams" in r for r in runs):
        base["streams"] = {
            q: min(r["streams"][q] for r in runs if q in r["streams"])
            for q in runs[0].get("streams", {})
        }
    base["value"] = round(sum(qs.values()), 3)
    base["record"] = {
        "protocol": f"per-query MIN over {len(runs)} full Bench runs",
        "run_totals": [round(r["value"], 2) for r in runs],
        "run_loads": [r.get("loadavg") for r in runs],
    }
    json.dump(base, sys.stdout)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main(sys.argv[1:])
