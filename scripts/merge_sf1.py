#!/usr/bin/env python3
"""Rebuild BENCH_SF1.json's full_bench section from two BENCH_FULL.json
dumps (one per scale): per-query exponents a = log10(t_sf1 / t_sf01),
batch totals, stream drains, max exponent and the superlinear list.

Usage: merge_sf1.py <bench_full_sf01.json> <bench_full_sf1.json>
Rewrites BENCH_SF1.json in place (other sections preserved).
"""
import json
import math
import sys


def main(p01, p1):
    a, b = json.load(open(p01)), json.load(open(p1))
    qs = {}
    for q in a["queries"]:
        if q in b["queries"] and a["queries"][q] > 0:
            qs[q] = {
                "sf0.1_sec": a["queries"][q],
                "sf1_sec": b["queries"][q],
                "exponent": round(math.log10(b["queries"][q] / a["queries"][q]), 3),
            }
    streams = {}
    for q in a.get("streams", {}):
        if q in b.get("streams", {}):
            streams[q] = {"sf0.1_sec": a["streams"][q], "sf1_sec": b["streams"][q]}
    doc = json.load(open("BENCH_SF1.json"))
    doc["full_bench"] = {
        "note": "complete Bench run at both scales (min-of-3 interleaved, "
                "one JVM per scale); streams are AvailableNow drains incl. "
                "micro-batch lifecycle",
        "batch_total": {"sf0.1": round(a["value"], 2), "sf1": round(b["value"], 2)},
        "queries": qs,
        "streams": streams,
        "max_exponent": max(v["exponent"] for v in qs.values()),
    }
    doc["max_exponent"] = doc["full_bench"]["max_exponent"]
    doc["superlinear"] = sorted(q for q, v in qs.items() if v["exponent"] > 1.0)
    json.dump(doc, open("BENCH_SF1.json", "w"), indent=1, sort_keys=True)
    worst = sorted(qs.items(), key=lambda kv: -kv[1]["exponent"])[:8]
    print("queries:", len(qs), "max exponent:", doc["max_exponent"])
    print("superlinear:", doc["superlinear"])
    for q, v in worst:
        print(f"  {q:24s} {v['sf0.1_sec']:7.3f} -> {v['sf1_sec']:7.3f}  a={v['exponent']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
