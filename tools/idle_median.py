#!/usr/bin/env python3
"""Idle-median regression ratchet (VERDICT r15 ask #1, ADVICE r15).

The driver gate compares one co-tenant draw against 2x the LOADED-MAX
pins in BASELINE_BENCH.json — deliberately loose, so environment noise
cannot flag unchanged plans. The cost of that looseness: a query could
genuinely double from its idle cost and still pass. This tool keeps a
second, INFORMATIONAL per-query table of idle medians so real plan
regressions cannot hide inside the widened band. The driver gate is
unchanged; this is the builder-side alarm.

Usage:
  python3 tools/idle_median.py update run1.json run2.json [run3.json ...]
    -> reads per-query seconds from N idle full-sweep BENCH_OUT files,
       computes the per-query median, compares against the medians
       recorded in IDLE_MEDIAN.json (if present), prints an alarm list
       of queries whose idle median grew > ALARM_RATIO round-over-round
       (new queries are recorded, never alarmed), then rewrites
       IDLE_MEDIAN.json with the fresh medians + the alarm list.

Exit code 1 if the alarm list is non-empty — a reminder to either fix
the plan or justify the growth in PERF_NOTES before the round closes.
Unlike the loaded pins, medians here are NOT floored at previous
values: the ratchet tightens when the suite genuinely gets faster.

Dev-side tool (driver python env); not part of the engine.
"""
import json
import statistics
import sys

ALARM_RATIO = 1.5
# queries under this idle cost are scheduler-noise-floor dominated
# (~0.3 s constant overhead); ratio alarms on them are meaningless
MIN_ALARM_SEC = 0.5


def main():
    assert sys.argv[1] == "update", "usage: idle_median.py update run*.json"
    runs = [json.load(open(p))["queries"] for p in sys.argv[2:]]
    assert len(runs) >= 2, "need >= 2 idle sweeps for a stable median"
    names = sorted(set().union(*[set(r) for r in runs]))
    medians = {}
    for q in names:
        vals = [r[q] for r in runs if q in r and r[q] > 0]
        if vals:
            medians[q] = round(statistics.median(vals), 3)
    try:
        prev = json.load(open("IDLE_MEDIAN.json"))["queries"]
    except FileNotFoundError:
        prev = {}
    alarms = []
    for q, m in sorted(medians.items()):
        p = prev.get(q)
        if p and p >= MIN_ALARM_SEC and m > p * ALARM_RATIO:
            alarms.append({"query": q, "prev_median": p, "median": m,
                           "ratio": round(m / p, 2)})
    doc = {
        "note": ("per-query sf0.1 seconds: MEDIAN of idle full sweeps "
                 "(no background load, local[32], min-of-2 per query, "
                 "noop eval). Informational regression ratchet beside "
                 "the loaded-max driver pins: alarms on >"
                 f"{ALARM_RATIO}x idle-median growth round-over-round "
                 f"for queries >= {MIN_ALARM_SEC}s. NOT floored at "
                 "previous values - tightens when the suite gets "
                 "faster. Not a driver gate."),
        "n_sweeps": len(runs),
        "alarms": alarms,
        "queries": medians,
    }
    json.dump(doc, open("IDLE_MEDIAN.json", "w"), indent=1)
    up = sum(1 for q in medians if q in prev and medians[q] > prev[q])
    down = sum(1 for q in medians if q in prev and medians[q] < prev[q])
    print(f"{len(medians)} medians ({up} up, {down} down, "
          f"{len(medians) - len([q for q in medians if q in prev])} new)")
    if alarms:
        print(f"ALARM: {len(alarms)} queries grew >{ALARM_RATIO}x idle:")
        for a in alarms:
            print(f"  {a['query']}: {a['prev_median']}s -> "
                  f"{a['median']}s ({a['ratio']}x)")
        sys.exit(1)
    print("no idle-median alarms")


if __name__ == "__main__":
    main()
