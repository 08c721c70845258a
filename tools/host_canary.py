"""30-second host-health canary for bench adjudication (round 12).

Round 12 found the box's Spark throughput degraded 1.4-4x vs the r11
record on IDENTICAL code (controlled via a git-archive checkout of the
r11 tree) while raw CPU/disk/frequency probed normal — i.e. host-side
contention invisible to guest load averages. Every bench artifact
recorded under such a host is noise. This canary answers "can a bench
number recorded right now be compared against prior rounds?" in ~30 s:

- two COLD single-shot reference keys in a fresh session, against
  their BENCH_FULL_r11.json walls (q_text_tfidf 0.646 s, q_tpch_q5
  0.737 s);
- the start load triple (the stamp that adjudicates guest-side load);
- a HEALTHY verdict only when both keys land within ~2.5x of record
  (provisional — see the calibration note at _REFS).

Usage: python tools/host_canary.py
Prints one JSON line; exit 0 if healthy, 1 if degraded (so shell
loops can `until python tools/host_canary.py; do sleep 600; done`).

The thresholds are deliberately coarse (cold single-shots carry
±20-30% even on a quiet box); a healthy verdict clears the way for a
bench/bench_full run, an unhealthy one means only fully-warmed
shared-session best-of-N per-key measurements are citable (the
standing SCALING.md rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# PROVISIONAL calibration (r12): both refs are the keys' walls in
# BENCH_FULL_r11.json (healthy-host cold sweep — q_text_tfidf 0.646,
# q_tpch_q5 0.737), but the canary runs a FRESH session with one
# warmup, which costs extra codegen/compile on a healthy host too.
# Tolerance 2.5 absorbs that context gap while every r12-observed
# degraded reading (tfidf 2.2-3.4 s, q5 1.9-2.9 s — all > 2.5x these
# refs) still reads unhealthy. On the first session where the canary
# reads healthy, re-measure the refs with THIS protocol and tighten
# the tolerance back toward 1.5.
_REFS = {"q_text_tfidf": 0.646, "q_tpch_q5": 0.737}
_TOL = 2.5


def main() -> int:
    load_start = (
        [round(x, 2) for x in os.getloadavg()]
        if hasattr(os, "getloadavg") else None
    )
    from engine.registry import all_queries
    from engine.session import get_spark

    spark = get_spark("host-canary")
    qs = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # one warmup so the canary measures plans, not JVM/codegen startup
    qs["q_agg_group"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls = {}
    for key in _REFS:
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[key] = round(time.perf_counter() - t0, 2)
    healthy = all(walls[k] <= _REFS[k] * _TOL for k in _REFS)
    print(json.dumps({
        "healthy": healthy,
        "walls": walls,
        "refs": _REFS,
        "tolerance": _TOL,
        "load_avg_start": load_start,
        "sf_dir": sf_dir,
    }))
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
