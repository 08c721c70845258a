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
- a WARM leg (r13): each key re-run twice, min vs _WARM_REFS — the
  r12/r13 host pathology was measured as a first-execution/startup
  tax with steady state at record (ROUND13_NOTES §5b), so
  `healthy=false, warm_healthy=true` means "cold numbers not
  comparable, warm-protocol evidence citable", while
  `warm_healthy=false` flags a likely real throughput loss (the
  warm refs were taken on the degraded host — see the _WARM_REFS
  caveat — so the inverse reading is the weaker one: warm_healthy=
  true does not rule out a 2-4x warm loss until the refs are
  re-anchored on a healthy box);
- the start load triple (the stamp that adjudicates guest-side load);
- a HEALTHY verdict only when both cold keys land within ~2.5x of
  record (provisional — see the calibration note at _REFS).

Usage: python tools/host_canary.py
Prints one JSON line; exit 0 if healthy, 1 if degraded, 3 if the refs
are STALE (see below). Shell wait loops should be BOUNDED — an
unhealthy host can stay unhealthy for a whole round (r12 precedent),
so an unbounded `until ...` would spin forever:

    for i in $(seq 1 18); do   # give up after ~3 h
        python tools/host_canary.py && break; sleep 600
    done

Since r13, bench.py and tools/bench_full.py run this canary in a
subprocess before their sweep and embed the JSON verdict in their
artifacts (`host_canary` field), so a future reader adjudicates host
health from the artifact itself instead of reconstructing it from
round notes.

The thresholds are deliberately coarse (cold single-shots carry
±20-30% even on a quiet box); a healthy verdict clears the way for a
bench/bench_full run, an unhealthy one means only fully-warmed
shared-session best-of-N per-key measurements are citable (the
standing SCALING.md rule).
"""

from __future__ import annotations

import hashlib
import inspect
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

# Warm-leg references (r13): after the cold shot, each key re-runs
# twice and the min is its warm wall. ROUND13_NOTES §5b measured the
# r12/r13 host pathology as a FIRST-EXECUTION/startup tax — steady
# state matched r11-era records even while cold walls read 4-9x — so
# the warm leg answers the finer question "is warm-protocol evidence
# citable on this host?". Refs are this exact protocol's walls
# measured 2026-08-16 on the DEGRADED host whose deep-warm steady
# state was independently at record (BENCH_FULL_WARM_r13 0.616/0.913).
# CAVEAT (ADVICE r13): because these refs are ~2x the healthy deep-
# warm walls, the 2.5x tolerance is effectively ~5x of true steady
# state — warm_healthy=false is a STRONG signal of real throughput
# loss, but warm_healthy=true does NOT rule out a 2-4x warm loss.
# Re-measure on the first healthy box with this protocol (the
# _REF_SRC_SHA refresh protocol) and tighten.
_WARM_REFS = {"q_text_tfidf": 1.17, "q_tpch_q5": 1.28}

# Verdict provenance (ADVICE r13): artifact readers must be able to
# tell when and by which canary schema a verdict was produced —
# BENCH_FULL_r13 embedded a pre-warm-leg verdict (no warm_healthy)
# indistinguishable from a fresh one, and SPARK_GRAFT_CANARY_JSON
# could inject an arbitrarily stale recorded verdict. Every verdict
# now carries `canary_schema` + a wall-clock `recorded_utc` written
# by the canary itself; subprocess_verdict flags pre-recorded JSON
# missing either field instead of embedding it silently.
_SCHEMA_VERSION = 2  # 1 = r12 cold-only; 2 = r13 two-leg + provenance

# Staleness pins (VERDICT r12 task 4): the refs above are only valid
# for the plans that produced them. These are sha256(inspect.getsource)
# prefixes of the two reference keys' REGISTERED functions at ref-taking
# time; if either function changes, the canary exits 3 (STALE) instead
# of silently reclassifying hosts with walls measured against a
# different plan. Refresh protocol: re-measure _REFS on a HEALTHY box
# with the canary's own protocol, then update both dicts together.
# (Deliberately a source hash, not a plan hash: coarse but dependency-
# free, and a comment-only edit forcing a cheap ref refresh is the
# acceptable false-positive direction.)
_REF_SRC_SHA = {"q_text_tfidf": "a3a2796936928e52", "q_tpch_q5": "e8f83433656ee057"}


def stale_refs(queries) -> dict[str, str]:
    """Ref keys whose registered function source no longer matches the
    pinned hash → {key: current_hash}. Empty dict = refs current."""
    out = {}
    for key, pinned in _REF_SRC_SHA.items():
        cur = hashlib.sha256(
            inspect.getsource(queries[key]).encode()
        ).hexdigest()[:16]
        if cur != pinned:
            out[key] = cur
    return out


def run_canary() -> dict:
    """Run the canary protocol in THIS process (fresh engine session +
    one warmup key + two cold timed reference keys) and return the
    verdict dict. Callers embedding the verdict in a bench artifact
    should instead run this module as a subprocess BEFORE building
    their own session (see bench.py) so the canary's fresh-session
    calibration context is preserved."""
    load_start = (
        [round(x, 2) for x in os.getloadavg()]
        if hasattr(os, "getloadavg") else None
    )
    from engine.registry import all_queries
    from engine.session import get_spark

    spark = get_spark("host-canary")
    qs = all_queries()
    stale = stale_refs(qs)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # one warmup so the canary measures plans, not JVM/codegen startup
    qs["q_agg_group"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls = {}
    warm_walls = {}
    for key in _REFS:
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[key] = round(time.perf_counter() - t0, 2)
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        warm_walls[key] = round(min(runs), 2)
    healthy = all(walls[k] <= _REFS[k] * _TOL for k in _REFS)
    warm_healthy = all(warm_walls[k] <= _WARM_REFS[k] * _TOL for k in _REFS)
    out = {
        # provenance first (ADVICE r13): schema version + a wall-clock
        # stamp written by the canary itself, so an embedded verdict
        # is datable and protocol-identifiable on its own
        "canary_schema": _SCHEMA_VERSION,
        "recorded_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "healthy": healthy,
        "walls": walls,
        "refs": _REFS,
        # warm leg (r13, ROUND13_NOTES §5b): healthy=false +
        # warm_healthy=true is the startup-tax signature — cold
        # numbers not citable, warm protocol is; warm_healthy=false
        # is a real steady-state throughput loss
        "warm_healthy": warm_healthy,
        "warm_walls": warm_walls,
        "warm_refs": _WARM_REFS,
        "tolerance": _TOL,
        "load_avg_start": load_start,
        "sf_dir": sf_dir,
    }
    if stale:
        # measured walls are still host evidence, but the verdict is
        # uninterpretable against refs taken for a different plan
        out["stale_refs"] = stale
        out["healthy"] = None
        out["warm_healthy"] = None
    return out


def subprocess_verdict(timeout: int = 600) -> dict:
    """Canary verdict for embedding in a bench artifact (VERDICT r12
    task 3). Runs this module as a SUBPROCESS — a fresh JVM is the
    calibrated canary context, and running the two reference keys
    inside the caller's own session would also pre-warm them and
    silently change the sweep protocol for those keys. Honors
    SPARK_GRAFT_CANARY_JSON (path to a just-recorded verdict file) to
    skip the ~35 s re-run. Never raises: {"error": ...} on failure so
    a broken canary cannot kill a bench run."""
    import subprocess

    pre = os.environ.get("SPARK_GRAFT_CANARY_JSON")
    if pre:
        try:
            with open(pre) as fh:
                verdict = json.load(fh)
        except Exception as e:  # noqa: BLE001
            return {"error": f"SPARK_GRAFT_CANARY_JSON unreadable: {e}"}
        # ADVICE r13: a pre-recorded verdict without provenance could
        # be arbitrarily stale or from an older canary protocol —
        # flag it in the embedded copy rather than passing it off as
        # a fresh schema-2 verdict (never raise: the bench must run).
        missing = [f for f in ("canary_schema", "recorded_utc") if f not in verdict]
        if missing:
            verdict["provenance_warning"] = (
                f"pre-recorded verdict missing {missing}; age/protocol unknown"
            )
        return verdict
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "host_canary.py")],
            capture_output=True, text=True, timeout=timeout,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"}


def main() -> int:
    out = run_canary()
    print(json.dumps(out))
    if out.get("stale_refs"):
        return 3
    return 0 if out["healthy"] else 1


if __name__ == "__main__":
    sys.exit(main())
