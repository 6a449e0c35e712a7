#!/usr/bin/env python3
"""Bench regression gate: compare a new bench JSON against a baseline.

Usage: compare_bench.py BASELINE.json NEW.json [--threshold 1.5]

Accepts either the raw one-line JSON that graft.Bench prints
({"metric": "total", "value": N, "queries": {...}}) or the driver's
BENCH_r{N}.json wrapper (whose "tail" text embeds that line). Prefer
the committed bench_detail.json (written by every full Bench run) over
BENCH_r{N}.json wrappers: it carries the COMPLETE per-query map, while
the wrapper's tail capture truncates to the slowest ~30 entries.
Exits 1 if any query regresses more than THRESHOLD x against the
baseline, or if the total does. New queries (absent from the baseline)
are reported but never fail the gate. Sub-500ms baselines sit at or
below the min-of-2 methodology's reproducibility floor (a lucky pair of
sweeps can print 0.13 s for a query whose steady state is ~0.3 s, and
that flattering number then becomes the next round's baseline — the
round-11 q1 2.31x false flag): they pass if the new time is within
EITHER the ratio threshold OR an absolute +300ms budget, whichever is
looser. The baseline a round gates against must be a COMMITTED artifact
(bench_detail_r{N}.json), never a /tmp re-run.

Canary drift normalization (round 14): this box is a shared VM whose
hypervisor serves first-touch page faults at 0.04-1 GiB/s (BASELINE.md
round-13 section), so whole-sweep times drift 1.1-1.6x between rounds
with zero code change — rounds 11/12/13 minted 10 false flags this way.
The gate now measures the CODE, not the neighbor's VM: a fixed set of
CANARY queries (code-stable since round 9, spread across families,
cross-round time spread <= 1.26x over r09-r13) estimates the host drift
as the median new/base ratio over the canaries, and every query's ratio
is gated NORMALIZED by that factor. Raw ratios stay in the output for
honesty; a drift far from 1.0 is itself reported. When fewer than
MIN_CANARIES canaries are present on both sides (e.g. the pipeline
bench's two-entry map), drift falls back to 1.0 with a note — the gate
is then exactly the pre-round-14 raw gate. --no-drift forces raw
gating; --queries a,b,c restricts the compare to the named queries
(used by run_pipeline_bench.sh to gate pipeline_steps hard while
reporting pipeline_wall informationally).

Canary integrity + drift sanity (round 15): the drift estimate is only
valid while the canaries' code paths are unchanged, so before
normalizing the gate git-diffs the repo since the commit that last
touched the BASELINE artifact, excludes any canary whose mapped source
file changed (CANARY_FILES), and warns when a shared path (Bench/core/
launcher) changed — a uniform regression from those is the one thing
normalization cannot distinguish from host noise. Independently, a
drift estimate outside DRIFT_SANITY_BAND fails the gate with a DRIFT
entry unless --accept-drift is passed after adjudication. The sub-floor
gate no longer multiplies in drift (its queries are scheduler-noise-
dominated, outside what the whole-suite estimate describes); its
blind spot is covered by the MANDATORY per-round sf1/sf10 audits.
"""
import json
import os
import re
import statistics
import subprocess
import sys

# Code-stable since r09 (per-query cross-round max/min <= 1.26x over the
# five committed sf0.1 sweeps bench_detail_r{09..13}.json), >= 0.25 s
# floor so the estimate sits above the min-of-2 reproducibility noise,
# one per family: dedup, lake, load jobclass, graph, multimodal,
# sketch, streaming, relational, curation, ANN.
DEFAULT_CANARIES = [
    "q_minhash_lsh", "q_compaction", "q_load_maxerror", "q_pagerank",
    "q_mm_phash", "q_cms_heavy_hitters", "q_stream_hourly",
    "q5_region_revenue", "q_importance_weights", "q_ivfpq_search",
]
MIN_CANARIES = 6
# drift outside this band means the canaries themselves disagree with a
# host-noise explanation (or the host is in a pathological state);
# clamp and say so rather than silently scaling the gate unboundedly
DRIFT_CLAMP = (0.5, 3.0)
# Sanity band for the drift estimate itself (round-15, per ADVICE): the
# committed host record spans 1.08-1.22x round-over-round with the worst
# paging days near 1.5x (docs/benching-jvms-on-overcommitted-hosts.md).
# A drift estimate outside this band is as consistent with "a code change
# on a shared path slowed everything uniformly" as with host noise, and
# the normalization would silently absorb it — so the gate FAILS with an
# explicit DRIFT entry unless --accept-drift is passed after adjudication
# (the canary-integrity check below is the evidence to adjudicate with).
DRIFT_SANITY_BAND = (0.75, 1.5)

# Canary -> source files whose change invalidates that canary as a
# host-drift witness (round-15, VERDICT Next #3): the drift estimate is
# only meaningful while the canaries' code paths are UNCHANGED between
# the two benches. Before normalizing, the gate git-diffs the repo since
# the commit that introduced the BASELINE artifact and excludes any
# canary whose mapped file changed (committed or working-tree). Paths
# are repo-relative. VectorExpressions carries the codegen hashes the
# dedup/multimodal canaries execute; streaming/ carries the kernels
# behind the stream canary.
SRC = "src/main/scala/graft/"
CANARY_FILES = {
    "q_minhash_lsh": [SRC + "operators/Dedup.scala",
                      SRC + "functions/VectorExpressions.scala"],
    "q_compaction": [SRC + "operators/LayoutOps.scala"],
    "q_load_maxerror": [SRC + "operators/DataMovement.scala"],
    "q_pagerank": [SRC + "operators/ClusterOps.scala"],
    "q_mm_phash": [SRC + "operators/Multimodal.scala",
                   SRC + "functions/VectorExpressions.scala"],
    "q_cms_heavy_hitters": [SRC + "operators/SketchOps.scala"],
    "q_stream_hourly": [SRC + "operators/StreamOps.scala",
                        SRC + "streaming/"],
    "q5_region_revenue": [SRC + "operators/Relational.scala"],
    "q_importance_weights": [SRC + "operators/CurationOps.scala"],
    "q_ivfpq_search": [SRC + "operators/Similarity.scala"],
}
# Files on EVERY query's path: a change here can slow the whole suite
# uniformly, which drift normalization would misread as host noise. The
# gate can't exclude all canaries (that disables itself), so it warns
# loudly instead — the reviewer must adjudicate such a diff by hand.
SHARED_PATHS = [
    SRC + "Bench.scala", SRC + "SparkEntry.scala", SRC + "Tables.scala",
    SRC + "core/", "tools/graft_java.sh",
]


def repo_root():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--show-toplevel"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, check=True).stdout.strip()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def changed_since_baseline(baseline_path):
    """Repo-relative paths changed (committed or working-tree) since the
    commit that last touched the committed baseline artifact. Returns
    None (with a note) when the provenance can't be established — e.g.
    a /tmp baseline, which the docstring already forbids as a gate
    baseline."""
    root = repo_root()
    if root is None:
        print("canary   git unavailable -> canary integrity UNCHECKED")
        return None
    try:
        rel = os.path.relpath(os.path.abspath(baseline_path), root)
    except ValueError:
        rel = None
    if rel is None or rel.startswith(".."):
        print(f"canary   baseline {baseline_path} is outside the repo -> "
              "canary integrity UNCHECKED (gate against a committed artifact)")
        return None
    commit = subprocess.run(
        ["git", "log", "-n1", "--format=%H", "--", rel],
        cwd=root, capture_output=True, text=True).stdout.strip()
    if not commit:
        print(f"canary   baseline {rel} has no git history -> "
              "canary integrity UNCHECKED")
        return None
    diff = subprocess.run(
        ["git", "diff", "--name-only", commit],
        cwd=root, capture_output=True, text=True)
    if diff.returncode != 0:
        print("canary   git diff failed -> canary integrity UNCHECKED")
        return None
    return set(p for p in diff.stdout.splitlines() if p)


def stale_canaries(baseline_path):
    """Canaries whose mapped source changed since the baseline commit
    (to exclude from the drift median), plus a loud warning for shared-
    path changes that no per-canary exclusion can compensate for."""
    changed = changed_since_baseline(baseline_path)
    if changed is None:
        return set()
    def hit(path):
        return any(c == path or (path.endswith("/") and c.startswith(path))
                   for c in changed)
    shared_hits = [p for p in SHARED_PATHS if hit(p)]
    if shared_hits:
        print("canary   WARNING: shared-path change since baseline "
              f"({', '.join(shared_hits)}) — a uniform slowdown from these "
              "files would be absorbed into the drift estimate; adjudicate "
              "this diff by hand (consider --no-drift)")
    stale = set()
    for q, files in CANARY_FILES.items():
        hits = [f for f in files if hit(f)]
        if hits:
            stale.add(q)
            print(f"canary   EXCLUDED {q}: code path changed since baseline "
                  f"({', '.join(hits)})")
    if not stale and not shared_hits:
        print(f"canary   integrity OK: no canary code path changed since "
              f"the baseline's commit")
    return stale

# Per-query threshold overrides for queries whose committed five-round
# history proves a VARIANCE MECHANISM rather than a regression path —
# each entry must cite its BASELINE.md adjudication. q_recursive_cte
# (history 0.60-1.40 s, no code change since r9): Spark 4's UnionLoop
# materializes ~15 sequential iterations (one per halving of the max
# user id), so the query's time is ~15x the per-job launch+schedule
# latency — a quantity the hypervisor doubles on degraded days while
# scan-bound canaries drift only ~1.2x, putting it outside any
# whole-suite drift estimate (BASELINE.md round-14 note).
QUERY_THRESHOLD = {"q_recursive_cte": 2.5}


def load_bench(path):
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    # driver wrapper: find the bench line inside "tail"
    tail = doc.get("tail", "")
    candidates = []
    for m in re.finditer(r'\{"metric".*\}', tail):
        try:
            inner = json.loads(m.group(0))
            if "queries" in inner:
                candidates.append(inner)
        except json.JSONDecodeError:
            continue
    if candidates:
        # prefer the line with the richest per-query map (the compact
        # trailer Bench prints last carries an empty map by design)
        best = max(candidates, key=lambda c: len(c["queries"]))
        if not best["queries"]:
            # the full line lost its head to tail truncation: recover the
            # per-query entries that survived in the truncated fragment
            frag = tail[: tail.rfind('{"metric"')]
            recovered = dict(
                (q, float(t))
                for q, t in re.findall(r'"(q[0-9a-z_]+)":([0-9.]+)', frag)
            )
            if recovered:
                print(
                    f"note: {path} tail-truncated; recovered "
                    f"{len(recovered)} per-query entries", file=sys.stderr)
                best = dict(best, queries=recovered)
        return best
    # legacy truncated artifact (no metric line survived at all): recover
    # what per-query entries remain; the total is unknowable, so main()
    # skips the total gate for this side
    recovered = dict(
        (q, float(t)) for q, t in re.findall(r'"(q[0-9a-z_]+)":([0-9.]+)', tail)
    )
    if recovered:
        print(
            f"note: {path} has no intact bench line; recovered "
            f"{len(recovered)} per-query entries, total unavailable",
            file=sys.stderr)
        return {"value": None, "queries": recovered}
    raise SystemExit(f"no bench JSON found in {path}")


def canary_drift(base_q, new_q, exclude=frozenset()):
    """Median new/base ratio over the canary set (minus integrity-
    excluded members), or 1.0 (with a note) when too few canaries are
    present to estimate host drift. Returns (drift, suspect) where
    suspect is True when the estimate fell outside DRIFT_SANITY_BAND."""
    ratios = []
    for q in DEFAULT_CANARIES:
        if q in exclude:
            continue
        tb, tn = base_q.get(q), new_q.get(q)
        if tb is not None and tn is not None and tb >= 0.25 and tn >= 0:
            ratios.append(tn / tb)
    if len(ratios) < MIN_CANARIES:
        print(f"drift    canaries usable: {len(ratios)}/{len(DEFAULT_CANARIES)}"
              f" (< {MIN_CANARIES}) -> no drift estimate, gating raw")
        return 1.0, False
    d = statistics.median(ratios)
    clamped = min(max(d, DRIFT_CLAMP[0]), DRIFT_CLAMP[1])
    note = "" if clamped == d else f" (CLAMPED from {d:.2f}x — investigate)"
    print(f"drift    canary host-drift factor: {clamped:.3f}x "
          f"(median over {len(ratios)} canaries){note}")
    suspect = not (DRIFT_SANITY_BAND[0] <= clamped <= DRIFT_SANITY_BAND[1])
    if suspect:
        print(f"drift    SUSPECT: {clamped:.3f}x is outside the sanity band "
              f"[{DRIFT_SANITY_BAND[0]}, {DRIFT_SANITY_BAND[1]}] — as "
              "consistent with a shared-path code regression as with host "
              "noise; gate FAILS unless --accept-drift is passed after "
              "adjudicating (canary-integrity output above is the evidence)")
    return clamped, suspect


def main():
    argv = sys.argv[1:]
    threshold = 1.5
    use_drift = True
    accept_drift = False
    only = None
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        # flags match exactly (or exactly with "=value") so a typo like
        # --thresholdx or --queries-only errors instead of silently
        # parsing as the real flag (round-15 ADVICE)
        if a == "--threshold" or a.startswith("--threshold="):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    raise SystemExit("--threshold requires a value")
                threshold = float(argv[i + 1])
                i += 1  # consume the value, don't treat it as a file
        elif a == "--no-drift":
            use_drift = False
        elif a == "--accept-drift":
            accept_drift = True
        elif a == "--queries" or a.startswith("--queries="):
            if "=" in a:
                only = set(a.split("=", 1)[1].split(","))
            else:
                if i + 1 >= len(argv):
                    raise SystemExit("--queries requires a value")
                only = set(argv[i + 1].split(","))
                i += 1
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag: {a}")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        raise SystemExit("usage: compare_bench.py BASELINE.json NEW.json"
                         " [--threshold X] [--no-drift] [--accept-drift]"
                         " [--queries a,b]")
    base, new = load_bench(args[0]), load_bench(args[1])
    if only is not None:
        base = dict(base, queries={q: t for q, t in base["queries"].items() if q in only})
        new = dict(new, queries={q: t for q, t in new["queries"].items() if q in only})
    if use_drift:
        drift, drift_suspect = canary_drift(
            base["queries"], new["queries"], exclude=stale_canaries(args[0]))
    else:
        drift, drift_suspect = 1.0, False
    failures = []
    # a negative time is Bench's explicit failed-run marker — never a
    # speedup; gate on it before any ratio math
    for q, t in sorted(new["queries"].items()):
        if t < 0:
            print(f"FAIL     {q:32s} BENCHFAIL (run threw; see bench stderr)")
            failures.append(q)
    new = dict(new, queries={q: t for q, t in new["queries"].items() if t >= 0})
    base = dict(base, queries={q: t for q, t in base["queries"].items() if t >= 0})
    for q, t_new in sorted(new["queries"].items()):
        t_base = base["queries"].get(q)
        if t_base is None:
            print(f"NEW      {q:32s} {t_new:8.3f}s (no baseline)")
            continue
        if t_base < 0.5:
            # sub-reproducibility-floor baseline: a committed value below
            # the min-of-2 floor tells you the steady state is <= ~0.5 s,
            # not what it is (q2_min_cost_supplier's committed history is
            # 0.214-0.563 s across five rounds with zero code change on
            # its path — the 0.214 was the lucky draw, not the steady
            # state). Gate the new time against the FLOOR, not the draw:
            # bar = 0.5 * threshold, WITHOUT the drift factor (round-15
            # ADVICE: sub-floor queries are scheduler-noise-dominated —
            # exactly the population a whole-suite drift estimate does
            # not describe, and compounding floor x threshold x drift
            # widened the blind spot to ~2.25 s). Trade documented in
            # BASELINE.md round-14: a sub-100 ms query regressing to
            # ~0.75 s passes this gate — accepted, because a real
            # regression of that size re-fires at the MANDATORY sf1/sf10
            # audits where it clears the floor.
            ok = t_new <= max(t_base, 0.5) * threshold
            verdict = "PASS" if ok else "FAIL"
            print(f"{verdict}     {q:32s} {t_base:8.3f}s -> {t_new:8.3f}s (floor gate)")
        else:
            ratio = t_new / t_base
            norm = ratio / drift
            ok = norm <= max(threshold, QUERY_THRESHOLD.get(q, 0.0))
            verdict = "PASS" if ok else "FAIL"
            tag = f"({ratio:5.2f}x raw" + \
                  (f", {norm:5.2f}x norm)" if drift != 1.0 else ")")
            print(f"{verdict}     {q:32s} {t_base:8.3f}s -> {t_new:8.3f}s {tag}")
        if not ok:
            failures.append(q)
    # the total gate compares the COMMON query subset: the raw totals span
    # different query sets as rounds add operators, so their ratio measures
    # coverage growth, not regression
    common = sorted(set(base["queries"]) & set(new["queries"]))
    if common:
        tb = sum(base["queries"][q] for q in common)
        tn = sum(new["queries"][q] for q in common)
        tot_ok = (tn / tb) / drift <= threshold
        print(f"{'PASS' if tot_ok else 'FAIL'}     "
              f"{'TOTAL (%d common)' % len(common):32s} "
              f"{tb:8.3f}s -> {tn:8.3f}s ({tn / tb:5.2f}x raw"
              + (f", {(tn / tb) / drift:5.2f}x norm)" if drift != 1.0 else ")"))
        if not tot_ok:
            failures.append("TOTAL")
    else:
        print(f"SKIP     {'TOTAL':32s} (no common queries)")
    if base.get("value") is not None and new.get("value") is not None:
        print(f"         {'(raw totals, all queries)':32s} "
              f"{base['value']:8.3f}s -> {new['value']:8.3f}s")
    if drift_suspect and not accept_drift:
        failures.append("DRIFT")
    if failures:
        print(f"\n{len(failures)} regression(s) beyond {threshold}x: {', '.join(failures)}")
        return 1
    print(f"\nno regressions beyond {threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
