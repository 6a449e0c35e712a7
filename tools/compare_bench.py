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
"""
import json
import re
import sys


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


def main():
    argv = sys.argv[1:]
    threshold = 1.5
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    raise SystemExit("--threshold requires a value")
                threshold = float(argv[i + 1])
                i += 1  # consume the value, don't treat it as a file
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        raise SystemExit("usage: compare_bench.py BASELINE.json NEW.json [--threshold X]")
    base, new = load_bench(args[0]), load_bench(args[1])
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
            # sub-reproducibility-floor baseline: ratio OR absolute
            # budget, whichever is looser
            ok = t_new <= max(t_base * threshold, t_base + 0.3)
            verdict = "PASS" if ok else "FAIL"
            print(f"{verdict}     {q:32s} {t_base:8.3f}s -> {t_new:8.3f}s (abs gate)")
        else:
            ratio = t_new / t_base
            ok = ratio <= threshold
            verdict = "PASS" if ok else "FAIL"
            print(f"{verdict}     {q:32s} {t_base:8.3f}s -> {t_new:8.3f}s ({ratio:5.2f}x)")
        if not ok:
            failures.append(q)
    # the total gate compares the COMMON query subset: the raw totals span
    # different query sets as rounds add operators, so their ratio measures
    # coverage growth, not regression
    common = sorted(set(base["queries"]) & set(new["queries"]))
    if common:
        tb = sum(base["queries"][q] for q in common)
        tn = sum(new["queries"][q] for q in common)
        tot_ok = tn <= tb * threshold
        print(f"{'PASS' if tot_ok else 'FAIL'}     "
              f"{'TOTAL (%d common)' % len(common):32s} "
              f"{tb:8.3f}s -> {tn:8.3f}s ({tn / tb:5.2f}x)")
        if not tot_ok:
            failures.append("TOTAL")
    else:
        print(f"SKIP     {'TOTAL':32s} (no common queries)")
    if base.get("value") is not None and new.get("value") is not None:
        print(f"         {'(raw totals, all queries)':32s} "
              f"{base['value']:8.3f}s -> {new['value']:8.3f}s")
    if failures:
        print(f"\n{len(failures)} regression(s) beyond {threshold}x: {', '.join(failures)}")
        return 1
    print(f"\nno regressions beyond {threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
