#!/usr/bin/env python3
"""Scale-sensitivity audit: compare per-query bench times at two scale
factors and flag queries whose runtime grows faster than the data.

Usage: python tools/scaling_audit.py <bench_small.json> <bench_big.json> [data_ratio]

`data_ratio` is how much bigger the big SF's data is (default 10, i.e.
sf0.01 -> sf0.1). A query is flagged SUPERLINEAR when its time ratio
exceeds 1.5x the data ratio AND both measurements are slow enough for
the ratio to be signal (>= 50 ms at the small SF — below that the base
is planning/session overhead and scheduler jitter, not data work; and
>= 0.2 s at the big SF) — sub-linear or linear growth is what a
scale-safe plan shows, since fixed per-query overhead (session, planning,
file listing) dominates at toy SF and washes out as data grows.

Reads the same one-line JSON `graft.Bench` prints ({"metric":"total",
..., "queries":{...}}); pass files containing that line (or the line
itself saved to a file).
"""
import json
import sys

# Queries whose OUTPUT CONTRACT is quadratic in the data: their oracle
# is an exact pair join, so the work (and the answer itself) grows with
# data_ratio^2 by definition — a linear threshold would flag them for
# honoring their own semantics. They get flag_at = 1.5 * data_ratio^2;
# staying UNDER that (e.g. q_stress_hot_near_dup measured 34x on 10x
# data = 100x pairs) is the blocked decomposition doing its job.
QUADRATIC_CONTRACT = {
    # exact within-label cos-sim pairs; hot cell holds 50% of rows, so
    # pair count grows (data_ratio)^2 (StressOps.qStressHotNearDup)
    "q_stress_hot_near_dup",
    # exact PPJoin audit arm: the corpus vocabulary is fixed, so every
    # gram's df grows with the data and the prefix-candidate surface
    # grows df^2 (measured 23.5M pairs at sf1 -> ~2.5B at sf10 = 106x
    # for 10x docs); the gridded candidate join (Dedup.allpairsJaccard)
    # bounds per-task surface but total work follows the pair count
    "q_allpairs_jaccard",
}

# RETIRED in round 12 (was FIXED_BLOCK_CARDINALITY, 5 queries): rounds
# <= 11 exempted q_pagerank / q_label_prop / q_er_clusters /
# q_dup_triangles / q_dedup_keep_best to the quadratic bound because the
# GenScale data froze every blocking-key space at its sf0.1 cardinality
# (10 embedding labels, 8 hyperplanes, verbatim c_name replicas, 27-word
# vocab) — a growth law no real corpus shows. Round 12 made the
# generator scale keys the way production data does (labels ~ sqrt(n),
# Heaps'-law Zipf vocab, names follow keys, log2(n) hyperplanes in the
# query itself, bigram simhash features), so these five are now held to
# the LINEAR threshold like everything else; their measured sf1->sf10
# ratios are the evidence the 100 TB claim previously only documented.
FIXED_BLOCK_CARDINALITY = set()


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('[info] '):
            line = line[len('[info] '):]
        if line.startswith('{') and '"queries"' in line:
            d = json.loads(line)
            if d.get('queries'):
                return d['queries']
    raise SystemExit(f"no bench JSON line with queries in {path}")


def main() -> None:
    small, big = load(sys.argv[1]), load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    flag_at = 1.5 * data_ratio
    rows = []
    n_benchfail = 0
    for name in sorted(set(small) & set(big)):
        s, b = small[name], big[name]
        # -1 is Bench's explicit failed-run marker: surface it loudly —
        # a failed big-SF run otherwise vanishes from the audit as if
        # the query scaled perfectly
        if s < 0 or b < 0:
            print(f"BENCHFAIL  {name}: small={s} big={b} (run threw)")
            n_benchfail += 1
            continue
        if s == 0:
            continue
        rows.append((b / s, name, s, b))
    rows.sort(reverse=True)
    n_flag = 0
    print(f"{'ratio':>7}  {'small':>7}  {'big':>7}  query")
    for r, name, s, b in rows:
        quad = name in QUADRATIC_CONTRACT or name in FIXED_BLOCK_CARDINALITY
        limit = 1.5 * data_ratio ** 2 if quad else flag_at
        flag = "SUPERLINEAR" if (r > limit and b >= 0.2 and s >= 0.05) else ""
        if flag:
            n_flag += 1
        note = flag
        if not flag and quad and r > flag_at:
            # visible but not failing: the quadratic set's rows carry
            # their bound so the table reads honestly
            note = f"(quadratic contract, bound {limit:.0f}x)"
        if note or r > data_ratio / 2:
            print(f"{r:7.2f}  {s:7.3f}  {b:7.3f}  {name} {note}")
    # totals over the SAME common-and-nonzero set as the per-query rows,
    # so the printed ratio and the row set can't disagree
    ts, tb = sum(s for _, _, s, _ in rows), sum(b for _, _, _, b in rows)
    print(f"\ntotals: {ts:.1f}s -> {tb:.1f}s ({tb / ts:.2f}x) on "
          f"{len(rows)} common queries; data grew {data_ratio:.0f}x; "
          f"{n_flag} flagged"
          + (f"; {n_benchfail} BENCHFAIL" if n_benchfail else ""))
    sys.exit(1 if n_flag or n_benchfail else 0)


if __name__ == "__main__":
    main()
