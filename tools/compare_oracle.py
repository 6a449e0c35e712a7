#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, load the Spark result parquet, sort
columns by name (like the driver) plus rows, and compare values.

Usage: python tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    # Bound DuckDB's scratch space explicitly: the sf1 audit once died of
    # ENOSPC inside a relative ".tmp" spill dir while evaluating the
    # q_allpairs_jaccard oracle. Spill to a dedicated dir on the big
    # volume (overridable) and cap memory so spilling engages early
    # instead of OOMing the driver box.
    tmp = os.environ.get("GRAFT_DUCKDB_TMP", "/tmp/graft_duckdb_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute(
        f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
    for t in TABLES:
        # the driver testdata is one file per table; GenScale output (the
        # sf1+ scaling-audit datasets) is a Spark-style directory of parts
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # GRAFT_ORACLE_SKIP: comma-separated names to record as SKIPPED
    # instead of executing — for the sf1+ scaling datasets where a few
    # oracle formulations (recursive-CTE closures, banded self-joins) are
    # impractical IN DUCKDB at that size; the Spark side runs them fine
    # and they stay hash-gated at sf0.01.
    skip = set(filter(None,
                      os.environ.get("GRAFT_ORACLE_SKIP", "").split(",")))
    # Skips weaken the gate, so they are only legal when the caller ALSO
    # sets GRAFT_ORACLE_ALLOW_SKIP=1 (the scaling-audit scripts do, with
    # the reason documented next to the skip list). Without the allow
    # flag a skip request is itself a failure — no silent de-gating.
    allow_skip = os.environ.get("GRAFT_ORACLE_ALLOW_SKIP") == "1"
    if skip and not allow_skip:
        print("ERROR: GRAFT_ORACLE_SKIP set without GRAFT_ORACLE_ALLOW_SKIP=1 "
              "— refusing to weaken the gate silently")
        sys.exit(2)
    # GRAFT_ORACLE_RESUME: path to a previous run's output — queries with
    # a PASS line there are not re-executed (long sf1 runs interrupted by
    # one pathological oracle keep their finished work). Cached PASSes
    # are only honored when the prior run's STAMP line matches this run's
    # inputs (same sf_dir + out_dir) — a resume file from a different
    # dataset or dump dir proves nothing about this one.
    done = set()
    resume = os.environ.get("GRAFT_ORACLE_RESUME")
    if resume and os.path.exists(resume):
        lines = list(open(resume))
        stamped = any(l.strip() == f"STAMP    sf_dir={sf_dir} out_dir={out_dir}"
                      for l in lines)
        if not stamped:
            print(f"WARNING: resume file {resume} has no matching STAMP for "
                  f"(sf_dir={sf_dir}, out_dir={out_dir}) — ignoring its PASS lines")
        else:
            for line in lines:
                if line.startswith("PASS"):
                    done.add(line.split()[1])
    print(f"STAMP    sf_dir={sf_dir} out_dir={out_dir}")
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in done:
            print(f"PASS     {name} (cached from {resume})")
            n_pass += 1
            continue
        if name in skip:
            print(f"SKIPPED  {name}: oracle impractical at this SF (see GRAFT_ORACLE_SKIP)")
            n_skip += 1
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            expected = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e)[:160]}")
            n_fail += 1
            continue
        actual = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
        a, e = norm(actual), norm(expected)
        if list(a.columns) != list(e.columns):
            print(f"SCHEMA   {name}: spark={list(a.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(a) != len(e):
            print(f"ROWS     {name}: spark={len(a)} oracle={len(e)}")
            n_fail += 1
            continue
        if not a.equals(e):
            diff_cols = [c for c in a.columns if not a[c].equals(e[c])]
            print(f"VALUES   {name}: differing cols {diff_cols}")
            for c in diff_cols[:2]:
                neq = a[c] != e[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"  row {i} col {c}: spark={a[c][i]!r} oracle={e[c][i]!r}")
            n_fail += 1
            continue
        print(f"PASS     {name} ({len(a)} rows)")
        n_pass += 1
    # Tolerance-gated queries: sketch outputs whose values can't hash-match
    # any other engine bit-for-bit (HLL register layouts differ), but whose
    # estimates carry a published error contract vs the exact answer. The
    # listed columns compare within relative tolerance against the EXACT
    # oracle of the named twin query; every other column must match
    # exactly. Spark's approx_count_distinct(rsd=0.02) quotes a 1-sigma
    # relative error of 2% — the gate bounds at 2.5 sigma (5%), and the
    # estimate is DETERMINISTIC for a given dataset, so a pass here is
    # stable, not a coin flip (measured max 2.09% at sf0.01). Round 15:
    # the map is now EMPTY — q_dq_profile_approx was the sole entry until
    # it became self-gating (it emits the exact counts plus a ±5% verdict
    # boolean, so it carries a full deterministic oracle and hash-gates
    # like every other query). The machinery stays for any future sketch
    # query that can't take that shape.
    tolerance = {}
    # queries with no oracle: tolerance gate if declared, else rows-only
    for d in sorted(os.listdir(out_dir)):
        if d not in oracle and os.path.isdir(os.path.join(out_dir, d)):
            files = glob.glob(os.path.join(out_dir, d, "*.parquet"))
            if d in tolerance and files:
                twin, tols = tolerance[d]
                if twin in oracle:
                    try:
                        expected = con.execute(oracle[twin]).fetchdf()
                    except Exception as exc:
                        print(f"ORAFAIL  {d}: twin {twin}: {str(exc)[:160]}")
                        n_fail += 1
                        continue
                    actual = pd.concat([pd.read_parquet(f) for f in sorted(files)])
                    a, e = norm(actual), norm(expected)
                    ok = list(a.columns) == list(e.columns) and len(a) == len(e)
                    detail = ""
                    if ok:
                        for c in a.columns:
                            tol = tols.get(c)
                            if tol is None:
                                if not a[c].equals(e[c]):
                                    ok, detail = False, f" exact col {c} differs"
                                    break
                            else:
                                rel = ((a[c].astype(float) - e[c].astype(float))
                                       .abs() / e[c].astype(float).clip(lower=1))
                                if not bool((rel <= tol).all()):
                                    ok = False
                                    detail = (f" {c} rel err {rel.max():.4f}"
                                              f" > {tol}")
                                    break
                    else:
                        detail = " schema/rowcount mismatch"
                    if ok:
                        print(f"PASS     {d} ({len(a)} rows, tolerance-gated "
                              f"vs {twin} oracle)")
                        n_pass += 1
                    else:
                        print(f"TOLFAIL  {d}:{detail}")
                        n_fail += 1
                    continue
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWSONLY {d}: {rows} rows")
    print(f"\n{n_pass} passed, {n_fail} failed"
          + (f", {n_skip} skipped" if n_skip else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
