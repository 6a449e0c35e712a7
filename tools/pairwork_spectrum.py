#!/usr/bin/env python3
"""q_containment pair-work spectrum: where the inverted-index join's work
lives on the 4-gram df axis, and what a df cap removes.

The join pays df_eval x df_train candidate pairs per kept gram, so the
work integral is  sum over grams of (df_eval * df_train).  This script
buckets that integral by total df and prints, per bucket:
  - gram types (count of distinct grams)
  - pair work  (sum df_eval*df_train)
plus the integral under the n/20 law and under min(n/20, CAP) — the
committed evidence behind CurationOps.containmentDfCap (BASELINE.md
round 16; the round-15 32 g audit refuted the spill hypothesis and
this spectrum is why the absolute cap restores linearity).

Usage: python3 tools/pairwork_spectrum.py SF_DIR [CAP=512]
"""
import sys

import duckdb

sf_dir = sys.argv[1]
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 512

con = duckdb.connect()
con.execute("SET temp_directory='/tmp/graft_duckdb_tmp'")
con.execute("SET memory_limit='48GB'")
# documents.parquet is a file at the driver SFs, a Spark part-file
# directory for the GenScale corpora — glob handles both
import os
doc = f"{sf_dir}/documents.parquet"
pat = f"{doc}/*.parquet" if os.path.isdir(doc) else doc
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")

n_docs, = con.execute("SELECT count(*) FROM documents").fetchone()
frac_cap = n_docs // 20
print(f"corpus: {sf_dir}  n_docs={n_docs}  n/20={frac_cap}  abs_cap={cap}")

# the same 4-gram split the operator uses (Dedup.grams4Duck semantics):
# distinct word-4-grams per doc over whitespace-split text
rows = con.execute("""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 2),
    i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2] || '_' || ws[i+3]))) AS gram
  FROM words),
per_gram AS (
  SELECT gram,
    count(*) AS df,
    sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS df_eval,
    sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS df_train
  FROM g GROUP BY gram),
bucketed AS (
  SELECT CASE
      WHEN df <= 16 THEN 'a <=16'
      WHEN df <= 64 THEN 'b 17-64'
      WHEN df <= 256 THEN 'c 65-256'
      WHEN df <= 512 THEN 'd 257-512'
      WHEN df <= 2048 THEN 'e 513-2048'
      ELSE 'f >2048' END AS bucket,
    count(*) AS gram_types,
    sum(df_eval * df_train) AS pair_work
  FROM per_gram GROUP BY 1)
SELECT * FROM bucketed ORDER BY bucket
""").fetchall()
# max(..., 1): a degenerate corpus (no shared eval/train grams, or every
# doc under 4 words) has a zero integral — print 0.00% rows, don't crash
tot_types = max(sum(r[1] for r in rows), 1)
tot_work = max(sum(r[2] or 0 for r in rows), 1)
print(f"{'bucket':<12}{'gram_types':>14}{'types%':>9}{'pair_work':>16}{'work%':>8}")
for b, t, w in rows:
    w = w or 0
    print(f"{b:<12}{t:>14}{100*t/tot_types:>8.3f}%{w:>16}{100*w/tot_work:>7.2f}%")

for label, bound in (("n/20 law", frac_cap), (f"min(n/20,{cap})", min(frac_cap, cap))):
    kept, = con.execute("""
      WITH words AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      g AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 2),
          i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2] || '_' || ws[i+3]))) AS gram
        FROM words),
      per_gram AS (
        SELECT gram, count(*) AS df,
          sum(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS df_eval,
          sum(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS df_train
        FROM g GROUP BY gram)
      SELECT sum(df_eval * df_train) FROM per_gram WHERE df <= ?
    """, [bound]).fetchone()
    print(f"work integral under {label} (df <= {bound}): {kept}")
