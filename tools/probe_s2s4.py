#!/usr/bin/env python3
"""Probe: can DuckDB exactly replicate lshTopK (s2) and ivfTopK (s4)?

Replicates SimilarityFunctions.hyperplane (md5-derived constants) and
checks a candidate oracle SQL against the Spark parquet output from a
Verify run. Usage: probe_s2s4.py <sfDir> <verifyOutDir>
"""
import sys, math, hashlib
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

def hyperplane(seed: int, p: int, dim: int):
    comps = []
    for d in range(dim):
        hx = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:7].hex()
        comps.append(int(hx, 16) / 2**55 - 1.0)
    n = math.sqrt(sum(x * x for x in comps))
    return [x / n for x in comps]

def lit(xs):
    return "[" + ", ".join(repr(x) for x in xs) + "]"

planes = [hyperplane(42, p, 64) for p in range(4)]

bucket_terms = " + ".join(
    f"(CASE WHEN list_sum(list_transform(generate_series(1, 64), i -> v[i] * ({lit(pl)})[i])) >= 0 THEN {1 << p} ELSE 0 END)"
    for p, pl in enumerate(planes))

COS = ("round(list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * b.v[i])) / "
       "(sqrt(list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * q.qv[i]))) * "
       "sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))), 6)")

s2_sql = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
 b AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM e),
 q AS (SELECT vec_id AS qid, v AS qv, bucket FROM b WHERE vec_id < 10),
 s AS (
  SELECT q.qid AS query_id, b.vec_id AS neighbor_id, {COS} AS score
  FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id <> q.qid),
 r AS (SELECT query_id, neighbor_id, score,
   CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
   FROM s)
SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
ORDER BY query_id, rank"""

s4_sql = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
 cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
 ca AS (
  SELECT e.vec_id, e.v, cent.cid,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      round(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * cent.cv[i])) /
        (sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) *
         sqrt(list_sum(list_transform(generate_series(1, 64), i -> cent.cv[i] * cent.cv[i])))), 6) DESC,
      cent.cid ASC) AS crank
  FROM e, cent),
 assigned AS (SELECT vec_id AS neighbor_id, v, cid FROM ca WHERE crank <= 1),
 qa AS (SELECT vec_id AS query_id, v AS qv, cid FROM ca WHERE crank <= 4 AND vec_id < 10),
 s AS (
  SELECT qa.query_id, b.neighbor_id,
    round(list_sum(list_transform(generate_series(1, 64), i -> qa.qv[i] * b.v[i])) /
      (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qa.qv[i] * qa.qv[i]))) *
       sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))), 6) AS score
  FROM assigned b JOIN qa ON b.cid = qa.cid AND b.neighbor_id <> qa.query_id),
 r AS (SELECT query_id, neighbor_id, score,
   CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
   FROM s)
SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
ORDER BY query_id, rank"""

con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sfdir}/embeddings.parquet'")
for name, sql in [("s2_ann_lsh", s2_sql), ("s4_ann_ivf", s4_sql)]:
    exp = con.sql(sql).df()
    got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet' ORDER BY query_id, rank").df()
    same = exp.reset_index(drop=True).equals(got[exp.columns].reset_index(drop=True))
    print(name, "rows", len(got), "vs oracle", len(exp), "EXACT MATCH" if same else "MISMATCH")
    if not same:
        merged = got.merge(exp, on=["query_id", "rank"], suffixes=("_g", "_e"))
        diff = merged[(merged.neighbor_id_g != merged.neighbor_id_e) | (merged.score_g != merged.score_e)]
        print(diff.head(10))
