#!/usr/bin/env python3
"""Prototype DuckDB oracles for the previously rows-only queries.
Usage: python3 tools/proto_oracles.py /tmp/verify_out /root/testdata/sf0.01 [name...]
Same compare as check_oracle.py; SQL here graduates into SparkEntry.oracleSql.
"""
import sys
sys.path.insert(0, "tools")
from check_oracle import table
import duckdb, glob

HEXPOS = "strpos('0123456789abcdef', "
# 16^(15-j) for j=1..15 — exact BIGINT powers for hex-prefix parsing
POW16 = "[" + ",".join(str(16 ** (15 - j)) for j in range(1, 16)) + "]"
# portable 60-bit hash of column c: first 15 hex digits of md5 as integer
def phash(c):
    return (f"CAST(list_sum(list_transform(range(1,16), j -> "
            f"({HEXPOS}substr(md5({c}),j,1))-1)::BIGINT * ({POW16})[j])) AS BIGINT)")

SHINGLE5 = r"""
w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                 x -> len(x) > 0) AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 3, 1)),
         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingle
       FROM w WHERE len(ws) >= 5)"""

SHINGLE3 = r"""
w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                 x -> len(x) > 0) AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 1)),
         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tok
       FROM w WHERE len(ws) >= 3)"""

# LSH plane signs: ±1 from parity of last md5 hex digit of 'p_i'
def SIGNS(nplanes, dims=64):
    return (f"planes AS (SELECT p, list_transform(range(0, {dims}), i -> "
            f"CASE WHEN (({HEXPOS}substr(md5(p || '_' || i), 32, 1))-1) % 2) = 0 "
            f"THEN 1.0 ELSE -1.0 END) AS s FROM range(0, {nplanes}) t(p))")

def SIGS(nplanes):
    return f"""
projs AS (SELECT e.vec_id, pl.p,
            list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * pl.s[i])) AS proj
          FROM embeddings e, planes pl),
sigs AS (SELECT vec_id, CAST(sum(CASE WHEN proj >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS sig
         FROM projs GROUP BY 1)"""

ORACLES = {}

ORACLES["quality_score"] = """
WITH q AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS INT) AS n_tokens,
    round(len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) / greatest(length(text), 1), 6) AS punct_ratio,
    round(len(list_filter(string_split_regex(text, '\\s+'),
          x -> lower(x) IN ('the','a','an','of','to','and','in','is','it','that')))
          / greatest(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)), 1), 6) AS stopword_ratio
  FROM documents)
SELECT doc_id, round(least(1.0,
         (least(n_tokens, 100) / 100.0) * 0.5
         + (1.0 - least(punct_ratio * 5, 1.0)) * 0.25
         + least(stopword_ratio * 4, 1.0) * 0.25), 6) AS score
FROM q ORDER BY doc_id"""

ORACLES["frame_sample"] = """
SELECT doc_id AS media_id, CAST(i AS INT) AS frame_index,
       CAST(octet_length(unhex(repeat(sha256(CAST(doc_id AS VARCHAR)), 4))) * i / 4 AS BIGINT) AS byte_offset
FROM documents, range(0, 4) t(i) ORDER BY 1, 2"""

ORACLES["multimodal_features"] = f"""
WITH hx AS (SELECT doc_id, repeat(sha256(CAST(doc_id AS VARCHAR)), 4) AS h FROM documents),
b AS (SELECT doc_id, unnest(list_transform(range(0, 128), i ->
        16 * (strpos('0123456789abcdef', substr(h, 2*i+1, 1)) - 1)
           + (strpos('0123456789abcdef', substr(h, 2*i+2, 1)) - 1))) AS v
      FROM hx),
cnt AS (SELECT doc_id, v, count(*) AS c FROM b GROUP BY 1, 2),
ent AS (SELECT doc_id,
          list_sum(list(-(c/128.0) * ln(c/128.0) / ln(2) ORDER BY v)) AS entropy,
          sum(v * c) AS tot
        FROM cnt GROUP BY 1)
SELECT doc_id AS media_id, CAST(128 AS BIGINT) AS n_bytes,
       round(tot / 128.0, 4) AS byte_mean, round(entropy, 4) AS byte_entropy
FROM ent ORDER BY media_id"""

ORACLES["rolling_fp"] = f"""
WITH {SHINGLE5},
h AS (SELECT doc_id AS id, md5(shingle) AS h FROM sh)
SELECT id, CAST(((16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
            + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % 8) AS INT) AS band,
       min(h) AS fp_hash
FROM h GROUP BY 1, 2 ORDER BY 1, 2"""

ORACLES["dedup_minhash"] = f"""
WITH {SHINGLE3},
th AS (SELECT doc_id, {phash('tok')} % 1073741789 AS hm FROM sh),
mh AS (SELECT doc_id, i,
         min((hm * ((1103515245 * (i+1)) % 2147483629) + ((12345 * (i+1)) % 2147483647)) % 2147483647) AS m
       FROM th, range(0, 32) t(i) GROUP BY 1, 2),
sigs AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY 1),
bd AS (SELECT doc_id, sig, b,
         md5(array_to_string(sig[b*4+1:b*4+4], ',') || '#' || b) AS bh
       FROM sigs, range(0, 8) t(b)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, a.sig AS sig_a, c.doc_id AS id_b, c.sig AS sig_b
         FROM bd a JOIN bd c ON a.b = c.b AND a.bh = c.bh AND a.doc_id < c.doc_id)
SELECT id_a, id_b,
       round(len(list_filter(range(1, 33), i -> sig_a[i] = sig_b[i])) / 32.0, 6) AS est_jaccard
FROM cand
WHERE round(len(list_filter(range(1, 33), i -> sig_a[i] = sig_b[i])) / 32.0, 6) >= 0.3
ORDER BY 1, 2"""

ORACLES["dedup_simhash"] = f"""
WITH tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
                                  x -> len(x) > 0)) AS tok FROM documents),
th AS (SELECT doc_id, {phash('tok')} AS h FROM tk),
votes AS (SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th, range(0, 60) t(i) GROUP BY 1, 2),
shh AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS s
        FROM votes GROUP BY 1),
ch AS (SELECT doc_id, s, c, (s >> CAST(c*15 AS INT)) & 32767 AS ck FROM shh, range(0, 4) t(c)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, a.s AS sa, b.doc_id AS id_b, b.s AS sb
         FROM ch a JOIN ch b ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS dist
FROM cand WHERE bit_count(xor(sa, sb)) <= 16 ORDER BY 1, 2"""

ORACLES["ann_ivf"] = """
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS sim
FROM embeddings WHERE vec_id != 0
ORDER BY sim DESC, vec_id LIMIT 10"""

ORACLES["ann_lsh"] = f"""
WITH {SIGNS(6)},{SIGS(6)},
q AS (SELECT sig AS qsig FROM sigs WHERE vec_id = 0),
probes AS (SELECT DISTINCT xor(qsig, m) AS sig
           FROM q, (SELECT unnest([0,1,2,4,8,16,32]) AS m)),
qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qvec), 6) AS sim
FROM embeddings e JOIN sigs s ON s.vec_id = e.vec_id JOIN probes p ON s.sig = p.sig, qv
WHERE e.vec_id != 0
ORDER BY sim DESC, e.vec_id LIMIT 10"""

ORACLES["emb_near_dup"] = f"""
WITH {SIGNS(8)},{SIGS(8)},
j AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(list_cosine_similarity(
          (SELECT embedding::DOUBLE[] FROM embeddings x WHERE x.vec_id = a.vec_id),
          (SELECT embedding::DOUBLE[] FROM embeddings y WHERE y.vec_id = b.vec_id)), 6) AS sim
      FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id)
SELECT id_a, id_b, sim FROM j WHERE sim >= 0.3 ORDER BY 1, 2"""


def main(outdir, sfdir, only=None):
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    ok = fail = 0
    for name, sql in ORACLES.items():
        if only and name not in only:
            continue
        try:
            sp = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
            du = con.execute(sql)
            du_rows, du_cols = du.fetchall(), [d[0] for d in du.description]
            a, ca = table(sp_rows, sp_cols)
            b, cb = table(du_rows, du_cols)
            if ca != cb:
                print(f"FAIL {name}: columns {ca} vs {cb}"); fail += 1
            elif a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: {len(a)} vs {len(b)} rows; first diffs: {diff}"); fail += 1
            else:
                print(f"  ok {name} ({len(a)} rows)"); ok += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); fail += 1
    print(f"{ok} ok, {fail} fail")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None)
