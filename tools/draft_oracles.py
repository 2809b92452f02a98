#!/usr/bin/env python3
"""Validate draft oracle SQL for the pipeline queries on sf0.01 + sf0.1."""
import sys, duckdb

NGRAM = """
WITH tk AS (SELECT doc_id, lang, source, string_split(text,' ') t FROM documents),
sh AS (SELECT doc_id, lang, source,
  list_distinct(list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) s
  FROM tk)
SELECT a.doc_id a_id, b.doc_id b_id FROM sh a JOIN sh b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s,b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8
  ORDER BY 1,2 LIMIT 2000
"""

LANGID = """
WITH sc AS (SELECT lang,
    len(list_filter(string_split(text,' '), t -> t IN ('table','query','join'))) s_en,
    len(list_filter(string_split(text,' '), t -> t IN ('window','group','sort'))) s_de,
    len(list_filter(string_split(text,' '), t -> t IN ('scan','filter','merge'))) s_es,
    len(list_filter(string_split(text,' '), t -> t IN ('stream','batch','row'))) s_fr,
    len(list_filter(string_split(text,' '), t -> t IN ('vector','hash','key'))) s_zh
  FROM documents),
p AS (SELECT lang, CASE
    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
    WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END predicted
  FROM sc)
SELECT lang, predicted, CAST(count(*) AS BIGINT) c FROM p GROUP BY 1,2 ORDER BY 1,2
"""

QUALITY = """
WITH d AS (SELECT lang,
    len(string_split(text,' ')) n_tok,
    len(list_filter(string_split(text,' '), t -> t IN ('a','the'))) n_stop
  FROM documents)
SELECT lang,
  CAST(count(*) AS BIGINT) n_docs,
  CAST(sum(CAST(round(1000*(0.5*(least(n_tok,50)/50.0) + 0.5*(1.0 - n_stop*1.0/n_tok))) AS BIGINT)) AS BIGINT) quality_milli
FROM d GROUP BY 1 ORDER BY 1
"""

FINGERPRINT = """
WITH tk AS (SELECT doc_id, string_split(text,' ') t, md5(text) fp FROM documents)
SELECT doc_id, fp,
  list_min(list_transform(generate_series(1, len(t)-2), i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) fp_shingle
FROM tk ORDER BY doc_id LIMIT 500
"""

MULTIMODAL = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) n_bytes,
  CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) width,
  CAST((octet_length(encode(text)) // 64) % 64 + 1 AS BIGINT) height,
  CAST((doc_id * 7 + octet_length(encode(text))) % 256 AS BIGINT) mean_px
FROM documents ORDER BY doc_id LIMIT 500
"""

ANN_IVF = """
WITH c AS (SELECT vec_id cid, embedding::DOUBLE[] ce FROM embeddings WHERE vec_id < 16),
v AS (SELECT vec_id, embedding::DOUBLE[] ve FROM embeddings),
assign AS (
  SELECT v.vec_id, arg_max(c.cid, list_cosine_similarity(v.ve, c.ce)) cell
  FROM v CROSS JOIN c GROUP BY v.vec_id),
q AS (SELECT vec_id qid, ve qe FROM v WHERE vec_id < 10),
probes AS (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY list_cosine_similarity(qe, ce) DESC, cid) pr
  FROM q CROSS JOIN c),
cand AS (
  SELECT q.qid, a.vec_id n, list_cosine_similarity(q.qe, v.ve) s
  FROM q JOIN probes p ON p.qid = q.qid AND p.pr <= 4
  JOIN assign a ON a.cell = p.cid
  JOIN v ON v.vec_id = a.vec_id
  WHERE a.vec_id <> q.qid)
SELECT qid q, n, rn FROM (SELECT qid, n, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, n) rn FROM cand) t
WHERE rn <= 3 ORDER BY q, rn
"""

for sf in ["0.01", "0.1"]:
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf{sf}/{t}.parquet')")
    for name, sql in [("ngram", NGRAM), ("langid", LANGID), ("quality", QUALITY),
                      ("fingerprint", FINGERPRINT), ("multimodal", MULTIMODAL), ("ann_ivf", ANN_IVF)]:
        try:
            rows = con.execute(sql).fetchall()
            print(f"sf{sf} {name}: {len(rows)} rows, head={rows[:2]}")
        except Exception as e:
            print(f"sf{sf} {name}: ERROR {e}")
