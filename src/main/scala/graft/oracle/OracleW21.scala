package graft.oracle

/** Round-12 wave oracle SQL — validated DuckDB equivalents per SURVEY
  * §2.4. Same conventions as [[OracleW18]]–[[OracleW20]].
  */
object OracleW21 {

  val sql: Map[String, String] = Map(
    // round 12: the SERVED-index face of ann_ivf_topk — the Spark side
    // probes a persistent CowTable index (built once per data dir by
    // the same seeded, 1e-3-quantized k-means), so the pair shares ONE
    // oracle verbatim: the index contract is identical, only where the
    // build cost is paid differs (per invocation vs per corpus
    // version).
    "ann_ivf_persistent" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] ve FROM embeddings),
  c0 AS (SELECT vec_id cid, embedding::DOUBLE[] ce FROM embeddings WHERE vec_id < 16),
  a1 AS (SELECT vec_id, cell FROM (
         SELECT v.vec_id, c0.cid cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY list_cosine_similarity(v.ve, c0.ce) DESC, c0.cid) rr
         FROM v CROSS JOIN c0) WHERE rr = 1),
  m1 AS (SELECT a1.cell, r.i pos, round(avg(v.ve[r.i])*1000)/1000 mval
         FROM a1 JOIN v USING (vec_id), range(1,65) r(i) GROUP BY a1.cell, r.i),
  c1 AS (SELECT cell cid, list(mval ORDER BY pos) ce FROM m1 GROUP BY cell),
  a2 AS (SELECT vec_id, cell FROM (
         SELECT v.vec_id, c1.cid cell,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY list_cosine_similarity(v.ve, c1.ce) DESC, c1.cid) rr
         FROM v CROSS JOIN c1) WHERE rr = 1),
  m2 AS (SELECT a2.cell, r.i pos, round(avg(v.ve[r.i])*1000)/1000 mval
         FROM a2 JOIN v USING (vec_id), range(1,65) r(i) GROUP BY a2.cell, r.i),
  c2 AS (SELECT cell cid, list(mval ORDER BY pos) ce FROM m2 GROUP BY cell),
  assign AS (SELECT vec_id, cell FROM (
             SELECT v.vec_id, c2.cid cell,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY list_cosine_similarity(v.ve, c2.ce) DESC, c2.cid) rr
             FROM v CROSS JOIN c2) WHERE rr = 1),
  q AS (SELECT vec_id qid, ve qe FROM v WHERE vec_id < 10),
  probes AS (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY list_cosine_similarity(qe, ce) DESC, cid) pr
    FROM q CROSS JOIN c2),
  cand AS (
    SELECT q.qid, a.vec_id n, list_cosine_similarity(q.qe, v.ve) s
    FROM q JOIN probes p ON p.qid = q.qid AND p.pr <= 4
    JOIN assign a ON a.cell = p.cid
    JOIN v ON v.vec_id = a.vec_id
    WHERE a.vec_id <> q.qid)
  SELECT qid q, n, rn FROM (SELECT qid, n, s, row_number() OVER (PARTITION BY qid ORDER BY s DESC, n) rn FROM cand) t
  WHERE rn <= 3 ORDER BY q, rn""",
  )
}
