package graft.oracle

/** Round-11 wave oracle SQL — validated DuckDB equivalents per SURVEY
  * §2.4. Same conventions as [[OracleW18]]/[[OracleW19]]: integer
  * cents via round(x*100), ppm via truncating `//` (truncates toward
  * zero exactly like Spark's `div`), HUGEINT mirroring DECIMAL(38)
  * for >2⁶³ intermediate products, bounded-domain lists for medians.
  */
object OracleW20 {

  val sql: Map[String, String] = Map(
    // round 11: like-for-like ingest-only face of the incremental
    // dedup component (VERDICT r10 task 6) — the SAME contract as
    // `dedup_incremental_ingest` (the prepared-environment Spark side
    // emits identical pairs; DuckDB's one restricted join never paid
    // the environment build either way, which is what made the
    // composite row misread)
    "dedup_ingest_only" ->
      """WITH toks AS (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) tk FROM documents)
  SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
  ON a.lang=b.lang AND a.source=b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.tk,b.tk))::DOUBLE / len(list_distinct(a.tk || b.tk)) >= 0.9
    AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
  ORDER BY 1,2 LIMIT 2000""",
  )
}
