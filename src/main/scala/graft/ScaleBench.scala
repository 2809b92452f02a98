package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-crossover experiment for the near-dup operators: replicates
  * the sf0.1 documents 20× (~100k docs) with per-copy unique token
  * suffixes (8 fresh tokens ⇒ cross-copy Jaccard ≈ 0.76 < 0.9, so the
  * true-pair structure stays sparse while candidate volume grows), then
  * times the O(n²)-blocked exact join vs the MinHash-LSH path on the
  * same data. Writes the corpus to /tmp; results recorded in PLANS.md.
  *
  * Run: `sbt "runMain graft.ScaleBench"`
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = "/tmp/graft_scalebench"
    val copies = 20
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = base
      .crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select(
        (col("doc_id") * copies + col("copy")).as("doc_id"),
        // copy 0 keeps the original text (the true near-dup pairs
        // survive); copies > 0 get 8 unique tokens, dropping their
        // cross-copy Jaccard to ~0.76 — below the 0.9 threshold but
        // ABOVE what banding tuned for recall-1@0.9 rejects, i.e. the
        // candidate-flood worst case for LSH on this tiny-vocab corpus
        when(col("copy") === 0, col("text")).otherwise(
          concat(col("text"),
            concat_ws("", (0 until 8).map(i =>
              concat(lit(s" u${i}_"), col("doc_id") * copies + col("copy"))): _*)))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    big.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    println(s"[scalebench] corpus: $n docs")

    def time(name: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scalebench] $name%-22s rows=$c%6d  ${sec}%8.2f s")
      (c, sec)
    }
    val (rowsExact, tExact) = time("dedup_near_jaccard")
    val (rowsLsh, tLsh) = time("dedup_minhash_lsh")
    println(f"[scalebench] speedup exact/lsh = ${tExact / tLsh}%.1f x; " +
      s"equal results = ${rowsExact == rowsLsh}")
    spark.stop()
  }
}
