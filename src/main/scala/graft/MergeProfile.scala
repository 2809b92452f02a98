package graft

import org.apache.spark.sql.functions._

/** Scratch micro-profiler for the [[graft.ops.IncrementalDedup]] index
  * merge (r18, VERDICT r17 task 6): splits one ingest batch's
  * CowTable.merge wall into touched-file detection vs the write+commit
  * machinery, against the prepared bench environment.
  */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    spark.sparkContext.setLogLevel("ERROR")
    val (corpus, index) = graft.ops.IncrementalDedup.ingestEnvOf(spark, sfDir)
    import graft.sinks.CowTable
    def t[T](n: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"[mp] $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    (1 to 3).foreach { _ =>
      val fromV = graft.ops.IncrementalDedup.indexedVersion(index)
      val toV = CowTable.currentVersion(corpus)
      val feed = t("changes+select")(CowTable.changes(spark, corpus, "doc_id",
        fromV, toV)
        .select(col("doc_id"),
          concat_ws("", col("lang"), col("source")).as("block"),
          col("text")).localCheckpoint())
      val sigs = t("signatures")(
        graft.ops.IncrementalDedup.signatures(feed).localCheckpoint())
      val base = CowTable.currentVersion(index)
      val current = CowTable.snapshotFiles(index, Some(base))
      val keys = sigs.select(col("doc_id")).distinct()
      val touched = t("touchDetect")(
        spark.read.option("mergeSchema", "true").parquet(current: _*)
          .withColumn("__f", input_file_name())
          .select(col("__f").as("f"), col("doc_id"))
          .join(broadcast(keys), "doc_id").select("f").distinct().collect().length)
      println(s"[mp] touched=$touched files=${current.size}")
      val merged = t("fullMerge")(CowTable.merge(spark, index, sigs, "doc_id"))
      println(s"[mp] merged v$merged")
    }
    spark.stop()
  }
}
