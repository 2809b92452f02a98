package graft

import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup
import graft.sinks.CowTable

/** Stage-parameterized attribution for the `dedup_ingest_only` bench
  * row (VERDICT r15 task 7): best-of-N walls for the staged ingest,
  * split into its eager stages (change-feed upsert scan, signature +
  * index merge commit, delete scan, band-literal collect) and the lazy
  * probe+verify tail (end-to-end minus the eager stages). Same
  * prepared environment the bench row uses; the marker never advances,
  * so every pass re-derives the same batch.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IngestProfile"
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    spark.sparkContext.setLogLevel("ERROR")
    // build the prepared environment exactly like the bench row
    SparkEntry.queries("dedup_ingest_only")(spark, sfDir).count()
    val passes = 5
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to passes).foreach { _ =>
      val walls = scala.collection.mutable.Map.empty[String, Double]
      val t0 = System.nanoTime()
      // the env is memoized per dir — re-derive corpus/index paths by
      // re-running the staged ingest through the instrumented seam
      val df = {
        val docs = graft.tables.Tables.t(spark, sfDir, "documents")
        docs.count() // keep the table cache warm outside the timing
        IncrementalDedupProfiler.run(spark, sfDir, (st, s) =>
          walls(st) = walls.getOrElse(st, 0.0) + s)
      }
      df.orderBy("a_id", "b_id").limit(2000).collect()
      val total = (System.nanoTime() - t0) / 1e9
      walls("TOTAL") = total
      walls("probe+verify(tail)") =
        total - walls.filterNot(_._1 == "TOTAL").values.sum
      walls.foreach { case (k, v) =>
        best(k) = math.min(best.getOrElse(k, Double.MaxValue), v) }
    }
    best.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      println(f"[ingestprofile] $k%-22s $v%6.3f s (best of $passes)") }
    spark.stop()
  }
}

private object IncrementalDedupProfiler {
  def run(spark: org.apache.spark.sql.SparkSession, d: String,
          onStage: (String, Double) => Unit): org.apache.spark.sql.DataFrame = {
    val (corpus, index) = IncrementalDedup.ingestEnvOf(spark, d)
    IncrementalDedup.ingestStaged(spark, corpus, index,
      Seq("lang", "source"), onStage).pairs
  }
}
