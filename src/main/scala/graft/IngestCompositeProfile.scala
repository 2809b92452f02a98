package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup
import graft.sinks.CowTable

/** Stage attribution for the COMPOSITE `dedup_incremental_ingest`
  * bench row (corpus create + index build + batch merge + ingest, all
  * in the timed body — the end-to-end correctness face, unlike
  * `dedup_ingest_only`'s prepared environment): best-of-N walls per
  * stage, so the row's cost splits into environment build vs the
  * actual ingest.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IngestCompositeProfile"
  */
object IngestCompositeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "text")
    docs.count() // warm the table cache, as the bench warm pass would
    val passes = 4
    val best = scala.collection.mutable.Map.empty[String, Double]
    (0 to passes).foreach { p =>
      val walls = scala.collection.mutable.Map.empty[String, Double]
      def timed[T](stage: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        walls(stage) = walls.getOrElse(stage, 0.0) + (System.nanoTime() - t0) / 1e9
        r
      }
      val t0 = System.nanoTime()
      val dir = Files.createTempDirectory("graft_incdedup_prof").toString
      val corpus = s"$dir/corpus"
      val index = s"$dir/index"
      timed("corpusCreate")(
        CowTable.create(docs.filter(col("doc_id") % 5 =!= 0), corpus))
      timed("buildIndex")(
        IncrementalDedup.buildIndex(spark, corpus, index, Seq("lang", "source")))
      timed("batchMerge")(
        CowTable.merge(spark, corpus, docs.filter(col("doc_id") % 5 === 0), "doc_id"))
      val pairs = timed("ingestEager") {
        val st = IncrementalDedup.ingestStaged(spark, corpus, index,
          Seq("lang", "source"),
          (stage, sec) => walls(s"ingest.$stage") =
            walls.getOrElse(s"ingest.$stage", 0.0) + sec)
        st.commit(); st.pairs
      }
      timed("pairsAction")(pairs.orderBy("a_id", "b_id").limit(2000).count())
      walls("TOTAL") = (System.nanoTime() - t0) / 1e9
      if (p > 0) // pass 0 is warm-up
        walls.foreach { case (k, v) =>
          best(k) = math.min(best.getOrElse(k, Double.MaxValue), v) }
    }
    best.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      println(f"[compositeprofile] $k%-14s $v%6.3f s (best of $passes)") }
    spark.stop()
  }
}
