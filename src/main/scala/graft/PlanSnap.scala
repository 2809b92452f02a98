package graft

import java.nio.file.{Files, Paths}

/** Batch plan capture for the optimization-round evidence trail: write
  * `explain("formatted")` for each named query to
  * `<outDir>/<name>_<tag>.txt` in ONE JVM (PlanDump is one query per
  * JVM — too slow for a dozen queries × before/after).
  *
  * Usage: runMain graft.PlanSnap <outDir> <tag> <name>[,<name>...]
  * Uses the bench session profile so the captured plans are the ones
  * the bench actually times.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toVector
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
        println(s"[plansnap] wrote $n")
      } catch {
        case e: Throwable => System.err.println(s"[plansnap] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
