package graft

/** Dev-time single-query timer: best-of-N under the bench session
  * profile for the query names given as args — the local rehearsal of
  * one BENCH row without running the whole battery.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    val timed = SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val run = BenchHarness.measure(spark, sfDir, timed, passes = 5)
    run.best.toSeq.sortBy(_._1).foreach { case (n, t) => println(f"[timeq] $n%-28s $t%.3f s") }
    run.errors.toSeq.sortBy(_._1).foreach { case (n, e) => println(s"[timeq] $n ERROR $e") }
    spark.stop()
  }
}
