package graft
import org.apache.spark.sql.catalyst.rules.RuleExecutor
object DissectB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("recon_leg_match", "stream_running_count", "join_asof_last_signup")
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count()) // warm
    RuleExecutor.resetMetrics()
    for (_ <- 1 to 5; n <- names) SparkEntry.queries(n)(spark, sfDir).count()
    println(RuleExecutor.dumpTimeSpent().linesIterator.take(30).mkString("\n"))
    spark.stop()
  }
}
