package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.1")
    df.count()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") || l.contains("Aggregate"))
      .mkString("\n"))
    // quick timing
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.1").count()
      println(f"run $i: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
