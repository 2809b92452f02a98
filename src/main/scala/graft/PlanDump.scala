package graft

/** Dev tool: print a query's plan. Default = physical-plan skeleton
  * (joins/exchanges/scans/aggregates) + a quick 3-run timing at sf0.1;
  * `-l` = the full optimized LOGICAL plan (for writing/debugging
  * optimizer rules); `-x` = full physical tree. An optional trailing
  * sf dir overrides /root/testdata/sf0.1.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("-")).toSet
    val rest = args.filterNot(_.startsWith("-"))
    val name = rest(0)
    val sfDir = rest.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (flags("-l")) {
      println(df.queryExecution.optimizedPlan.treeString)
    } else if (flags("-x")) {
      df.count()
      println(df.queryExecution.executedPlan.treeString)
    } else {
      df.count()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") || l.contains("Aggregate"))
        .mkString("\n"))
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
