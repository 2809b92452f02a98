package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}

/** Dev-time job/stage counter under the bench session profile: runs the
  * named queries once warm, once counted, and prints jobs/stages/tasks
  * per query — the round-floor attribution tool for the iterative
  * family (a round's cost at bench scale is often driver job latency,
  * not data volume; this makes that visible).
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += e.stageInfo.numTasks
      }
    })
    args.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count() // warm (tables cache + JIT)
      Thread.sleep(500)
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(f"[jobcount] $n%-28s jobs=$jobs stages=$stages tasks=$tasks wall=$t%.3f s")
    }
    spark.stop()
  }
}
