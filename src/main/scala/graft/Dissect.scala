package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev scratch: dissect the events-family bench floor — times primitive
  * shapes over the cached events table vs lineitem to localize the
  * round-7 family-wide shift (VERDICT r7 task 1).
  */
object Dissect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchHarness.session()
    import graft.tables.Tables
    val ev = Tables.t(spark, sfDir, "events")
    val li = Tables.t(spark, sfDir, "lineitem")

    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.name.take(40), si.numTasks,
          si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000))
      }
    })

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      stages.clear()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val st = stages.groupBy(_._1).map { case (n, xs) =>
        f"$n tasks=${xs.head._2} run=${xs.map(_._3).sum / 5}ms cpu=${xs.map(_._4).sum / 5}ms"
      }.mkString(" | ")
      println(f"[dissect] $name%-30s best=${ts.min}%.4f  $st")
    }
    time("ev.count")(ev.count())
    time("li.count")(li.count())
    time("ev groupBy(user).count")(ev.groupBy("user_id").count().count())
    time("ev filter typed")(ev.filter(col("event_type") === "signup").count())
    spark.stop()
  }
}
