package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg (dev only; the driver always passes 2): comma-
    // separated query names — run and dump just those, so iterating on
    // a new operator doesn't re-run the whole battery.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def keep(n: String) = only.forall(_.contains(n))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // The battery is ~230 sub-second queries whose wall time is dominated
    // by per-job fixed costs (planning, parquet commit protocol), not
    // compute — serial execution wastes 30 of 32 cores and risks the
    // driver's deadline truncating the dump (r6 recorded 169/227).
    // Submit from a small thread pool so jobs overlap; Spark sessions
    // are thread-safe for concurrent job submission. Core-contract
    // queries are enqueued first so a truncated run still proves the
    // §2.3 surface.
    val workers = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt
    val ordered = SparkEntry.queries.toVector.sortBy { case (n, _) =>
      (if (Bench.core58(n)) 0 else 1, n)
    }
    // Materialize the table registry on THIS thread before fanning out:
    // parquet schema inference consults SQLConf through the active-
    // session thread-local, so a pool thread doing the first `events`
    // read would miss the session's `nanosAsLong` conf and read
    // TIMESTAMP(NANOS) wrong. After this, workers only hit the cache.
    graft.tables.Tables.names.foreach { n =>
      graft.tables.Tables.t(spark, sfDir, n)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(workers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = ordered.collect { case (name, fn) if keep(name) =>
      scala.concurrent.Future {
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    futures.foreach(f =>
      scala.concurrent.Await.ready(f, scala.concurrent.duration.Duration.Inf))
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
