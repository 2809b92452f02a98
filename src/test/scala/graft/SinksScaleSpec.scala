package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Scale
import graft.sinks.Sinks
import graft.streaming.StreamOps.Evt

/** Write-side layout + skew tests: partition pruning, shuffle-free
  * bucketed joins, KTable-style upsert materialization, salted joins.
  */
class SinksScaleSpec extends SparkSpecBase {

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString

  test("partitioned write prunes partitions on read") {
    val orders = graft.tables.Tables.t(spark, sf, "orders")
    val path = s"$tmp/orders_part"
    Sinks.writePartitioned(orders, path, "o_orderstatus")
    val read = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.contains("o_orderstatus"), plan.take(500))
    assert(read.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val orders = graft.tables.Tables.t(spark, sf, "orders")
    val path = s"$tmp/orders_dynpart"
    Sinks.writePartitioned(orders, path, "o_orderstatus")
    val before = spark.read.parquet(path)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // re-run "one day": only the F partition, halved — a static
    // overwrite would truncate O and P; dynamic must keep them
    val rerun = orders.filter(col("o_orderstatus") === "F")
      .filter(col("o_orderkey") % 2 === 0)
    Sinks.overwritePartitionsDynamic(rerun, path, "o_orderstatus")
    val after = spark.read.parquet(path)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("F") == rerun.count())
    assert(after.view.filterKeys(_ != "F").toMap ==
           before.view.filterKeys(_ != "F").toMap)
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    val orders = graft.tables.Tables.t(spark, sf, "orders")
    val path = s"$tmp/orders_dpp"
    Sinks.writePartitioned(orders, path, "o_orderstatus")
    val fact = spark.read.parquet(path)
    // dim carries the filterable attribute; the fact-side partition
    // filter can only be known at RUNTIME (after the dim scan), which
    // is exactly what DPP inserts. The dim must be a real source scan
    // (a LocalRelation is constant-foldable, so no DPP is needed)
    Seq(("F", "closed"), ("O", "open"), ("P", "pending"))
      .toDF("st", "phase").write.mode("overwrite").parquet(s"$tmp/dpp_dim")
    val dim = spark.read.parquet(s"$tmp/dpp_dim")
    val j = fact.join(dim, col("o_orderstatus") === col("st"))
      .where(col("phase") === "closed")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(1500))
    assert(j.count() == orders.filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed tables join without a shuffle") {
    // warehouse dir is a static conf, set in SparkSpecBase
    val c = graft.tables.Tables.t(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_mktsegment")
    val o = graft.tables.Tables.t(spark, sf, "orders")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    Sinks.writeBucketed(c, "cust_b", "c_custkey", 4)
    Sinks.writeBucketed(o, "ord_b", "c_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("cust_b").join(spark.table("ord_b"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(800)}")
      assert(joined.count() == c.join(o, "c_custkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("upsert sink keeps latest row per key across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[Evt]
    val path = s"$tmp/ktable"
    val q = Sinks.upsertParquet(stream.toDF(), path, s"$tmp/ktable_ckpt",
                                "user_id", "ts")
    stream.addData(
      Evt(1, ts("2024-01-01 10:00:00"), 1, "signup", 1.0, "{}"),
      Evt(2, ts("2024-01-01 10:05:00"), 2, "signup", 2.0, "{}"))
    q.processAllAvailable()
    stream.addData(
      Evt(3, ts("2024-01-01 11:00:00"), 1, "purchase", 9.0, "{}")) // newer for user 1
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(path)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L, 2L -> 2L), "latest event per user wins")
  }

  test("compaction rewrites many small files into few, rows intact") {
    val path = s"$tmp/events_small"
    val events = graft.tables.Tables.t(spark, sf, "events")
    events.repartition(50).write.mode("overwrite").parquet(path)
    def dataFiles() = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(dataFiles() == 50)
    val before = spark.read.parquet(path)
      .agg(sum("event_id"), count(lit(1))).collect().head
    Sinks.compactParquet(spark, path, 4)
    assert(dataFiles() == 4, s"expected 4 files, got ${dataFiles()}")
    val after = spark.read.parquet(path)
      .agg(sum("event_id"), count(lit(1))).collect().head
    assert(before == after)
  }

  test("z-ordered layout narrows per-file ranges on BOTH clustering columns") {
    val orders = graft.tables.Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
              (unix_timestamp(col("o_orderdate")) / 86400).cast("long").as("d"))
    val files = 16
    // per-file average span of a column, as a fraction of its domain
    def spans(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
      val domain = df.agg((max(col(c)) - min(col(c))).cast("double")).collect().head.getDouble(0)
      val per = df.groupBy(input_file_name())
        .agg(((max(col(c)) - min(col(c))).cast("double") / domain).as("frac"))
        .agg(avg("frac")).collect().head.getDouble(0)
      per
    }
    // baseline: single-column (date) sort — each file spans ~all custkeys
    val datePath = s"$tmp/orders_datesorted"
    orders.repartitionByRange(files, col("d")).sortWithinPartitions("d")
      .write.mode("overwrite").parquet(datePath)
    // z-order on (d, custkey)
    val zPath = s"$tmp/orders_zorder"
    Sinks.writeZordered(orders, zPath, files, col("d"), col("o_custkey"))
    val (zd, zc) = (spans(zPath, "d"), spans(zPath, "o_custkey"))
    val (bd, bc) = (spans(datePath, "d"), spans(datePath, "o_custkey"))
    // the date-sorted layout leaves custkey unclustered (~full domain
    // per file); z-order must narrow custkey substantially while
    // keeping date spans bounded
    assert(bc > 0.9, s"baseline custkey span should be ~1.0, got $bc")
    assert(zc < 0.5 * bc, s"z-order custkey span $zc vs baseline $bc")
    assert(zd < 0.5, s"z-order date span should stay bounded, got $zd")
    // rows intact
    assert(spark.read.parquet(zPath).count() == orders.count())
  }

  test("manifest file-skipping opens a fraction of the files, result identical") {
    val orders = graft.tables.Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
              (unix_timestamp(col("o_orderdate")) / 86400).cast("long").as("d"))
    val path = s"$tmp/orders_manifest"
    val files = 16
    orders.repartitionByRange(files, col("d")).sortWithinPartitions("d")
      .write.mode("overwrite").parquet(path)
    Sinks.writeManifest(spark, path, "d")
    // a narrow date band should hit ~1-2 of the 16 range-partitioned files
    val dLo = orders.agg(min("d")).collect().head.getLong(0).toDouble
    val (pruned, opened) = Sinks.readSkipping(spark, path, "d", dLo, dLo + 30)
    assert(opened < files / 2, s"opened $opened of $files files")
    val full = spark.read.parquet(path)
      .filter(col("d") >= dLo && col("d") <= dLo + 30)
    assert(pruned.agg(count(lit(1)), sum("o_orderkey")).collect().head ==
           full.agg(count(lit(1)), sum("o_orderkey")).collect().head)
    // empty band prunes everything without failing
    val (none, zero) = Sinks.readSkipping(spark, path, "d", -10000, -9999)
    assert(zero == 0 && none.count() == 0)
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true in the plan)") {
    import spark.implicits._
    // 200k rows on ONE hot key + 100 rows spread over 100 keys, joined
    // to a 101-key dim: without AQE the hot key lands on one reducer
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200100L).select(
        when(col("id") < 200000L, 0L).otherwise(col("id") % 100 + 1).as("k"),
        col("id").as("payload"))
      val dim = spark.range(101L).select(col("id").as("k"), (col("id") * 7).as("w"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS DataFrame's adaptive plan (count()
      // would run a different one and leave this isFinalPlan=false)
      assert(joined.collect().length == 200100)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE skew split missing from final plan:\n" + p.take(1500))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("salted join equals plain join on a skewed key") {
    val e = graft.tables.Tables.t(spark, sf, "events")
      .select("event_id", "user_id") // user_id skew stand-in
    val dim = graft.tables.Tables.t(spark, sf, "events")
      .select(col("user_id")).distinct()
      .withColumn("user_name", concat(lit("u"), col("user_id")))
    val plain = e.join(dim, Seq("user_id"))
    val salted = Scale.saltedJoin(e, dim, "user_id", 8)
    assert(salted.count() == plain.count())
    val a = plain.agg(sum("event_id")).collect().head.getLong(0)
    val b = salted.agg(sum("event_id")).collect().head.getLong(0)
    assert(a == b)
  }
}
