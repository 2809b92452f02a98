package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Evt

/** Layer-3 streaming-semantics tests (SURVEY.md §5.2/§2.5): clock-
  * controlled MemoryStream feeds — the Spark analogue of the
  * TopologyTestDriver pattern. Event time is explicit; watermark
  * advancement is driven by the max event time of the previous batch.
  */
class StreamingSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def evt(id: Long, t: String, user: Long = 1L,
                  tpe: String = "click", v: Double = 1.0): Evt =
    Evt(id, ts(t), user, tpe, v, """{"k":1}""")

  private var sinkId = 0
  private def nextSink(): String = { sinkId += 1; s"sink_$sinkId" }

  /** Run a streaming query over a MemoryStream, feeding batches in
    * order (processAllAvailable between), return the sink table.
    */
  private def run(batches: Seq[Seq[Evt]], mode: String)
                 (topology: DataFrame => DataFrame): DataFrame = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Evt]
    val sink = nextSink()
    val q = topology(stream.toDF())
      .writeStream.format("memory").queryName(sink).outputMode(mode).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(sink)
  }

  test("appendStream end-to-end: micro-batches land as transactional appends, restart continues") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_appstream").toString
    val table = s"$dir/events_table"
    val ckpt = s"$dir/ckpt"
    val stream = MemoryStream[Evt]
    val q = graft.sinks.Sinks.appendStream(stream.toDF(), table, ckpt, appId = "evt-ingest")
    stream.addData(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    stream.addData(evt(3, "2024-01-02 10:00:00"))
    q.processAllAvailable()
    q.stop()
    val cow = graft.sinks.CowTable
    assert(cow.read(spark, table).count() == 3)
    assert(cow.txnVersion(table, "evt-ingest") == 1L, "two batches committed")
    // restart from the same checkpoint (same source, new query):
    // continues the batch-id sequence — no replayed duplicates
    val q2 = graft.sinks.Sinks.appendStream(stream.toDF(), table, ckpt, appId = "evt-ingest")
    stream.addData(evt(4, "2024-01-03 10:00:00"))
    q2.processAllAvailable()
    q2.stop()
    val ids = cow.read(spark, table).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L), s"restart must continue exactly-once: $ids")
    assert(cow.txnVersion(table, "evt-ingest") == 2L)
  }

  test("streamed appends record file stats: a streaming-built table prunes at the manifest") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_appstats").toString
    val table = s"$dir/t"
    val cow = graft.sinks.CowTable
    val stream = MemoryStream[Evt]
    val q = graft.sinks.Sinks.appendStream(stream.toDF(), table, s"$dir/ckpt",
      appId = "stats-ingest")
    stream.addData(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 11:00:00"))
    q.processAllAvailable()
    // declare AFTER the first batch created the table: backfills the
    // existing file; every SUBSEQUENT streamed batch records its own
    // stats lines through the transactional append path
    cow.setStatsColumns(spark, table, Seq("event_id"))
    stream.addData(evt(100, "2024-01-02 10:00:00"), evt(101, "2024-01-02 11:00:00"))
    q.processAllAvailable()
    stream.addData(evt(200, "2024-01-03 10:00:00"))
    q.processAllAvailable()
    q.stop()
    // every file with ROWS carries stats (a zero-row batch-0 create
    // file legitimately has none — no group to aggregate — and the
    // pruner reads stats-less files unconditionally, so it stays safe)
    val stats = cow.fileStats(table).keySet
    assert(stats.subsetOf(cow.snapshotFiles(table).toSet) && stats.size >= 3,
      s"backfilled + streamed files must carry stats: $stats")
    val pruned = cow.prunedFilesRange(spark, table, "event_id", Some(200L), Some(300L))
    assert(pruned.size < cow.snapshotFiles(table).size,
      s"${pruned.size} of ${cow.snapshotFiles(table).size} — streamed table must file-skip")
    assert(cow.readPrunedRange(spark, table, "event_id", Some(200L), Some(300L))
      .select("event_id").as[Long].collect().toSeq == Seq(200L))
  }

  test("live stream-table enrichment: dimension updates between batches are visible to the next batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    val dim = s"$dir/dim"
    val out = s"$dir/out"
    val cow = graft.sinks.CowTable
    cow.create(Seq((1L, "basic"), (2L, "basic")).toDF("user_id", "tier"), dim)
    val stream = MemoryStream[Evt]
    val q = graft.sinks.Sinks.enrichAppendStream(
      stream.toDF().select(col("event_id"), col("user_id")), dim, "user_id",
      out, s"$dir/ckpt")
    stream.addData(evt(10, "2024-01-01 10:00:00", user = 1))
    q.processAllAvailable()
    // the dimension CHANGES: user 1 upgrades, user 3 appears
    cow.merge(spark, dim, Seq((1L, "gold"), (3L, "new")).toDF("user_id", "tier"), "user_id")
    stream.addData(evt(11, "2024-01-01 11:00:00", user = 1),
                   evt(12, "2024-01-01 11:00:00", user = 3),
                   evt(13, "2024-01-01 11:00:00", user = 99)) // no dim row
    q.processAllAvailable()
    q.stop()
    val rows = cow.read(spark, out)
      .select("event_id", "tier").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"))).toSet
    assert(rows == Set((10L, "basic"), (11L, "gold"), (12L, "new"), (13L, "-")),
      s"batch 1 must see the OLD tier, batch 2 the updated table: $rows")
  }

  test("dynamic-gap session window: a purchase holds the session open longer than a click") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // user 1: click 10:00, click 10:15 — 15 min > click's 10-min gap →
    //   TWO sessions; user 2: purchase 10:00, click 10:15 — inside the
    //   purchase's 30-min gap → ONE session of length 2. Sentinel
    //   closes the watermark.
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:00:00", user = 1, tpe = "click"),
          evt(2, "2024-01-01 10:15:00", user = 1, tpe = "click"),
          evt(3, "2024-01-01 10:00:00", user = 2, tpe = "purchase"),
          evt(4, "2024-01-01 10:15:00", user = 2, tpe = "click")),
      Seq(evt(9, "2024-01-02 00:00:00", user = 9))),
      "append")(df => StreamOps.sessionDynamicGap(df))
    val byUser = out.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("len")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byUser(1L) == Seq(1L, 1L), s"two 1-event click sessions: $byUser")
    assert(byUser(2L) == Seq(2L), s"purchase gap must absorb the click: $byUser")
    // batch face: the same expression sessionizes a static frame
    val batch = StreamOps.sessionDynamicGap(
      Seq(evt(1, "2024-01-01 10:00:00", user = 3, tpe = "purchase"),
          evt(2, "2024-01-01 10:20:00", user = 3, tpe = "click")).toDF())
      .collect()
    assert(batch.length == 1 && batch.head.getAs[Long]("len") == 2L)
  }

  test("watermark drops late data; append mode emits final windows only") {
    // batch1: two events on Jan 1; batch2 advances watermark far past
    // Jan 1 (event on Jan 5); batch3: a LATE Jan 1 event -> dropped.
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 11:00:00")),
      Seq(evt(3, "2024-01-05 00:00:00")),
      Seq(evt(4, "2024-01-01 12:00:00"))), // late
      "append")(df => StreamOps.tumblingDaily(df))
    val jan1 = out.filter(col("window.start") === ts("2024-01-01 00:00:00")).collect()
    assert(jan1.length == 1, "exactly one final emission for the Jan-1 window")
    assert(jan1.head.getAs[Long]("c") == 2, "late event must NOT be counted")
  }

  test("chained windowed aggregations: hourly partials roll into daily totals in ONE query") {
    // 3 events across 2 hours of Jan 1 + a Jan 3 event to close both
    // levels' watermarks: the daily row must fold BOTH hourly partials.
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:05:00"), evt(2, "2024-01-01 10:40:00"),
          evt(3, "2024-01-01 11:20:00")),
      Seq(evt(9, "2024-01-03 00:00:00"))), // advance watermark past Jan 1
      "append")(df => StreamOps.chainedHourlyDaily(df))
    val jan1 = out.filter(col("window.start") === ts("2024-01-01 00:00:00")).collect()
    assert(jan1.length == 1, out.collect().mkString("\n"))
    assert(jan1.head.getAs[Long]("c_day") == 3)
    assert(jan1.head.getAs[Long]("n_hours") == 2) // two distinct hourly partials
  }

  test("hopping windows assign events to both overlapping windows") {
    // one event at 10:15 in 60m/30m hopping windows -> windows starting
    // 09:30 and 10:00 each count it once (after watermark closes them)
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:15:00")),
      Seq(evt(9, "2024-01-02 00:00:00"))), // close the windows
      "append")(df => StreamOps.sliding1h30m(df))
    val starts = out.filter(col("c") === 1)
      .select(col("window.start").as("ws")).collect()
      .map(_.getTimestamp(0).toString).sorted.toSeq
    assert(starts.exists(_.startsWith("2024-01-01 09:30")) &&
           starts.exists(_.startsWith("2024-01-01 10:00")), starts.toString)
  }

  test("session windows merge across micro-batches") {
    // Events 10:00 and 10:10 arrive in batch1; 10:20 in batch2 — still
    // within the 30-minute gap, so ONE session of length 3 once closed.
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 10:10:00")),
      Seq(evt(3, "2024-01-01 10:20:00")),
      Seq(evt(9, "2024-01-02 00:00:00"))), // advance watermark to close it
      "append")(df => StreamOps.session30m(df))
    val sessions = out.filter(col("user_id") === 1 &&
      col("session_window.start") === ts("2024-01-01 10:00:00")).collect()
    assert(sessions.length == 1)
    assert(sessions.head.getAs[Long]("len") == 3)
  }

  test("dropDuplicatesWithinWatermark suppresses retransmits across batches") {
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:00:10"), evt(2, "2024-01-01 10:00:20")), // same (user,type,minute)
      Seq(evt(3, "2024-01-01 10:00:30"))), // retransmit again, same minute
      "append")(df => StreamOps.dedupKeys(df))
    assert(out.count() == 1, "one row per (user,type,minute) key")
  }

  test("stream-stream band join matches within 1h only") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val sink = nextSink()
    val q = StreamOps.bandJoin1h(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    clicks.addData(evt(1, "2024-01-01 10:00:00", user = 7, tpe = "click"))
    purchases.addData(
      evt(100, "2024-01-01 10:30:00", user = 7, tpe = "purchase"), // in band
      evt(101, "2024-01-01 12:00:00", user = 7, tpe = "purchase")) // out of band
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(sink).collect()
    assert(rows.map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purch_id"))).toSet
      == Set((1L, 100L)))
  }

  test("stream-stream LEFT OUTER band join: unmatched clicks emit NULL after the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val sink = nextSink()
    val q = StreamOps.bandJoinLeftOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    clicks.addData(
      evt(1, "2024-01-01 10:00:00", user = 7, tpe = "click"),   // will match
      evt(2, "2024-01-01 10:00:00", user = 8, tpe = "click"))   // never matches
    purchases.addData(evt(100, "2024-01-01 10:30:00", user = 7, tpe = "purchase"))
    q.processAllAvailable()
    // advance BOTH watermarks far past the band so click 2 is provably dead
    clicks.addData(evt(3, "2024-01-02 00:00:00", user = 9, tpe = "click"))
    purchases.addData(evt(101, "2024-01-02 00:00:00", user = 9, tpe = "purchase"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(sink).collect()
      .map(r => (r.getAs[Long]("click_id"),
                 Option(r.getAs[java.lang.Long]("purch_id")).map(_.toLong)))
      .toSet
    assert(got.contains((1L, Some(100L))), got.toString)   // matched pair
    assert(got.contains((2L, None)), got.toString)          // null-extended after eviction
  }

  test("stream-static enrichment join (KStream x KTable/GlobalKTable analogue)") {
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:00:00", user = 1),
          evt(2, "2024-01-01 10:01:00", user = 2),
          evt(3, "2024-01-01 10:02:00", user = 7)), // no dim row → dropped
      Seq(evt(4, "2024-01-01 10:03:00", user = 1))),
      "append")(df => df.join(dim, Seq("user_id")).select("event_id", "tier"))
    val got = out.collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier")).toMap
    assert(got == Map(1L -> "gold", 2L -> "silver", 4L -> "gold"))
  }

  test("running count in update mode accumulates across batches") {
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:00:00", user = 1), evt(2, "2024-01-01 10:01:00", user = 2)),
      Seq(evt(3, "2024-01-01 10:02:00", user = 1))),
      "update")(df => StreamOps.runningCount(df))
    // memory sink in update mode appends each update; take the LAST emission per key
    val latest = out.groupBy("user_id").agg(max("n_events").as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    assert(latest == Map(1L -> 2L, 2L -> 1L))
  }

  test("windowed top-k: update-mode counts + per-snapshot rank in foreachBatch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Evt]
    // serving view: merge each update-mode emission by (window, type)
    val latest = scala.collection.concurrent.TrieMap.empty[(Timestamp, String), Long]
    val mergeBatch: (DataFrame, Long) => Unit = (batch, _) =>
      batch.collect().foreach { r =>
        latest((r.getAs[Timestamp]("w"), r.getAs[String]("event_type"))) =
          r.getAs[Long]("c")
      }
    val q = StreamOps.topkWindowCounts(stream.toDF())
      .writeStream.outputMode("update").foreachBatch(mergeBatch).start()
    stream.addData(
      evt(1, "2024-01-01 09:00:00", tpe = "click"),
      evt(2, "2024-01-01 10:00:00", tpe = "click"),
      evt(3, "2024-01-01 11:00:00", tpe = "view"))
    q.processAllAvailable()
    stream.addData( // day-1 view overtakes click; day 2 opens
      evt(4, "2024-01-01 12:00:00", tpe = "view"),
      evt(5, "2024-01-01 13:00:00", tpe = "view"),
      evt(6, "2024-01-02 09:00:00", tpe = "purchase"))
    q.processAllAvailable()
    q.stop()
    val ranked = StreamOps.rankTopk(
        latest.toSeq.map { case ((w, t), c) => (w, t, c) }.toDF("w", "event_type", "c"), 2)
      .collect()
      .map(r => (r.getAs[Timestamp]("w"), r.getAs[String]("event_type"),
                 r.getAs[Long]("c"), r.getAs[Long]("rk"))).toSet
    assert(ranked == Set(
      (ts("2024-01-01 00:00:00"), "view", 3L, 1L),
      (ts("2024-01-01 00:00:00"), "click", 2L, 2L),
      (ts("2024-01-02 00:00:00"), "purchase", 1L, 1L)))
  }

  test("flatMapGroupsWithState running count equals batch groupBy") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Evt]
    val sink = nextSink()
    val q = StreamOps.runningCountStateful(stream.toDF().as[Evt])
      .toDF("user_id", "n")
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    val all = Seq(
      evt(1, "2024-01-01 10:00:00", user = 1), evt(2, "2024-01-01 10:01:00", user = 2),
      evt(3, "2024-01-01 10:02:00", user = 1), evt(4, "2024-01-01 10:03:00", user = 1))
    stream.addData(all.take(2)); q.processAllAvailable()
    stream.addData(all.drop(2)); q.processAllAvailable()
    q.stop()
    val latest = spark.table(sink).groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    val expected = all.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(latest == expected)
  }

  test("streaming reconciliation: matches emit in-window, watermark evicts unmatched") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val signups = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val sink = nextSink()
    val q = graft.streaming.StreamOps.reconStream(signups.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    // user 1: signup + purchase within 24h -> matched
    // user 2: signup, never purchases        -> unmatched_a after eviction
    // user 3: purchase, never signed up      -> unmatched_b after eviction
    signups.addData(evt(1, "2024-01-01 10:00:00", user = 1, tpe = "signup"),
                    evt(2, "2024-01-01 10:00:00", user = 2, tpe = "signup"))
    purchases.addData(evt(100, "2024-01-01 12:00:00", user = 1, tpe = "purchase"),
                      evt(101, "2024-01-01 12:00:00", user = 3, tpe = "purchase"))
    q.processAllAvailable()
    // advance BOTH watermarks far past the 24h join windows; the
    // watermark is computed from the previous batch's max event time
    // and outer-join eviction emits in a later batch, so feed several
    // advancing rounds (verified: emission lands within these).
    for (i <- 1 to 4) {
      signups.addData(evt(8L + i, s"2024-02-0$i 00:00:00", user = 99, tpe = "signup"))
      purchases.addData(evt(898L + i, s"2024-02-0$i 00:00:00", user = 99, tpe = "purchase"))
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table(sink)
      .filter((col("a_id").isNull || col("a_id") < 9) &&
              (col("b_id").isNull || col("b_id") < 899))
      .collect()
      .map(r => (r.getAs[String]("status"),
                 Option(r.getAs[java.lang.Long]("a_id")).map(_.toLong),
                 Option(r.getAs[java.lang.Long]("b_id")).map(_.toLong))).toSet
    assert(rows == Set(
      ("matched", Some(1L), Some(100L)),
      ("unmatched_a", Some(2L), None),
      ("unmatched_b", None, Some(101L))))
  }

  test("foreachBatch fanout: one query feeds raw + rollup sinks; replayed batch ids don't duplicate") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Evt]
    val dir = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    val q = graft.sinks.Sinks.fanoutParquet(
      stream.toDF(), s"$dir/raw", s"$dir/agg", s"$dir/ckpt")
    stream.addData(evt(1, "2024-01-01 10:00:00", user = 1, tpe = "click"),
                   evt(2, "2024-01-01 10:01:00", user = 2, tpe = "view"),
                   evt(3, "2024-01-01 10:02:00", user = 3, tpe = "click"))
    q.processAllAvailable()
    q.stop()
    val raw = spark.read.parquet(s"$dir/raw")
    assert(raw.count() == 3)
    val agg = spark.read.parquet(s"$dir/agg")
      .groupBy("event_type").agg(sum("c").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("click" -> 2L, "view" -> 1L))
    // a re-delivered batch id must overwrite its own directory, not append:
    // simulate by rewriting batch 0's raw output through the same path shape
    val batchDirs = new java.io.File(s"$dir/raw").list().count(_.startsWith("batch="))
    assert(batchDirs >= 1)
  }

  test("scd2 sink maintains versioned dimension history across batches, idempotently") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Evt]
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    val q = graft.sinks.Sinks.scd2Parquet(
      stream.toDF().select(col("user_id"), col("event_type"), col("ts")),
      s"$dir/dim", s"$dir/ckpt", "user_id", "ts")
    stream.addData(evt(1, "2024-01-01 10:00:00", user = 1, tpe = "signup"),
                   evt(2, "2024-01-01 11:00:00", user = 1, tpe = "click"),
                   evt(3, "2024-01-01 10:30:00", user = 2, tpe = "signup"))
    q.processAllAvailable()
    val h1 = spark.read.parquet(s"$dir/dim")
    assert(h1.count() == 3)
    assert(h1.filter(col("valid_to").isNull).count() == 2) // one open per key
    // batch 2: user 1 changes state again; the click version REPLAYS
    // (same key, same valid_from) and must not duplicate
    stream.addData(evt(2, "2024-01-01 11:00:00", user = 1, tpe = "click"),
                   evt(4, "2024-01-02 09:00:00", user = 1, tpe = "purchase"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(s"$dir/dim").collect().map { r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
       r.getAs[Timestamp]("valid_from").toString,
       Option(r.getAs[Timestamp]("valid_to")).map(_.toString))
    }.toSet
    assert(rows == Set(
      (1L, "signup", "2024-01-01 10:00:00.0", Some("2024-01-01 11:00:00.0")),
      (1L, "click", "2024-01-01 11:00:00.0", Some("2024-01-02 09:00:00.0")),
      (1L, "purchase", "2024-01-02 09:00:00.0", None),
      (2L, "signup", "2024-01-01 10:30:00.0", None)))
  }

  test("streaming ingest with online near-dup flagging: flags once, replay-safe") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.sinks.Sinks
    val dir = java.nio.file.Files.createTempDirectory("inc_stream").toString
    val stream = MemoryStream[(Long, String, String, String)]
    val q = Sinks.incrementalDedupPipeline(
      stream.toDF().toDF("doc_id", "lang", "source", "text"),
      s"$dir/corpus", s"$dir/index", s"$dir/pairs",
      Seq("lang", "source"), s"$dir/cp")
    // batch 1 bootstraps corpus + index
    stream.addData(
      (1L, "en", "web", "a b c d e f g h i j"),
      (2L, "en", "web", "k l m n o p q r s t"),
      (3L, "de", "web", "u v w x y z t1 t2 t3 t4"))
    q.processAllAvailable()
    // batch 2: doc 10 duplicates doc 1 (same block); doc 11 is fresh
    stream.addData(
      (10L, "en", "web", "a b c d e f g h i j"),
      (11L, "de", "web", "zz yy xx ww vv uu tt ss rr qq"))
    q.processAllAvailable()
    // batch 3: RE-DELIVERY of batch 2's exact content — the change feed
    // drops identical-content rewrites, so no second flag may appear
    stream.addData(
      (10L, "en", "web", "a b c d e f g h i j"),
      (11L, "de", "web", "zz yy xx ww vv uu tt ss rr qq"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.read.parquet(s"$dir/pairs")
    assert(pairs.count() == 1, pairs.collect().mkString(","))
    val row = pairs.collect().head
    assert((row.getAs[Long]("a_id"), row.getAs[Long]("b_id")) == (1L, 10L))
  }

  test("streaming ingest: bootstrap batch flags its own within-batch pairs (boundary invariance)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.sinks.Sinks
    val dir = java.nio.file.Files.createTempDirectory("inc_stream_boot").toString
    val stream = MemoryStream[(Long, String, String, String)]
    val q = Sinks.incrementalDedupPipeline(
      stream.toDF().toDF("doc_id", "lang", "source", "text"),
      s"$dir/corpus", s"$dir/index", s"$dir/pairs",
      Seq("lang", "source"), s"$dir/cp")
    // batch 1 CONTAINS a near-dup pair (docs 1/2, same block): before
    // round 10 these were silently never flagged because they arrived
    // in the bootstrap batch — the output depended on batch boundaries
    stream.addData(
      (1L, "en", "web", "a b c d e f g h i j"),
      (2L, "en", "web", "a b c d e f g h i j"),
      (3L, "de", "web", "u v w x y z t1 t2 t3 t4"))
    q.processAllAvailable()
    val boot = spark.read.parquet(s"$dir/pairs")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(boot == Set((1L, 2L)), s"bootstrap within-batch pair missing: $boot")
    // batch 2 duplicates doc 3 — the ingest path flags it as before
    stream.addData((10L, "de", "web", "u v w x y z t1 t2 t3 t4"))
    q.processAllAvailable()
    q.stop()
    val all = spark.read.parquet(s"$dir/pairs")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 2L), (3L, 10L)), s"got $all")
  }

  test("streaming CEP: per-day pattern matches emit final on day close, absorbing in-day reorder") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.patternCensusStream(stream.toDF().as[Evt])
        .toDF("user_id", "day", "pattern")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      // day 1 opens across two micro-batches; batch 2 lands EARLIER
      // in-day events for user 2 than batch 1 carried (reorder within
      // the watermark) — the path must still assemble in ts order
      stream.addData(
        evt(1, "2024-01-01 10:00:00", user = 1, tpe = "signup"),
        evt(2, "2024-01-01 10:05:00", user = 2, tpe = "error"),
        evt(3, "2024-01-01 10:05:30", user = 3, tpe = "view"))
      q.processAllAvailable()
      stream.addData(
        evt(4, "2024-01-01 10:30:00", user = 1, tpe = "click"),
        evt(5, "2024-01-01 10:40:00", user = 1, tpe = "purchase"),
        evt(6, "2024-01-01 10:04:45", user = 2, tpe = "view"), // in-day reorder
        evt(7, "2024-01-01 11:30:00", user = 2, tpe = "error"),
        evt(8, "2024-01-01 12:00:00", user = 3, tpe = "click"))
      q.processAllAvailable()
      // two sentinels: first advances the watermark past midnight, the
      // next batch fires the day-1 timers
      stream.addData(evt(90, "2024-01-02 00:10:00", user = 99, tpe = "view"))
      q.processAllAvailable()
      stream.addData(evt(91, "2024-01-03 00:10:00", user = 99, tpe = "view"))
      q.processAllAvailable()
      q.stop()
      val out = spark.table(sink).filter(col("user_id") < 90)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      // user 2's path is view>error>error (the reordered view sorts
      // FIRST) -> error_retry; had the reorder been lost the path
      // would still match, so also pin the emitted day + uniqueness
      assert(out == Set(
        (1L, "2024-01-01", "direct_buy"),
        (2L, "2024-01-01", "error_retry"),
        (3L, "2024-01-01", "browse_only")), out.toString)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stateful session merge: streaming closed sessions == batch session_window, boundary straddles a merge") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // batch 1 opens sessions; batch 2 events land INSIDE batch-1
      // sessions (the cross-micro-batch merge) and open a second
      // user-1 session; sentinels drive the watermark to close all
      val b1 = Seq(evt(1, "2024-01-01 10:00:00", user = 1),
                   evt(2, "2024-01-01 10:10:00", user = 1),
                   evt(3, "2024-01-01 10:12:00", user = 2))
      val b2 = Seq(evt(4, "2024-01-01 10:20:00", user = 1), // merges into 10:00 session
                   evt(5, "2024-01-01 11:30:00", user = 1), // new session
                   evt(6, "2024-01-01 10:30:00", user = 2)) // merges into 10:12 session
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.sessionStatsStream(stream.toDF().as[Evt])
        .toDF("user_id", "start_ms", "end_ms", "n_ev")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      Seq(b1, b2,
          Seq(evt(7, "2024-01-02 12:00:00", user = 99)),
          Seq(evt(8, "2024-01-03 12:00:00", user = 99)))
        .foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table(sink).filter(col("user_id") =!= 99)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin: the native session_window aggregation over the SAME
      // events — identical (user, start, end, count) rows
      val batch = (b1 ++ b2).toDS()
        .groupBy(col("user_id"), expr("session_window(ts, '30 minutes')").as("sw"))
        .agg(count(lit(1)).as("n_ev"))
        .select(col("user_id"), col("sw.start"), col("sw.end"), col("n_ev"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
                   r.getTimestamp(2).getTime, r.getLong(3))).toSet
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
      // and the straddling merge really happened: user 1's first session
      // spans both batches — [10:00, 10:50), 3 events
      assert(streamed.contains((1L, ts("2024-01-01 10:00:00").getTime,
        ts("2024-01-01 10:50:00").getTime, 3L)), streamed.toString)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming chain followup: per-chain outcomes == batch two-hop as-of, chains split across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // five users covering every outcome, with user 1's and user 4's
      // chains SPLIT across micro-batch boundaries (signup in b1,
      // purchase in b2, error in b3) and user 5 exercising
      // first-purchase semantics (a second purchase must not re-open)
      val b1 = Seq(
        evt(1, "2024-01-01 10:00:00", user = 1, tpe = "signup"),
        evt(2, "2024-01-01 10:00:00", user = 2, tpe = "signup"),
        evt(3, "2024-01-01 10:00:00", user = 3, tpe = "signup"),
        evt(4, "2024-01-01 10:00:00", user = 4, tpe = "signup"),
        evt(5, "2024-01-01 10:00:00", user = 5, tpe = "signup"),
        evt(6, "2024-01-01 11:00:00", user = 3, tpe = "purchase"),
        evt(7, "2024-01-01 11:00:00", user = 5, tpe = "purchase"))
      val b2 = Seq(
        evt(8, "2024-01-01 12:00:00", user = 1, tpe = "purchase"),
        evt(9, "2024-01-01 11:30:00", user = 5, tpe = "error"),
        evt(10, "2024-01-01 12:00:00", user = 5, tpe = "purchase"),
        evt(11, "2024-01-01 12:30:00", user = 4, tpe = "purchase"))
      val b3 = Seq(
        evt(12, "2024-01-01 13:00:00", user = 1, tpe = "error"),
        evt(13, "2024-01-01 14:00:00", user = 4, tpe = "error"))
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.chainFollowupStream(stream.toDF().as[Evt])
        .toDF("status", "s_id", "lat")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      // sentinels (ignored clicks) drive the watermark past the 24 h
      // deadlines so the timer-produced outcomes finalize
      Seq(b1, b2, b3,
          Seq(evt(98, "2024-01-03 00:00:00", user = 99)),
          Seq(evt(99, "2024-01-04 00:00:00", user = 99)))
        .foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table(sink).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // batch twin: the exact reconChainFollowup two-hop shape over the
      // SAME events, emitted per chain instead of as the census
      val e = (b1 ++ b2 ++ b3).toDS().toDF()
      def leg(t: String, p: String) = e.filter(col("event_type") === t)
        .select(col("event_id").as(s"${p}_id"), col("user_id").as(s"${p}_user"),
                col("ts").as(s"${p}_ts"))
      val firstP = leg("signup", "s")
        .join(leg("purchase", "p"), col("s_user") === col("p_user") &&
              col("p_ts") > col("s_ts") &&
              col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOURS"), "left_outer")
        .groupBy("s_id", "s_user", "s_ts")
        .agg(min(struct(col("p_ts"), col("p_id"))).as("fp"))
        .select(col("s_id"), col("s_user"), col("s_ts"),
                col("fp.p_id").as("p_id"), col("fp.p_ts").as("p_ts"))
      val batch = firstP
        .join(leg("error", "e"), col("s_user") === col("e_user") &&
              col("e_ts") > col("p_ts") &&
              col("e_ts") <= col("p_ts") + expr("INTERVAL 24 HOURS"), "left_outer")
        .groupBy("s_id", "s_ts", "p_id", "p_ts")
        .agg(min(struct(col("e_ts"), col("e_id"))).as("fe"))
        .select(
          when(col("p_id").isNull, "no_purchase")
            .when(col("fe.e_id").isNull, "purchase_no_error")
            .otherwise("full_chain").as("status"),
          col("s_id"),
          when(col("fe.e_id").isNotNull,
            unix_timestamp(col("fe.e_ts")) - unix_timestamp(col("s_ts")))
            .otherwise(0L).as("lat"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
      // the split chains really completed, and first-purchase won
      assert(streamed.contains(("full_chain", 1L, 10800L)), streamed.toString)
      assert(streamed.contains(("full_chain", 5L, 5400L)), streamed.toString)
      assert(streamed.contains(("no_purchase", 2L, 0L)), streamed.toString)
      assert(streamed.contains(("purchase_no_error", 3L, 0L)), streamed.toString)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("timer-driven resample: hourly grid rows emitted by watermark, forward-filled") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.resampleFfillStream(stream.toDF().as[Evt])
        .toDF("user_id", "grid_ms", "cents")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      // user 1: two ticks inside the 10:00-11:00 hour
      stream.addData(evt(1, "2024-01-01 10:10:00", user = 1, v = 1.0),
                     evt(2, "2024-01-01 10:40:00", user = 1, v = 2.0))
      q.processAllAvailable()
      // drive the watermark past 11:00, then 12:00, then 13:00; user 1
      // ticks again at 12:30 (v=5) so the 13:00 grid point must carry 500
      stream.addData(evt(3, "2024-01-01 12:10:00", user = 99))
      q.processAllAvailable()
      stream.addData(evt(4, "2024-01-01 12:30:00", user = 1, v = 5.0),
                     evt(5, "2024-01-01 13:10:00", user = 99))
      q.processAllAvailable()
      stream.addData(evt(6, "2024-01-01 14:10:00", user = 99))
      q.processAllAvailable()
      q.stop()
      val grid = spark.table(sink).filter(col("user_id") === 1)
        .collect().map(r => (r.getAs[Long]("grid_ms"), r.getAs[Long]("cents"))).toMap
      def ms(s: String) = ts(s).getTime
      // 11:00 and 12:00 carry the last pre-boundary tick (2.00); 13:00
      // carries the 12:30 tick (5.00)
      assert(grid.get(ms("2024-01-01 11:00:00")).contains(200L), s"got $grid")
      assert(grid.get(ms("2024-01-01 12:00:00")).contains(200L), s"got $grid")
      assert(grid.get(ms("2024-01-01 13:00:00")).contains(500L), s"got $grid")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("observe() exposes per-batch pipeline metrics without an extra pass") {
    // the in-flight observability surface: named aggregates evaluated
    // on the streaming batch itself and reported through query
    // progress — row counts and money totals without a second scan or
    // a side aggregation query
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Evt]
    val sink = nextSink()
    val q = stream.toDF()
      .observe("ingest", count(lit(1)).as("rows"),
               sum(round(col("value") * 100).cast("long")).as("cents"))
      .select("event_id", "user_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    stream.addData(evt(1, "2024-01-01 10:00:00", v = 1.25),
                   evt(2, "2024-01-01 10:01:00", v = 2.50))
    q.processAllAvailable()
    val m = q.recentProgress.flatMap(p => Option(p.observedMetrics.get("ingest")))
      .lastOption.getOrElse(fail("no observed metrics reported"))
    assert(m.getAs[Long]("rows") == 2L)
    assert(m.getAs[Long]("cents") == 375L)
    q.stop()
  }

  test("ohlc compaction runs incrementally: update-mode min_by/max_by per window") {
    // the streaming twin of ts_downsample_ohlc: windowed
    // open/high/low/close maintained incrementally — min_by/max_by are
    // mergeable aggregates, so update mode re-emits a window's row as
    // later ticks arrive
    val out = run(Seq(
      Seq(evt(1, "2024-01-01 10:00:00", user = 1, v = 5.0),
          evt(2, "2024-01-01 11:00:00", user = 1, v = 9.0)),
      Seq(evt(3, "2024-01-01 12:30:00", user = 1, v = 1.0))), "update") { df =>
      df.groupBy(window(col("ts"), "6 hours"), col("user_id"))
        .agg(min_by(col("value"), col("ts")).as("open_v"),
             max("value").as("high_v"),
             min("value").as("low_v"),
             max_by(col("value"), col("ts")).as("close_v"),
             count(lit(1)).as("n"))
    }
    // last emission for the 06:00-12:00... window (UTC): all 3 ticks
    // fall in [06:00,12:00) except 12:30 -> [12:00,18:00)
    val last = out.collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"),
                 r.getAs[Double]("open_v"), r.getAs[Double]("high_v"),
                 r.getAs[Double]("low_v"), r.getAs[Double]("close_v")))
    // final state of the first window: open=5 (10:00), high=9, low=5, close=9
    assert(last.contains((1L, 2L, 5.0, 9.0, 5.0, 9.0)), last.mkString(","))
    // second window opened by the 12:30 tick
    assert(last.contains((1L, 1L, 1.0, 1.0, 1.0, 1.0)), last.mkString(","))
  }

  test("cdc sink applies tombstones: newest op wins, late tombstones lose, upserts resurrect") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Evt]
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val changes = stream.toDF().select(
      col("user_id"), col("ts"), col("value"),
      when(col("event_type") === "error", "delete").otherwise("upsert").as("op"))
    val q = graft.sinks.Sinks.cdcApplyParquet(
      changes, s"$dir/view", s"$dir/ckpt", "user_id", "ts", "op")
    def view(): Map[Long, Double] = spark.read.parquet(s"$dir/view")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("value")).toMap
    stream.addData(evt(1, "2024-01-01 10:00:00", user = 1, v = 1.0),
                   evt(2, "2024-01-01 10:00:00", user = 2, v = 2.0))
    q.processAllAvailable()
    assert(view() == Map(1L -> 1.0, 2L -> 2.0))
    // delete user 1 (newer), add user 3
    stream.addData(evt(3, "2024-01-01 12:00:00", user = 1, tpe = "error"),
                   evt(4, "2024-01-01 12:00:00", user = 3, v = 3.0))
    q.processAllAvailable()
    assert(view() == Map(2L -> 2.0, 3L -> 3.0))
    // user 1 resurrects; a LATE tombstone for user 2 (older than its
    // stored change) must lose
    stream.addData(evt(5, "2024-01-02 09:00:00", user = 1, v = 9.0),
                   evt(6, "2024-01-01 08:00:00", user = 2, tpe = "error"))
    q.processAllAvailable()
    q.stop()
    assert(view() == Map(1L -> 9.0, 2L -> 2.0, 3L -> 3.0))
  }

  test("transformWithState keeps named value states across batches (RocksDB)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.runningTotalsTws(stream.toDF().as[Evt])
        .toDF("user_id", "n", "cents")
        .writeStream.format("memory").queryName(sink).outputMode("update").start()
      stream.addData(evt(1, "2024-01-01 10:00:00", user = 1, v = 1.50),
                     evt(2, "2024-01-01 10:01:00", user = 2, v = 2.25))
      q.processAllAvailable()
      stream.addData(evt(3, "2024-01-01 10:02:00", user = 1, v = 0.25))
      q.processAllAvailable()
      q.stop()
      val latest = spark.table(sink)
        .groupBy("user_id").agg(max("n").as("n"), max("cents").as("cents"))
        .collect().map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("cents")))).toMap
      assert(latest == Map(1L -> ((2L, 175L)), 2L -> ((1L, 225L))))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("wall-clock punctuate: heartbeats fire on idle keys; invariants hold under ANY firing schedule") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // one run = four data batches with real wall-clock gaps so the
      // 150 ms one-shot timers expire between them. ProcessingTime
      // mode keeps the engine in a continuous empty-batch poll loop,
      // so `processAllAvailable` never observes idle — the test polls
      // the SINK for the deterministic data rows instead (and the
      // poll-loop behavior is exactly why HeartbeatProcessor's timers
      // are activity-re-armed one-shots, not self-re-arming)
      def run(): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
        val stream = MemoryStream[Evt]
        val sink = nextSink()
        val q = StreamOps.heartbeatTws(stream.toDF().as[Evt], intervalMs = 150L)
          .toDF("user_id", "n", "kind")
          .writeStream.format("memory").queryName(sink).outputMode("update").start()
        def dataRows() = spark.table(sink).filter(col("kind") === "data").count()
        def await(atLeast: Long): Unit = {
          val t0 = System.currentTimeMillis()
          while (dataRows() < atLeast) {
            assert(q.exception.isEmpty, s"query died: ${q.exception}")
            assert(System.currentTimeMillis() - t0 < 60000,
              s"timed out waiting for $atLeast data rows (have ${dataRows()})")
            Thread.sleep(100)
          }
        }
        stream.addData(evt(1, "2024-01-01 10:00:00", user = 1, v = 1.0),
                       evt(2, "2024-01-01 10:00:01", user = 1, v = 1.0),
                       evt(3, "2024-01-01 10:00:02", user = 1, v = 1.0))
        await(1)
        Thread.sleep(400)
        stream.addData(evt(4, "2024-01-01 10:01:00", user = 1, v = 1.0),
                       evt(5, "2024-01-01 10:01:01", user = 2, v = 1.0))
        await(3)
        Thread.sleep(400)
        stream.addData(evt(6, "2024-01-01 10:02:00", user = 3, v = 1.0))
        await(4)
        Thread.sleep(400)
        stream.addData(evt(7, "2024-01-01 10:03:00", user = 3, v = 1.0))
        await(5)
        // give the last armed timers a chance to fire before stopping
        Thread.sleep(400)
        q.stop()
        val rows = spark.table(sink).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"),
            r.getAs[String]("kind")))
        (rows.filter(_._3 == "data").map(t => (t._1, t._2)).sorted.toSeq,
         rows.filter(_._3 == "hb").map(t => (t._1, t._2)).sorted.toSeq)
      }
      val (data1, hb1) = run()
      // the data-driven state is a pure function of the batches
      assert(data1 == Seq((1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (3L, 2L)),
        s"data emissions must be schedule-independent: $data1")
      // heartbeats fired (timers armed in batch 1 expire across the
      // 400 ms gaps — every later batch is a firing opportunity) …
      assert(hb1.nonEmpty, "wall-clock punctuate never fired")
      // … and each one's payload is the key's running count at SOME
      // batch prefix — never a value the state never held
      val validPrefix = Map(1L -> Set(0L, 3L, 4L), 2L -> Set(0L, 1L),
        3L -> Set(0L, 1L, 2L))
      hb1.foreach { case (u, n) =>
        assert(validPrefix(u).contains(n), s"heartbeat ($u, $n) is not a prefix count")
      }
      // schedule independence: a second run converges to the SAME
      // final data state, whatever its heartbeat schedule did
      val (data2, hb2) = run()
      assert(data2 == data1, "final data state must be identical across runs")
      hb2.foreach { case (u, n) =>
        assert(validPrefix(u).contains(n), s"heartbeat ($u, $n) is not a prefix count")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transition census stream equals the batch operator on an in-order replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the REAL events table in two chronological halves — the state
      // must stitch each user's sequence across the batch boundary
      val all = graft.tables.Tables.t(spark, sf, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("")).as[Evt]
        .collect().sortBy(e => (e.ts.getTime, e.event_id))
      val mid = all(all.length / 2).ts.getTime
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.transitionsTws(stream.toDF().as[Evt])
        .toDF("prev_type", "cur_type")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      stream.addData(all.filter(_.ts.getTime <= mid).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(all.filter(_.ts.getTime > mid).toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table(sink)
        .groupBy("prev_type", "cur_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = SparkEntry.queries("events_transition_counts")(spark, sf)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("as-of enrichment stream equals the batch as-of on an in-order replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val all = graft.tables.Tables.t(spark, sf, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("")).as[Evt]
        .collect().sortBy(e => (e.ts.getTime, e.event_id))
      val mid = all(all.length / 2).ts.getTime
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.asofEnrichStream(stream.toDF().as[Evt])
        .toDF("purchase_id", "last_signup_id")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      // per-user signup state must survive the batch boundary
      stream.addData(all.filter(_.ts.getTime <= mid).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(all.filter(_.ts.getTime > mid).toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table(sink)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // batch truth: the cogroup as-of over the same legs (inner —
      // signup-less purchases emit nothing in both forms)
      val e = graft.tables.Tables.t(spark, sf, "events")
      def leg(tpe: String) = e.filter(col("event_type") === tpe)
        .select(col("event_id").as("id"), col("user_id").as("key"),
                unix_micros(col("ts")).as("ts"))
      val batch = graft.ops.AsOf.asofLastPrior(leg("purchase"), leg("signup"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("last-touch attribution stream equals the batch operator on an in-order replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the REAL events table in two chronological halves — each user's
      // lastTouch state must survive the batch boundary
      val all = graft.tables.Tables.t(spark, sf, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("")).as[Evt]
        .collect().sortBy(e => (e.ts.getTime, e.event_id))
      val mid = all(all.length / 2).ts.getTime
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.attributionStream(stream.toDF().as[Evt])
        .toDF("attributed", "cents")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      stream.addData(all.filter(_.ts.getTime <= mid).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(all.filter(_.ts.getTime > mid).toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table(sink)
        .groupBy("attributed")
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val batch = SparkEntry.queries("events_attribution")(spark, sf)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming bottom-k quantile sketch matches the batch sample across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 64
      val all = graft.tables.Tables.t(spark, sf, "events")
        .select(col("event_type"), col("event_id"),
                round(col("value") * 100).cast("long"))
        .collect().sortBy(_.getLong(1))
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val stream = MemoryStream[(String, Long, Long)]
      val sink = nextSink()
      val q = StreamOps.bottomkQuantilesStream(stream.toDS(), k)
        .toDF("key", "m", "p50", "p90")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      // first batch stays under k rows per key (1000/5 = 200 events,
      // 1/5 of that = ~40/type < 64) so the sample is still filling —
      // the final batch is then uniquely identifiable as max-m
      stream.addData(all.take(all.length / 5).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(all.drop(all.length / 5).toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      // the final (max-m) emission per key must equal the batch
      // formula over the full delivery
      val streamed = spark.table(sink)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("key")
            .orderBy(col("m").desc, col("p50"), col("p90"))))
        .filter(col("rn") === 1)
        .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      val expected = all.groupBy(_._1).map { case (t, rows) =>
        val vs = rows.map(r => (StreamOps.kmvHash(r._2), r._3))
          .sorted.take(k).map(_._2).sorted
        val m = vs.length
        def qq(p: Int) = vs(math.min(m - 1, m * p / 100))
        t -> ((qq(50), qq(90)))
      }
      assert(streamed == expected)
      // and the sample really estimates: streamed p50 sits between the
      // exact p35 and p65 of each key's full value set
      val truth = all.groupBy(_._1).map { case (t, rows) =>
        t -> rows.map(_._3).sorted
      }
      streamed.foreach { case (t, (p50, _)) =>
        val vs = truth(t)
        assert(p50 >= vs((vs.length * 35) / 100) && p50 <= vs((vs.length * 65) / 100),
          s"$t: p50=$p50 outside [p35, p65]")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming KMV sketch converges to the batch estimate across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 64
      val all = graft.tables.Tables.t(spark, sf, "events")
        .select(col("event_type"), col("user_id"), col("event_id"))
        .collect().sortBy(_.getLong(2))
        .map(r => (r.getString(0), r.getLong(1)))
      val stream = MemoryStream[(String, Long)]
      val sink = nextSink()
      val q = StreamOps.kmvDistinctStream(stream.toDS(), k)
        .toDF("key", "n_sk", "est")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      stream.addData(all.take(all.length / 2).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(all.drop(all.length / 2).toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      // the estimate is monotone, so max per key = the final census
      val streamed = spark.table(sink)
        .groupBy("key").agg(max("est").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // batch expectation: identical hash over distinct (type, user)
      val expected = all.distinct.groupBy(_._1).map { case (t, vs) =>
        val hs = vs.map(v => StreamOps.kmvHash(v._2)).distinct.sorted.take(k)
        t -> (if (hs.length < k) hs.length.toLong
              else (k - 1).toLong * 2147483648L / hs.last)
      }
      assert(streamed == expected)
      // and the sketch really estimates: within 1/sqrt(k) of truth
      val truth = all.distinct.groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).distinct.length }
      streamed.foreach { case (t, est) =>
        assert(math.abs(est - truth(t)).toDouble / truth(t) < 0.15, s"$t: $est vs ${truth(t)}")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event-time timers fire inactivity timeouts (punctuate analogue)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.gapTimeouts(stream.toDF().as[Evt], gapMs = 3600 * 1000L)
        .toDF("user_id", "last_seen")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      stream.addData(evt(1, "2024-01-01 10:00:00", user = 1),
                     evt(2, "2024-01-01 10:05:00", user = 2))
      q.processAllAvailable()
      // user 1 stays active — its timer re-arms to 11:30
      stream.addData(evt(3, "2024-01-01 10:30:00", user = 1))
      q.processAllAvailable()
      // two afternoon events drive the watermark past 11:30 and 11:05
      // (watermark advances off the PREVIOUS batch's max event time)
      stream.addData(evt(4, "2024-01-01 13:00:00", user = 99))
      q.processAllAvailable()
      stream.addData(evt(5, "2024-01-01 13:05:00", user = 99))
      q.processAllAvailable()
      q.stop()
      val fired = spark.table(sink).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("last_seen")).toMap
      // both idle users time out with their true last-seen instants;
      // user 99's own timer (14:05) is beyond the final watermark
      assert(fired == Map(
        1L -> ts("2024-01-01 10:30:00").getTime,
        2L -> ts("2024-01-01 10:05:00").getTime), s"got $fired")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("exactly-once file sink: restart from checkpoint does not duplicate") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_eos").toString
    val ckpt = s"$dir/ckpt"; val outPath = s"$dir/out"
    val stream = MemoryStream[Evt]
    def start() = stream.toDF()
      .writeStream.format("parquet").option("path", outPath)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    stream.addData(evt(1, "2024-01-01 10:00:00"), evt(2, "2024-01-01 10:01:00"))
    q1.processAllAvailable(); q1.stop()
    val q2 = start()
    stream.addData(evt(3, "2024-01-01 10:02:00"))
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(outPath).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"no dupes / no loss across restart, got $ids")
  }

  test("state data source reads the running-count store (interactive queries)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_ckpt").toString
    val stream = MemoryStream[Evt]
    val sink = nextSink()
    val q = StreamOps.runningCount(stream.toDF())
      .writeStream.format("memory").queryName(sink).outputMode("update")
      .option("checkpointLocation", ckpt).start()
    stream.addData(evt(1, "2024-01-01 10:00:00", user = 1),
                   evt(2, "2024-01-01 10:01:00", user = 1),
                   evt(3, "2024-01-01 10:02:00", user = 2))
    q.processAllAvailable()
    stream.addData(evt(4, "2024-01-01 10:03:00", user = 2))
    q.processAllAvailable()
    q.stop()
    // store.all() analogue: per-user aggregation buffers straight from
    // the checkpoint — no running query needed
    val state = StreamOps.readStateStore(spark, ckpt)
    val counts = state
      .select(col("key.user_id"), col("value.*"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L),
      s"state store contents: ${state.collect().mkString("; ")} schema ${state.schema}")
  }

  test("Trigger.AvailableNow drains the backlog and terminates (batch-backfill capability)") {
    import org.apache.spark.sql.streaming.Trigger
    // a file-source backlog processed as a bounded streaming run — the
    // operational shape for backfilling a streaming topology over
    // historical data, then handing off to the continuous trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow").toString
    val src = s"$dir/in"; val ckpt = s"$dir/ckpt"
    val events = graft.tables.Tables.t(spark, sf, "events").limit(200)
    events.write.parquet(src)
    val sink = nextSink()
    val q = spark.readStream.schema(events.schema).parquet(src)
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName(sink).outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    val total = spark.table(sink).agg(sum("count")).collect().head.getLong(0)
    assert(total == 200, s"backlog fully processed, got $total")
  }

  test("sf0.1 replay: rate-limited file-stream twins equal batch (windowed agg + band join)") {
    // the full 100k-event sf0.1 table replayed as 20 time-ordered
    // micro-batches through Sources.eventsReplay — the volume proof
    // that the streaming twins' state/watermark behavior is not a
    // toy-batch artifact
    val events01 = graft.tables.Tables.t(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    // --- windowed-agg twin (complete mode: final table == batch) ---
    val sinkA = nextSink()
    val replayA = graft.sources.Sources.eventsReplay(spark, events01, s"$dir/a")
    val qa = StreamOps.tumblingDaily(replayA)
      .writeStream.format("memory").queryName(sinkA).outputMode("complete").start()
    qa.processAllAvailable(); qa.stop()
    val streamedAgg = spark.table(sinkA)
    val batchAgg = StreamOps.tumblingDaily(events01)
    assert(streamedAgg.agg(sum("c")).collect().head.getLong(0) == 100000L,
      "every sf0.1 event must be processed")
    assert(streamedAgg.exceptAll(batchAgg).isEmpty &&
           batchAgg.exceptAll(streamedAgg).isEmpty)
    // --- stream-stream band-join twin (self-join of one replay) ---
    val sinkB = nextSink()
    val replayB = graft.sources.Sources.eventsReplay(spark, events01, s"$dir/b")
    val qb = StreamOps.bandJoin1h(
        replayB.filter(col("event_type") === "click"),
        replayB.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName(sinkB).outputMode("append").start()
    qb.processAllAvailable(); qb.stop()
    val streamedJoin = spark.table(sinkB)
    val batchJoin = StreamOps.bandJoin1h(
      events01.filter(col("event_type") === "click"),
      events01.filter(col("event_type") === "purchase"))
    val nStream = streamedJoin.count()
    assert(nStream == batchJoin.count() && nStream > 0)
    assert(streamedJoin.exceptAll(batchJoin).isEmpty &&
           batchJoin.exceptAll(streamedJoin).isEmpty)
  }

  test("sf0.1 replay: full-outer reconciliation twin equals batch once the watermark closes") {
    import spark.implicits._
    // the reference's core workload at volume: 100k sf0.1 events
    // replayed in 20 time-ordered micro-batches through the full-outer
    // reconciliation join. Two far-future sentinel rows (one per leg,
    // non-joining user) push the final watermark past every real join
    // window so all unmatched state evicts and emits; the streamed
    // outcome stream then equals the batch full-outer join row-for-row.
    val events01 = graft.tables.Tables.t(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val maxTs = events01.agg(max("ts")).collect().head.getTimestamp(0)
    val farFuture = new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)
    val sentinels = Seq(
      Evt(-1L, farFuture, -999L, "signup", 0.0, "{}"),
      Evt(-2L, farFuture, -999L, "purchase", 0.0, "{}")).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_recon").toString
    val replay = graft.sources.Sources.eventsReplay(
      spark, events01.unionByName(sentinels), s"$dir/slices")
    val sink = nextSink()
    val q = StreamOps.reconStream(
        replay.filter(col("event_type") === "signup"),
        replay.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(sink)
      .filter(coalesce(col("a_id"), lit(0L)) =!= -1L &&
              coalesce(col("b_id"), lit(0L)) =!= -2L)
    val batch = StreamOps.reconStream(
      events01.filter(col("event_type") === "signup"),
      events01.filter(col("event_type") === "purchase"))
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("sf0.1 end-to-end: replay -> recon state -> CowTable CDC sink equals the batch recon pair") {
    import spark.implicits._
    // The reference's flagship, wired as ONE pipeline: DSv2 replay of
    // the full sf0.1 event log -> full-outer reconciliation state ->
    // per-micro-batch CDC upsert into a copy-on-write table -> serving
    // reads derive BOTH operational reports (leg-match census, aging
    // buckets) from the TABLE and must equal the batch operators
    // recon_leg_match / recon_aging_buckets row-for-row.
    val d01 = "/root/testdata/sf0.1"
    val events01 = graft.tables.Tables.t(spark, d01, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val maxTs = events01.agg(max("ts")).collect().head.getTimestamp(0)
    val farFuture = new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)
    val sentinels = Seq(
      Evt(-1L, farFuture, -999L, "signup", 0.0, "{}"),
      Evt(-2L, farFuture, -999L, "purchase", 0.0, "{}")).toDF()
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e_recon").toString
    val replay = graft.sources.Sources.eventsReplay(
      spark, events01.unionByName(sentinels), s"$dir/slices")
    val table = s"$dir/recon_cow"
    val q = graft.sinks.Sinks.reconCdcPipeline(
      StreamOps.reconStream(
        replay.filter(col("event_type") === "signup"),
        replay.filter(col("event_type") === "purchase")),
      table, s"$dir/ckpt")
    q.processAllAvailable(); q.stop()

    val outcomes = graft.sinks.CowTable.read(spark, table)
      .filter(coalesce(col("a_id"), lit(0L)) =!= -1L &&
              coalesce(col("b_id"), lit(0L)) =!= -2L)
      .persist()

    // Report 1: leg-match census from the table == recon_leg_match.
    val census = outcomes.groupBy("status")
      .agg(count(lit(1)).as("c")).orderBy("status")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batchCensus = SparkEntry.queries("recon_leg_match")(spark, d01)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(census == batchCensus && census.nonEmpty, s"$census vs $batchCensus")

    // Report 2: unmatched-signup aging from the table (outcome keys
    // enriched back to event timestamps — the serving-side dimension
    // lookup) == recon_aging_buckets.
    val aged = outcomes.filter(col("status") === "unmatched_a")
      .join(events01.select(col("event_id").as("a_id"), col("ts").as("s_ts")), "a_id")
      .crossJoin(broadcast(events01.agg(max(col("ts")).as("now_ts"))))
      .withColumn("age_s", unix_timestamp(col("now_ts")) - unix_timestamp(col("s_ts")))
      .withColumn("bucket",
        when(col("age_s") < 7L * 86400, "lt7d")
          .when(col("age_s") < 21L * 86400, "lt21d")
          .otherwise("21d_plus"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("age_s").cast("long").as("min_age_s"),
           max("age_s").cast("long").as("max_age_s"))
      .orderBy("bucket")
      .collect().map(_.toSeq).toSeq
    val batchAged = SparkEntry.queries("recon_aging_buckets")(spark, d01)
      .collect().map(_.toSeq).toSeq
    assert(aged == batchAged && aged.nonEmpty, s"$aged vs $batchAged")

    // Replay idempotence: re-applying outcomes (a re-delivered batch
    // after restart) upserts the SAME keys — census must not change.
    val redelivered = outcomes.filter(col("status") === "matched").limit(500)
    graft.sinks.CowTable.merge(spark, table, redelivered, "rk")
    val census2 = graft.sinks.CowTable.read(spark, table)
      .filter(coalesce(col("a_id"), lit(0L)) =!= -1L &&
              coalesce(col("b_id"), lit(0L)) =!= -2L)
      .groupBy("status").agg(count(lit(1)).as("c")).orderBy("status")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(census2 == census, s"re-delivery duplicated rows: $census2 vs $census")
    outcomes.unpersist()
  }

  test("streaming forward as-of: horizon-bounded first-after == batch twin, disorder-tolerant") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val horizon = 3600000L // 1 hour
      // user 1: purchase in b1, FIRST error lands in b2 (cross-batch
      //   match pair split) with a LATER error to prove argmin;
      // user 2: purchase whose horizon closes empty (timer outcome);
      // user 3: error arrives in b2, its purchase in b3 with an EARLIER
      //   event time — cross-batch DISORDER inside the watermark, the
      //   case eager matching cannot resolve;
      // user 4: error outside the horizon → unmatched.
      val b1 = Seq(evt(10, "2024-01-01 10:00:00", user = 1, tpe = "purchase"),
                   evt(20, "2024-01-01 10:00:00", user = 2, tpe = "purchase"),
                   evt(40, "2024-01-01 10:00:00", user = 4, tpe = "purchase"))
      val b2 = Seq(evt(11, "2024-01-01 10:30:00", user = 1, tpe = "error"),
                   evt(12, "2024-01-01 10:45:00", user = 1, tpe = "error"),
                   evt(31, "2024-01-01 10:20:00", user = 3, tpe = "error"),
                   evt(41, "2024-01-01 11:30:00", user = 4, tpe = "error"))
      val b3 = Seq(evt(30, "2024-01-01 10:10:00", user = 3, tpe = "purchase"))
      // sentinels drive the watermark past every horizon
      val b4 = Seq(evt(90, "2024-01-01 14:00:00", user = 99))
      val b5 = Seq(evt(91, "2024-01-01 18:00:00", user = 99))
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      // 90-minute allowed lateness: user 3's 10:10 purchase must still
      // be AHEAD of the watermark when it arrives in b3 (b2's max event
      // is 11:30 — with a tight delay the engine would drop it as late)
      val q = StreamOps.asofNextStream(stream.toDF().as[Evt], horizon,
          watermark = "90 minutes")
        .toDF("purchase_id", "next_error_id", "matched")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      Seq(b1, b2, b3, b4, b5).foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch twin: forward as-of with the same horizon over the same rows
      val all = (b1 ++ b2 ++ b3 ++ b4 ++ b5).toDS()
      val p = all.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
                unix_micros(col("ts")).as("p_us"))
      val er = all.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
                unix_micros(col("ts")).as("e_us"))
      val batch = p.join(er, col("p_user") === col("e_user") &&
            col("e_us") > col("p_us") && col("e_us") <= col("p_us") + horizon * 1000L, "left")
        .groupBy("p_id")
        .agg(min(struct(col("e_us"), col("e_id"))).as("nxt"))
        .select(col("p_id"), coalesce(col("nxt.e_id"), lit(-1L)),
                when(col("nxt.e_id").isNull, 0L).otherwise(1L))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
      // and the interesting rows really are what they claim:
      assert(streamed.contains((10L, 11L, 1L)), "cross-batch split must match argmin")
      assert(streamed.contains((30L, 31L, 1L)), "in-watermark disorder must still match")
      assert(streamed.contains((20L, -1L, 0L)) && streamed.contains((40L, -1L, 0L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("idle-key retention: the horizon evicts a cold key's as-of state; active keys unaffected") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ttl_ckpt").toString
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val horizon = 2L * 86400000L // 2 days of event time
      val q = StreamOps.asofEnrichStream(stream.toDF().as[Evt], idleRetentionMs = horizon)
        .toDF("purchase_id", "signup_id")
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      // batch 1: users 1 and 2 sign up; user 1 purchases in-horizon
      stream.addData(
        evt(1, "2024-01-01 10:00:00", user = 1, tpe = "signup"),
        evt(2, "2024-01-01 11:00:00", user = 1, tpe = "purchase"),
        evt(3, "2024-01-01 10:30:00", user = 2, tpe = "signup"))
      q.processAllAvailable()
      // batch 2: user 3 signs up far in the future (watermark jump source)
      stream.addData(evt(4, "2024-01-10 10:00:00", user = 3, tpe = "signup"))
      q.processAllAvailable()
      // batch 3: the watermark (trailing one batch) passes Jan 10 —
      // users 1/2 idle since Jan 1 + 2d horizon → timers fire, state drops
      stream.addData(evt(5, "2024-01-11 10:00:00", user = 3))
      q.processAllAvailable()
      // batch 4: user 1's post-horizon purchase goes UNENRICHED (signup
      // forgotten — bounded staleness); user 3's enriches as normal
      stream.addData(
        evt(6, "2024-01-11 11:00:00", user = 1, tpe = "purchase"),
        evt(7, "2024-01-11 11:00:00", user = 3, tpe = "purchase"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((2L, 1L), (7L, 4L)), rows.toString)
      // the store REALLY shrank: only user 3's signup state remains
      val state = StreamOps.readStateStore(spark, ckpt, stateVarName = "lastSignup")
      val keys = state.select(col("key.*")).collect().map(_.getLong(0)).toSet
      assert(keys == Set(3L), s"evicted keys must leave the store: $keys")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("idle-key retention: watermark-only sketch state (kmv) evicts cold keys, keeps hot ones") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ttl_kmv").toString
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val horizon = 2L * 86400000L
      // the watermark is applied UPSTREAM of the pair projection — the
      // retention contract for inputs that carry no event time
      val pairs = stream.toDF().withWatermark("ts", "0 seconds").as[Evt]
        .map(e => (e.event_type, e.user_id))
      val q = StreamOps.kmvDistinctStream(pairs, k = 64, idleRetentionMs = horizon)
        .toDF("key", "size", "est")
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      // two batches of activity on both keys (batch 1 can't arm — the
      // watermark is still 0; batch 2 arms both)
      stream.addData(evt(1, "2024-01-01 10:00:00", user = 1, tpe = "click"),
                     evt(2, "2024-01-01 10:01:00", user = 2, tpe = "click"),
                     evt(3, "2024-01-01 10:02:00", user = 9, tpe = "view"))
      q.processAllAvailable()
      stream.addData(evt(4, "2024-01-01 11:00:00", user = 3, tpe = "click"),
                     evt(5, "2024-01-01 11:01:00", user = 9, tpe = "view"))
      q.processAllAvailable()
      // "view" stays hot while time passes; "click" goes idle
      stream.addData(evt(6, "2024-01-10 10:00:00", user = 9, tpe = "view"))
      q.processAllAvailable()
      stream.addData(evt(7, "2024-01-11 12:00:00", user = 9, tpe = "view"))
      q.processAllAvailable()
      // click returns after the horizon: its sketch restarted from empty
      // (view's wm-based deadline — Jan 10 + 2d — is still ahead of the
      // final watermark, so the hot key survives)
      stream.addData(evt(8, "2024-01-11 13:00:00", user = 7, tpe = "click"))
      q.processAllAvailable()
      q.stop()
      val lastClick = spark.table(sink).filter(col("key") === "click")
        .collect().map(r => (r.getLong(1), r.getLong(2))).last
      assert(lastClick == ((1L, 1L)),
        s"post-eviction sketch must restart from empty: $lastClick")
      // the hot key's sketch survived end to end: 1 distinct user
      val lastView = spark.table(sink).filter(col("key") === "view")
        .collect().map(r => (r.getLong(1), r.getLong(2))).last
      assert(lastView == ((1L, 1L)), lastView.toString)
      val state = StreamOps.readStateStore(spark, ckpt, stateVarName = "hs")
      val keys = state.select(col("key.*")).collect().map(_.getString(0)).toSet
      assert(keys == Set("view", "click"),
        s"state store after the run: $keys (click re-armed by batch 5)")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("approx_count_distinct within 2% of exact (HLL capability, R7)") {
    val o = graft.tables.Tables.t(spark, sf, "orders")
    val exact = o.agg(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    val approx = o.agg(approx_count_distinct(col("o_custkey"), 0.02))
      .collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.02 + 0.02)
  }

  test("KIP-213 stream: a dim update between batches re-emits exactly the fan-out rows") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.sinks.{CowTable, Sinks}
    val root = java.nio.file.Files.createTempDirectory("fk_stream").toString
    val (fact, dim, view) = (s"$root/fact", s"$root/dim", s"$root/view")
    // 40 orders over 4 customers (fan-out 10), FK-contiguous
    CowTable.create((0L until 40L).map(i => (i, i / 10, i * 3))
      .toDF("oid", "cust", "amt").repartition(2), fact)
    CowTable.create(Seq((0L, "s0"), (1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("cid", "seg"), dim)
    Sinks.bootstrapFkView(spark, fact, dim, view, "cust", "cid")
    val v0 = CowTable.currentVersion(view)
    val stream = MemoryStream[(Long, String)]
    val q = Sinks.fkDimFanoutStream(stream.toDF().toDF("cid", "seg"),
      dim, fact, view, "oid", "cust", "cid",
      java.nio.file.Files.createTempDirectory("fk_cp").toString)
    def viewCanon(): Seq[(Long, Long, Long, String)] =
      CowTable.read(spark, view).collect()
        .map(r => (r.getAs[Long]("oid"), r.getAs[Long]("cust"),
                   r.getAs[Long]("amt"), r.getAs[String]("seg"))).sorted.toSeq
    def batchTwin(): Seq[(Long, Long, Long, String)] =
      Sinks.fkViewOf(CowTable.read(spark, fact), CowTable.read(spark, dim),
        "cust", "cid").collect()
        .map(r => (r.getAs[Long]("oid"), r.getAs[Long]("cust"),
                   r.getAs[Long]("amt"), r.getAs[String]("seg"))).sorted.toSeq
    // batch 1: one dim key updates — its 10 fan-out rows re-emit
    stream.addData((1L, "vip"))
    q.processAllAvailable()
    val v1 = CowTable.currentVersion(view)
    assert(viewCanon() == batchTwin(), "view must equal the batch FK join")
    assert(viewCanon().count(_._4 == "vip") == 10)
    // the CDC feed shows EXACTLY the fan-out rows changed — nothing else
    val feed1 = CowTable.changes(spark, view, "oid", v0, v1)
      .filter(col("_change_type") === "update")
    assert(feed1.select("oid").as[Long].collect().sorted.toSeq ==
      (10L until 20L).toSeq, "exactly cust-1's orders re-emit")
    // batch 2: two keys, one of them new-to-dim (no fact rows yet)
    stream.addData((3L, "churned"), (9L, "ghost"))
    q.processAllAvailable()
    q.stop()
    assert(viewCanon() == batchTwin(), "view tracks the dim across batches")
    val feed2 = CowTable.changes(spark, view, "oid", v1,
      CowTable.currentVersion(view)).filter(col("_change_type") === "update")
    assert(feed2.select("oid").as[Long].collect().sorted.toSeq ==
      (30L until 40L).toSeq, "the ghost key fans out to nothing")
    // the dim table itself advanced under the same batches
    assert(CowTable.read(spark, dim).filter(col("cid") === 9L).count() == 1)
  }

  test("KIP-213 batch with several versions of one dim key: versionCol picks the latest, no versionCol fails loudly") {
    import spark.implicits._
    import graft.sinks.{CowTable, Sinks}
    // deterministic winner: the max-version row per key, ties broken by
    // the full row — never dropDuplicates' partition-order arbitrary pick
    val batch = Seq((1L, "old", 10L), (1L, "new", 20L), (2L, "only", 5L))
      .toDF("cid", "seg", "ver")
    val picked = Sinks.latestPerKey(batch, "cid", Some("ver"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(picked == Seq((1L, "new", 20L), (2L, "only", 5L)))
    // exact duplicate rows collapse silently (replay shape) …
    val dup = Seq((1L, "same"), (1L, "same")).toDF("cid", "seg")
    assert(Sinks.latestPerKey(dup, "cid", None).count() == 1)
    // … but DISTINCT conflicting rows without a version rule fail the
    // batch rather than merge an arbitrary (possibly stale) version
    val clash = Seq((1L, "a"), (1L, "b")).toDF("cid", "seg")
    val e = intercept[IllegalArgumentException] {
      Sinks.latestPerKey(clash, "cid", None).count()
    }
    assert(e.getMessage.contains("nondeterministic"))
    // end-to-end: a multi-version batch through the fanout body lands
    // the LATEST dim version in both the dim table and the view
    val root = java.nio.file.Files.createTempDirectory("fk_ver").toString
    val (fact, dim, view) = (s"$root/fact", s"$root/dim", s"$root/view")
    CowTable.create((0L until 6L).map(i => (i, i / 3, i))
      .toDF("oid", "cust", "amt"), fact)
    CowTable.create(Seq((0L, "s0", 0L), (1L, "s1", 0L)).toDF("cid", "seg", "ver"), dim)
    Sinks.bootstrapFkView(spark, fact, dim, view, "cust", "cid")
    Sinks.fkDimFanoutBatch(
      Seq((1L, "stale", 7L), (1L, "fresh", 9L)).toDF("cid", "seg", "ver"),
      dim, fact, view, "oid", "cust", "cid", versionCol = Some("ver"))
    assert(CowTable.read(spark, dim).filter(col("cid") === 1L)
      .select("seg").as[String].head() == "fresh")
    assert(CowTable.read(spark, view).filter(col("cust") === 1L)
      .select("seg").as[String].collect().toSeq.distinct == Seq("fresh"))
  }

  test("cow-cdc source: table->table chaining equals batch recompute across commits incl. MoR delete and a mid-stream restart") {
    import spark.implicits._
    import graft.sinks.{CowTable, Sinks}
    import graft.sources.CowCdcSourceProvider
    val dir = java.nio.file.Files.createTempDirectory("cow_cdc_src").toString
    val up = s"$dir/up"; val mirror = s"$dir/mirror"; val ckpt = s"$dir/ckpt"
    CowTable.create(
      (1L to 6L).map(i => (i, s"u$i", i * 10L)).toDF("id", "name", "v"), up)

    def feed() = spark.readStream
      .format(classOf[CowCdcSourceProvider].getName)
      .option("path", up).option("key", "id").load()
    def canon(p: String): Seq[String] = {
      val df = CowTable.read(spark, p)
      df.select(df.columns.sorted.toIndexedSeq.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    }

    // batch 1: the initial snapshot lands as inserts
    val q = Sinks.cdcMirrorStream(feed(), mirror, "id", ckpt)
    q.processAllAvailable()
    assert(canon(mirror) == canon(up), "initial snapshot mirrored")
    // commit 2: a merge window (2 updates + 1 insert) streams as CDC
    CowTable.merge(spark, up,
      Seq((2L, "u2x", 200L), (4L, "u4x", 400L), (7L, "u7", 70L))
        .toDF("id", "name", "v"), "id")
    q.processAllAvailable()
    assert(canon(mirror) == canon(up), "merge window mirrored")
    q.stop() // ---- restart mid-stream ----
    // commits 3+4 land while no query is running: a MoR key delete
    // (files never move — the manifest-diff blind spot the sidecar
    // handling covers) and a plain append
    CowTable.deleteMorKeys(spark, up, Seq(1L, 5L).toDF("id"), "id")
    CowTable.append(spark, up, Seq((9L, "u9", 90L)).toDF("id", "name", "v"))
    val q2 = Sinks.cdcMirrorStream(feed(), mirror, "id", ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert(canon(mirror) == canon(up),
      "restart resumes from the committed version: no gap, no duplicate")
    // the downstream VIEW equality the task names: an agg computed off
    // the streamed mirror equals the batch recompute off the upstream
    def agg(p: String) = CowTable.read(spark, p)
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .collect().map(_.toString).toSeq
    assert(agg(mirror) == agg(up))
    assert(CowTable.read(spark, mirror).count() == 6L) // 6+1 inserted, 2 deleted
  }

  test("cow-cdc source: startingVersion resumes a known position; maxVersionsPerBatch bounds batch spans") {
    import spark.implicits._
    import graft.sinks.{CowTable, Sinks}
    import graft.sources.CowCdcSourceProvider
    val dir = java.nio.file.Files.createTempDirectory("cow_cdc_opts").toString
    val up = s"$dir/up"
    CowTable.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), up) // v1
    CowTable.append(spark, up, Seq((3L, 30L)).toDF("id", "v"))     // v2
    CowTable.merge(spark, up, Seq((1L, 11L), (4L, 40L)).toDF("id", "v"), "id") // v3
    CowTable.deleteMorKeys(spark, up, Seq(2L).toDF("id"), "id")    // v4

    // startingVersion=2: only the post-v2 changes, no initial snapshot
    val sink1 = nextSink()
    val q1 = spark.readStream.format(classOf[CowCdcSourceProvider].getName)
      .option("path", up).option("key", "id").option("startingVersion", "2")
      .load()
      .writeStream.format("memory").queryName(sink1).outputMode("append").start()
    q1.processAllAvailable(); q1.stop()
    val got = spark.table(sink1)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 11L, "update"), (4L, 40L, "insert"), (2L, 20L, "delete")),
      s"changes strictly after v2: $got")

    // maxVersionsPerBatch=1 walks the backlog one table commit per
    // micro-batch; content equality at the end is what matters
    val mirror = s"$dir/m2"; val ckpt = s"$dir/ck2"
    val q2 = Sinks.cdcMirrorStream(
      spark.readStream.format(classOf[CowCdcSourceProvider].getName)
        .option("path", up).option("key", "id")
        .option("startingVersion", "1").option("maxVersionsPerBatch", "1")
        .load(),
      mirror, "id", ckpt)
    q2.processAllAvailable(); q2.stop()
    def canon(p: String): Seq[String] = {
      val df = CowTable.read(spark, p)
      df.select(df.columns.sorted.toIndexedSeq.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    // mirror bootstraps from the post-v1 feed: inserts after v1 (3, 4),
    // the changed v1 row's postimage (1 -> 11), and id 2's delete no-ops
    // (never mirrored) — which here converges to the upstream exactly,
    // since every surviving upstream row changed after v1
    assert(canon(mirror) == canon(up))
    // one upstream version per batch: the mirror's watermark advanced
    // to the head across three separate applied windows
    assert(CowTable.txnVersion(mirror, "cdc-mirror") == 4L)
  }

  test("composed punctuate: event-time finals byte-equal the timer twin; wall-clock heartbeats name open legs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the chainFollowupStream fixture verbatim: five users covering
      // every outcome, chains split across batches
      val b1 = Seq(
        evt(1, "2024-01-01 10:00:00", user = 1, tpe = "signup"),
        evt(2, "2024-01-01 10:00:00", user = 2, tpe = "signup"),
        evt(3, "2024-01-01 10:00:00", user = 3, tpe = "signup"),
        evt(4, "2024-01-01 10:00:00", user = 4, tpe = "signup"),
        evt(5, "2024-01-01 10:00:00", user = 5, tpe = "signup"),
        evt(6, "2024-01-01 11:00:00", user = 3, tpe = "purchase"),
        evt(7, "2024-01-01 11:00:00", user = 5, tpe = "purchase"))
      val b2 = Seq(
        evt(8, "2024-01-01 12:00:00", user = 1, tpe = "purchase"),
        evt(9, "2024-01-01 11:30:00", user = 5, tpe = "error"),
        evt(10, "2024-01-01 12:00:00", user = 5, tpe = "purchase"),
        evt(11, "2024-01-01 12:30:00", user = 4, tpe = "purchase"))
      val b3 = Seq(
        evt(12, "2024-01-01 13:00:00", user = 1, tpe = "error"),
        evt(13, "2024-01-01 14:00:00", user = 4, tpe = "error"))
      val sentinels = Seq(
        Seq(evt(98, "2024-01-03 00:00:00", user = 99)),
        Seq(evt(99, "2024-01-04 00:00:00", user = 99)))
      val stream = MemoryStream[Evt]
      val sink = nextSink()
      val q = StreamOps.reconPunctuateStream(stream.toDF().as[Evt],
          hbIntervalMs = 150L)
        .toDF("kind", "status", "s_id", "v")
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      // ProcessingTime mode keeps the engine polling; drive by sink
      // content (the heartbeat-test protocol), with wall-clock gaps so
      // the 150 ms punctuators fire while legs are genuinely open
      def finals() = spark.table(sink).filter(col("kind") === "final").count()
      def await(atLeast: Long): Unit = {
        val t0 = System.currentTimeMillis()
        while (finals() < atLeast) {
          assert(q.exception.isEmpty, s"query died: ${q.exception}")
          assert(System.currentTimeMillis() - t0 < 90000,
            s"timed out waiting for $atLeast finals (have ${finals()})")
          Thread.sleep(100)
        }
      }
      stream.addData(b1); Thread.sleep(500)
      stream.addData(b2); Thread.sleep(500)
      stream.addData(b3); await(2) // user 5 and user 1 full chains arrive on data
      Thread.sleep(500)
      sentinels.foreach { b => stream.addData(b); Thread.sleep(500) }
      await(5) // every chain resolved once the watermark passes 2024-01-02
      Thread.sleep(500) // let any last armed punctuator fire and go silent
      q.stop()
      val rows = spark.table(sink).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val streamedFinals = rows.filter(_._1 == "final")
        .map(t => (t._2, t._3, t._4)).toSet
      // invariant 1: finals byte-equal the event-time twin's outcomes
      val twinSink = nextSink()
      val twinStream = MemoryStream[Evt]
      val tq = StreamOps.chainFollowupStream(twinStream.toDF().as[Evt])
        .toDF("status", "s_id", "lat")
        .writeStream.format("memory").queryName(twinSink).outputMode("append").start()
      (Seq(b1, b2, b3) ++ sentinels).foreach { b =>
        twinStream.addData(b); tq.processAllAvailable() }
      tq.stop()
      val twinFinals = spark.table(twinSink).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamedFinals == twinFinals,
        s"composed finals diverged:\n$streamedFinals\nvs twin\n$twinFinals")
      assert(streamedFinals.size == 5 &&
        streamedFinals.contains(("full_chain", 1L, 10800L)))
      // invariant 2: every heartbeat names a leg that was OPEN at
      // emission — it must hold a later final, and an open_chain beat
      // can only precede full_chain/purchase_no_error outcomes
      val hbs = rows.filter(_._1 == "hb")
      val finalsBy = streamedFinals.map(t => t._1 -> t._2).groupMap(_._2)(_._1)
      hbs.foreach { case (_, st, id, _) =>
        val outcome = finalsBy.getOrElse(id, Set.empty)
        assert(outcome.nonEmpty, s"heartbeat for unknown leg $id")
        if (st == "open_chain")
          assert(!outcome.contains("no_purchase"),
            s"a chain beat implies the purchase landed: $id -> $outcome")
      }
      // invariant 3: the punctuators really fired while legs waited
      // (wall-clock gaps made every key idle with open state at least
      // once), and each key's heartbeat watermarks are monotone
      assert(hbs.nonEmpty, "no heartbeat observed despite idle gaps")
      hbs.groupBy(t => (t._2, t._3)).values.foreach { perLeg =>
        val wms = perLeg.map(_._4).toSeq
        assert(wms == wms.sorted, s"heartbeat watermarks must be monotone: $wms")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("replay idempotence: every foreachBatch sink body called twice per batch converges") {
    // The r10 high bug (incremental-dedup pairs overwritten by a
    // post-commit replay) lived exactly in the gap between per-sink
    // tests — so the double-call property is asserted HARNESS-WIDE:
    // for every sink's extracted batch body, a run where each batch is
    // delivered TWICE (crash-between-sink-and-checkpoint replay) must
    // leave the same content state as the single-delivery run, after
    // every batch.
    import spark.implicits._
    import graft.sinks.{CowTable, Sinks}
    val root = java.nio.file.Files.createTempDirectory("replay_all").toString

    // column order is NOT part of the contract (a bootstrap-create and
    // a merge may order differently) — sort columns by name, then rows
    def canonDf(df: DataFrame): Seq[String] =
      df.select(df.columns.sorted.toIndexedSeq.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    def canonP(path: String): Seq[String] = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) Seq.empty
      else canonDf(spark.read.parquet(path))
    }
    def canonCow(path: String): Seq[String] =
      if (!CowTable.exists(path)) Seq.empty
      else canonDf(CowTable.read(spark, path))

    case class Sink(name: String,
                    setup: String => Unit,
                    batches: Seq[DataFrame],
                    body: (String, DataFrame, Long) => Unit,
                    state: String => Seq[String])

    // shared read-only dim for the enrich sink (identical for both runs)
    val dimShared = s"$root/dim_shared"
    CowTable.create(Seq((1L, "gold"), (2L, "blue")).toDF("k", "seg"), dimShared)

    val sinks = Seq(
      Sink("scd2",
        _ => (),
        Seq(Seq((1L, "2024-01-01 00:00:00", 10L), (2L, "2024-01-01 00:00:00", 5L))
              .toDF("id", "ts", "v"),
            Seq((1L, "2024-02-01 00:00:00", 20L)).toDF("id", "ts", "v")),
        (d, b, _) => Sinks.scd2Batch(b, s"$d/t", "id", "ts"),
        d => canonP(s"$d/t")),
      Sink("cdcApply",
        _ => (),
        Seq(Seq((1L, "2024-01-01", "upsert", 10L), (2L, "2024-01-01", "upsert", 5L))
              .toDF("id", "ts", "op", "v"),
            Seq((1L, "2024-02-01", "delete", 0L), (3L, "2024-02-01", "upsert", 7L))
              .toDF("id", "ts", "op", "v"),
            Seq((1L, "2024-03-01", "upsert", 30L)).toDF("id", "ts", "op", "v")),
        (d, b, _) => Sinks.cdcApplyBatch(b, s"$d/t", "id", "ts", "op"),
        d => canonP(s"$d/t")),
      Sink("upsert",
        _ => (),
        Seq(Seq((1L, "2024-01-01", 10L), (2L, "2024-01-01", 5L)).toDF("id", "ts", "v"),
            Seq((1L, "2024-02-01", 20L), (3L, "2024-02-01", 7L)).toDF("id", "ts", "v")),
        (d, b, _) => Sinks.upsertBatch(b, s"$d/t", "id", "ts"),
        d => canonP(s"$d/t")),
      Sink("fanout",
        _ => (),
        Seq(Seq(("click", 1L), ("view", 2L)).toDF("event_type", "v"),
            Seq(("click", 3L)).toDF("event_type", "v")),
        (d, b, id) => Sinks.fanoutBatch(b, id, s"$d/raw", s"$d/agg"),
        d => canonP(s"$d/raw") ++ canonP(s"$d/agg")),
      Sink("append",
        _ => (),
        Seq(Seq((1L, 10L), (2L, 5L)).toDF("id", "v"),
            Seq((3L, 7L)).toDF("id", "v")),
        (d, b, id) => Sinks.appendBatch(b, id, s"$d/t", "harness-app"),
        d => canonCow(s"$d/t")),
      Sink("enrichAppend",
        _ => (),
        Seq(Seq((1L, 100L), (9L, 50L)).toDF("k", "amt"),
            Seq((2L, 70L)).toDF("k", "amt")),
        (d, b, id) => Sinks.enrichAppendBatch(b, id, dimShared, "k", s"$d/t", "harness-enr"),
        d => canonCow(s"$d/t")),
      Sink("reconCdc",
        _ => (),
        Seq(Seq((Some(1L), Some(10L), "matched"), (Some(2L), None, "unmatched_a"))
              .toDF("a_id", "b_id", "status"),
            Seq((Some(2L), Some(20L), "matched")).toDF("a_id", "b_id", "status")),
        (d, b, _) => Sinks.reconCdcBatch(b, s"$d/t"),
        d => canonCow(s"$d/t")),
      Sink("gdprDelete",
        d => CowTable.create((0L until 20L).map(i => (i, i * 2)).toDF("id", "v"), s"$d/t"),
        Seq(Seq(Tuple1(3L)).toDF("id"), Seq(Tuple1(7L), Tuple1(3L)).toDF("id")),
        (d, b, _) => Sinks.gdprDeleteBatch(b, s"$d/t", "id"),
        d => canonCow(s"$d/t")),
      Sink("incrementalDedup",
        _ => (),
        Seq(Seq((1L, "en", "web", "a b c d e f g h i j"),
                (2L, "en", "web", "k l m n o p q r s t"))
              .toDF("doc_id", "lang", "source", "text"),
            Seq((10L, "en", "web", "a b c d e f g h i j"))
              .toDF("doc_id", "lang", "source", "text")),
        (d, b, id) => Sinks.incrementalDedupBatch(b, id, s"$d/corpus", s"$d/index",
          s"$d/pairs", Seq("lang", "source")),
        d => canonCow(s"$d/corpus") ++ canonP(s"$d/pairs")),
      Sink("ivfIngest",
        _ => (),
        Seq((0L until 24L).map(i => (i, Array.tabulate(4)(j =>
              math.abs(math.sin(i.toDouble * 7 + j)) + 0.1)))
              .toDF("vec_id", "ve"),
            // batch 2: 4 upserts (vectors move) + 2 inserts
            (Seq(1L, 5L, 9L, 13L).map(i => (i, Array.tabulate(4)(j =>
              math.abs(math.sin(i.toDouble * 7 + j + 500)) + 0.1))) ++
             Seq(30L, 31L).map(i => (i, Array.tabulate(4)(j =>
              math.abs(math.sin(i.toDouble * 7 + j)) + 0.1))))
              .toDF("vec_id", "ve")),
        (d, b, id) => Sinks.ivfIngestBatch(b, id, s"$d/corpus", s"$d/index",
          numCells = 2, iters = 1, maxDrift = 1e9),
        d => canonCow(s"$d/corpus") ++ canonCow(s"$d/index/assign") ++
          canonCow(s"$d/index/centroids")),
      Sink("cdcMirror",
        _ => (),
        // CDC-feed-shaped batches (what the cow-cdc source emits):
        // _commit_version is the UPSTREAM snapshot version per window
        Seq(Seq((1L, 10L, "insert", 1), (2L, 20L, "insert", 1))
              .toDF("id", "v", "_change_type", "_commit_version"),
            Seq((1L, 11L, "update", 2), (3L, 30L, "insert", 2))
              .toDF("id", "v", "_change_type", "_commit_version"),
            Seq((2L, 20L, "delete", 3)).toDF("id", "v", "_change_type", "_commit_version")),
        (d, b, _) => Sinks.cdcMirrorBatch(b, s"$d/t", "id"),
        d => canonCow(s"$d/t")),
      Sink("fkDimFanout",
        d => {
          CowTable.create((0L until 40L).map(i => (i, i % 4, i * 2))
            .toDF("oid", "cust", "amt"), s"$d/fact")
          CowTable.create(Seq((0L, "s0"), (1L, "s1"), (2L, "s2"), (3L, "s3"))
            .toDF("cid", "seg"), s"$d/dim")
          Sinks.bootstrapFkView(spark, s"$d/fact", s"$d/dim", s"$d/view", "cust", "cid")
          ()
        },
        Seq(Seq((1L, "vip")).toDF("cid", "seg"),
            Seq((2L, "churned"), (0L, "s0b")).toDF("cid", "seg")),
        (d, b, _) => Sinks.fkDimFanoutBatch(b, s"$d/dim", s"$d/fact", s"$d/view",
          "oid", "cust", "cid"),
        d => canonCow(s"$d/view") ++ canonCow(s"$d/dim")))

    sinks.foreach { s =>
      val ref = s"$root/${s.name}/ref"; val rep = s"$root/${s.name}/rep"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(ref))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(rep))
      s.setup(ref); s.setup(rep)
      s.batches.zipWithIndex.foreach { case (b, i) =>
        s.body(ref, b, i.toLong)
        s.body(rep, b, i.toLong)
        s.body(rep, b, i.toLong) // the crash-window replay
        assert(s.state(rep) == s.state(ref),
          s"${s.name}: double-delivered batch $i diverged from single delivery")
      }
      assert(s.state(ref).nonEmpty, s"${s.name}: vacuous fixture (empty final state)")
    }
  }

  test("catalog readStream $changes: DSv2 micro-batch face equals the V1 cow-cdc mirror across the 4-commit battery incl. restart") {
    import spark.implicits._
    import graft.sinks.{CowTable, Sinks}
    import graft.sources.CowCdcSourceProvider
    val dir = java.nio.file.Files.createTempDirectory("cow_cat_stream").toString
    spark.conf.set("spark.sql.catalog.cowstr", classOf[graft.sinks.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cowstr.root", dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ns"))
    val up = s"$dir/ns/up"
    val (m1, c1) = (s"$dir/mirror_v1", s"$dir/ckpt_v1")
    val (m2, c2) = (s"$dir/mirror_v2", s"$dir/ckpt_v2")
    CowTable.create(
      (1L to 6L).map(i => (i, s"u$i", i * 10L)).toDF("id", "name", "v"), up)

    def feedV1() = spark.readStream
      .format(classOf[CowCdcSourceProvider].getName)
      .option("path", up).option("key", "id").load()
    def feedV2() = spark.readStream.option("key", "id")
      .table("cowstr.ns.`up$changes`")
    def canon(p: String): Seq[String] = {
      val df = CowTable.read(spark, p)
      df.select(df.columns.sorted.toIndexedSeq.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    }
    def bothMirror(): Unit = {
      val q1 = Sinks.cdcMirrorStream(feedV1(), m1, "id", c1, appId = "v1m")
      val q2 = Sinks.cdcMirrorStream(feedV2(), m2, "id", c2, appId = "v2m")
      q1.processAllAvailable(); q2.processAllAvailable()
      q1.stop(); q2.stop()
      assert(canon(m2) == canon(up), "catalog stream mirror == upstream")
      assert(canon(m2) == canon(m1), "catalog stream == V1 source mirror")
    }
    // batch 1: initial snapshot as inserts
    bothMirror()
    // commit 2: merge window (2 updates + 1 insert)
    CowTable.merge(spark, up,
      Seq((2L, "u2x", 200L), (4L, "u4x", 400L), (7L, "u7", 70L))
        .toDF("id", "name", "v"), "id")
    bothMirror()
    // commits 3+4 land while neither query runs (restart battery): a
    // MoR key delete and a plain append
    CowTable.deleteMorKeys(spark, up, Seq(1L, 5L).toDF("id"), "id")
    CowTable.append(spark, up, Seq((9L, "u9", 90L)).toDF("id", "name", "v"))
    bothMirror()
    assert(CowTable.read(spark, m2).count() == 6L)
    // committed staging batches are vacuumed (bounded checkpoint disk)
    val stage = java.nio.file.Paths.get(c2, "graft-cdc-stage")
    if (java.nio.file.Files.isDirectory(stage)) {
      val left = scala.util.Using.resource(java.nio.file.Files.list(stage))(_.count())
      assert(left == 0, s"$left staged batches survived their commit")
    }
  }

  test("catalog readStream plain table: append-only row stream; rewrite windows fail loudly; startingVersion honored") {
    import spark.implicits._
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("cow_cat_append").toString
    spark.conf.set("spark.sql.catalog.cowstr2", classOf[graft.sinks.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cowstr2.root", dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ns"))
    val t = s"$dir/ns/t"
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    CowTable.create((1L to 3L).map(i => (i, i * 10L)).toDF("id", "v"), t)

    def run(): Unit = {
      val q = spark.readStream.table("cowstr2.ns.t").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); () }
        .start()
      q.processAllAvailable(); q.stop()
    }
    def ids(): Seq[Long] =
      spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted.toSeq
    run() // initial snapshot
    assert(ids() == Seq(1L, 2L, 3L))
    CowTable.append(spark, t, Seq((4L, 40L)).toDF("id", "v"))
    run() // append window streams only the added file's rows
    assert(ids() == Seq(1L, 2L, 3L, 4L))
    // two commits while stopped, one batch after restart: still exact
    CowTable.append(spark, t, Seq((5L, 50L)).toDF("id", "v"))
    CowTable.append(spark, t, Seq((6L, 60L)).toDF("id", "v"))
    run()
    assert(ids() == (1L to 6L), "restart resumed with no gap, no duplicate")
    // a rewrite window is NOT append-only: fail loudly naming $changes
    CowTable.delete(spark, t, "id = 2")
    val q = spark.readStream.table("cowstr2.ns.t").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out); () }
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(e.getMessage.contains("not append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("not append-only")),
      e.getMessage)
    // startingVersion parity: a fresh stream from version 2 sees only
    // the later windows (no initial snapshot)
    val out2 = s"$dir/out2"; val ckpt2 = s"$dir/ckpt2"
    val t2 = s"$dir/ns/t2"
    CowTable.create(Seq((1L, 1L)).toDF("id", "v"), t2)          // v1
    CowTable.append(spark, t2, Seq((2L, 2L)).toDF("id", "v"))   // v2
    CowTable.append(spark, t2, Seq((3L, 3L)).toDF("id", "v"))   // v3
    val q2 = spark.readStream.option("startingVersion", "2")
      .table("cowstr2.ns.t2").writeStream
      .option("checkpointLocation", ckpt2)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out2); () }
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(out2).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(3L),
      "startingVersion=2 must emit only the post-v2 appends")
  }

  test("catalog readStream admission by rows: maxRowsPerBatch admits whole versions up to the budget") {
    import spark.implicits._
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("cow_cat_adm").toString
    spark.conf.set("spark.sql.catalog.cowstr3", classOf[graft.sinks.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cowstr3.root", dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ns"))
    val t = s"$dir/ns/t"
    CowTable.create((1L to 3L).map(i => (i, i)).toDF("id", "v"), t)      // v1: 3 rows
    CowTable.append(spark, t, Seq((4L, 4L), (5L, 5L)).toDF("id", "v"))  // v2: +2
    CowTable.append(spark, t, Seq((6L, 6L), (7L, 7L)).toDF("id", "v"))  // v3: +2
    CowTable.append(spark, t, Seq((8L, 8L), (9L, 9L)).toDF("id", "v"))  // v4: +2
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.option("maxRowsPerBatch", "4")
      .table("cowstr3.ns.t").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += b.count() }; () }
      .start()
    q.processAllAvailable(); q.stop()
    // batch 1 = the initial snapshot (one version, admits whole);
    // batch 2 = v2+v3 (2+2 = the 4-row budget); batch 3 = v4
    assert(sizes.toSeq == Seq(3L, 4L, 2L), sizes.toSeq.toString)
    assert(sizes.sum == 9L, "no gap, no duplicate under row admission")
  }

  test("catalog Trigger.AvailableNow: capped drain covers the start-time backlog in several batches, then terminates") {
    import spark.implicits._
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("cow_cat_an").toString
    spark.conf.set("spark.sql.catalog.cowan", classOf[graft.sinks.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cowan.root", dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ns"))
    val t = s"$dir/ns/t"
    CowTable.create((1L to 3L).map(i => (i, i)).toDF("id", "v"), t)      // v1: 3 rows
    CowTable.append(spark, t, Seq((4L, 4L), (5L, 5L)).toDF("id", "v"))  // v2: +2
    CowTable.append(spark, t, Seq((6L, 6L), (7L, 7L)).toDF("id", "v"))  // v3: +2
    CowTable.append(spark, t, Seq((8L, 8L), (9L, 9L)).toDF("id", "v"))  // v4: +2
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Seq[Long] = {
      sizes.synchronized(sizes.clear())
      val q = spark.readStream.option("maxRowsPerBatch", "4")
        .table("cowan.ns.t").writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.synchronized { sizes += b.count() }; () }
        .start()
      // AvailableNow must STOP BY ITSELF once the start-time backlog
      // drains — this await is the termination assertion
      assert(q.awaitTermination(120000), "AvailableNow run did not terminate")
      sizes.synchronized(sizes.toSeq)
    }
    // the row cap still shapes admission under AvailableNow (the native
    // fence, NOT Spark's one-giant-batch wrapper): snapshot, v2+v3
    // within the 4-row budget, v4 — 3 capped batches, one run
    assert(drain() == Seq(3L, 4L, 2L), sizes.toSeq.toString)
    // a second run with nothing new is an empty no-op that terminates
    assert(drain().forall(_ == 0L))
    // versions committed after the previous run belong to the NEXT run
    CowTable.append(spark, t, Seq((10L, 10L)).toDF("id", "v"))          // v5: +1
    CowTable.append(spark, t, Seq((11L, 11L)).toDF("id", "v"))          // v6: +1
    assert(drain().filter(_ > 0L) == Seq(2L), sizes.toSeq.toString)
    // the $changes CDC face drains under AvailableNow too, one version
    // per batch under maxVersionsPerBatch=1
    val vcount = CowTable.currentVersion(t)
    val csizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val cq = spark.readStream.option("maxVersionsPerBatch", "1")
      .option("key", "id").option("startingVersion", "1")
      .table("cowan.ns.`t$changes`").writeStream
      .option("checkpointLocation", s"$dir/ckpt_cdc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        csizes.synchronized { csizes += b.count() }; () }
      .start()
    assert(cq.awaitTermination(120000), "CDC AvailableNow run did not terminate")
    val cs = csizes.synchronized(csizes.toSeq).filter(_ > 0L)
    assert(cs == Seq(2L, 2L, 2L, 1L, 1L),
      s"one version per batch from startingVersion=1 through v6: $cs")
    assert(vcount == CowTable.currentVersion(t))
  }

  test("catalog writeStream.toTable: exactly-once append through the V2 streaming face") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("cow_swrite").toString
    spark.conf.set("spark.sql.catalog.cowsw", classOf[graft.sinks.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cowsw.root", dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ns"))
    spark.sql("CREATE TABLE cowsw.ns.t (id BIGINT, g BIGINT) PARTITIONED BY (g)")
    val t = s"$dir/ns/t"
    val ckpt = s"$dir/ckpt"
    val stream = MemoryStream[(Long, Long)]
    def start() = stream.toDF().toDF("id", "g").writeStream
      .option("checkpointLocation", ckpt).toTable("cowsw.ns.t")
    val q = start()
    try {
      stream.addData((0L until 90L).map(i => (i, i % 3)))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cowsw.ns.t").head().getLong(0) == 90L)
      // the epoch's files carry the CLUSTERED layout (streaming writes
      // go through the same RequiresDistributionAndOrdering prep)
      val f1 = CowTable.snapshotFiles(t)
      assert(f1.size == 3, s"one file per g value per epoch, got ${f1.size}")
      assert(f1.forall(_.contains("p_g=")), f1.take(2).toString)
      stream.addData((90L until 120L).map(i => (i, i % 3)))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM cowsw.ns.t").head().getLong(0) == 120L)
    } finally q.stop()
    // restart on the same checkpoint: resumes exactly, no duplicates
    val q2 = start()
    try {
      stream.addData((120L until 150L).map(i => (i, i % 3)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.sql("SELECT count(DISTINCT id) FROM cowsw.ns.t").head().getLong(0) == 150L)
    assert(spark.sql("SELECT count(*) FROM cowsw.ns.t").head().getLong(0) == 150L,
      "restart must not duplicate rows")
    // the exactly-once machinery: epoch watermarks rode the manifest,
    // and a REPLAYED epoch commit is a no-op that reclaims its files
    val app = CowTable.txnVersion(t, s"cowstream-${q2.id}")
    assert(app >= 0L, s"epoch watermark missing: $app")
    val before = CowTable.currentVersion(t)
    Seq((999L, 0L)).toDF("id", "g").repartition(1).write.parquet(s"$t/data/orphan_dir")
    val of = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$t/data/orphan_dir"))) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
    }
    graft.sinks.CowTable.commitWrittenFiles(spark, t, Seq(of.toString),
      overwrite = false, txn = Some((s"cowstream-${q2.id}", 0L)))
    assert(CowTable.currentVersion(t) == before, "replayed epoch must not commit")
    assert(!java.nio.file.Files.exists(of), "replayed epoch's files are reclaimed")
  }

  test("catalog readStream row cap: anchor advances past rewrite history (ADVICE r16)") {
    import spark.implicits._
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("cow_cat_adm2").toString
    spark.conf.set("spark.sql.catalog.cowstr4", classOf[graft.sinks.CowCatalog].getName)
    spark.conf.set("spark.sql.catalog.cowstr4.root", dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/ns"))
    val t = s"$dir/ns/t"
    CowTable.create((1L to 3L).map(i => (i, i)).toDF("id", "v"), t)      // v1
    CowTable.append(spark, t, Seq((4L, 4L)).toDF("id", "v"))             // v2
    CowTable.delete(spark, t, "id = 2")                                  // v3: REWRITE
    CowTable.append(spark, t, Seq((5L, 5L), (6L, 6L)).toDF("id", "v"))  // v4
    CowTable.append(spark, t, Seq((7L, 7L), (8L, 8L)).toDF("id", "v"))  // v5
    // capped + no startingVersion: the old earliest-version anchor
    // replayed the v2->v3 rewrite window and threw 'not append-only';
    // the anchor must advance to v3 (snapshot there), then honor the
    // 2-row budget across the append-only windows forward
    val out = s"$dir/out"
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.option("maxRowsPerBatch", "2")
      .table("cowstr4.ns.t").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.synchronized { sizes += b.count() }
        b.write.mode("append").parquet(out); () }
      .start()
    q.processAllAvailable(); q.stop()
    // batch 1 = snapshot at v3 (1,3,4 — post-delete), then v4, then v5
    assert(sizes.toSeq == Seq(3L, 2L, 2L), sizes.toSeq.toString)
    assert(spark.read.parquet(out).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L),
      "snapshot-at-rewrite-boundary + windows forward = the table's rows")
    // an explicit startingVersion BEFORE the rewrite still fails loudly
    // (the user pinned the replay; skipping it would be silent)
    val q2 = spark.readStream.option("maxRowsPerBatch", "2")
      .option("startingVersion", "1")
      .table("cowstr4.ns.t").writeStream
      .option("checkpointLocation", s"$dir/ckpt2")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(e.getMessage.contains("not append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("not append-only")), e.getMessage)
  }
}
