package graft

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Source/serde surface tests: JSON-lines, CSV, JSON-payload decode,
  * and the streaming file source all yield the canonical event schema
  * and the same rows as the parquet ground truth.
  */
class SourcesSpec extends SparkSpecBase {

  private lazy val events = graft.tables.Tables.t(spark, sf, "events")
  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft_src").toString

  test("JSON-lines round trip preserves rows and schema") {
    val path = s"$tmp/events_json"
    events.coalesce(1).write.mode("overwrite").json(path)
    val back = Sources.eventsFromJsonLines(spark, path)
    assert(back.schema == Sources.eventSchema)
    assert(back.count() == events.count())
    val a = events.agg(sum("event_id"), sum(round(col("value") * 100).cast("long"))).collect().head
    val b = back.agg(sum("event_id"), sum(round(col("value") * 100).cast("long"))).collect().head
    assert(a == b)
  }

  test("CSV round trip preserves rows") {
    val path = s"$tmp/events_csv"
    events
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    val back = Sources.eventsFromCsv(spark, path)
    assert(back.count() == events.count())
    // timestamps survive the round trip to the microsecond
    val a = events.agg(sum(unix_timestamp(col("ts")))).collect().head
    val b = back.agg(sum(unix_timestamp(col("ts")))).collect().head
    assert(a == b)
  }

  test("ORC round trip preserves rows and pushes filters") {
    val path = s"$tmp/events_orc"
    events.coalesce(1).write.mode("overwrite").orc(path)
    val back = Sources.eventsFromOrc(spark, path)
    assert(back.schema == Sources.eventSchema)
    assert(back.count() == events.count())
    val filtered = back.filter(col("user_id") < 10).select("event_id", "user_id")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(user_id), LessThan(user_id"),
      p.take(400))
    assert(filtered.count() ==
      events.filter(col("user_id") < 10).count())
  }

  test("JSON payload serde decodes to canonical columns") {
    val payloads = events.select(to_json(struct(events.columns.map(col): _*)).as("value"))
    val decoded = Sources.decodeJsonPayload(payloads, "value")
    assert(decoded.schema == Sources.eventSchema)
    assert(decoded.count() == events.count())
  }

  test("streaming file source processes existing files as a batch") {
    val path = s"$tmp/events_stream"
    events.write.mode("overwrite").parquet(path)
    val q = Sources.eventsStream(spark, path)
      .groupBy("event_type").agg(count(lit(1)).as("c"))
      .writeStream.format("memory").queryName("src_stream").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("src_stream").agg(sum("c")).collect().head.getLong(0)
    assert(streamed == events.count())
  }

  test("GraftExtensions registers SQL functions usable from spark.sql") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // keep the shared session alive (same SparkContext)
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      extended.read.parquet(s"$sf/embeddings.parquet").limit(5)
        .createOrReplaceTempView("emb5")
      val viaSql = extended.sql(
        """SELECT vec_id,
          |  vec_dot(embedding, embedding) sq,
          |  round(vec_cosine(embedding, embedding)) one,
          |  simhash(array('a','b')) sh,
          |  size(minhash(array('a','b'), 16)) k
          |FROM emb5 ORDER BY vec_id""".stripMargin).collect()
      assert(viaSql.length == 5)
      assert(viaSql.forall(_.getAs[Double]("one") == 1.0))
      assert(viaSql.forall(_.getAs[Int]("k") == 16))
      assert(extended.sql(
        "SELECT sorted_jaccard(array('a','b'), array('a','c')) j").collect()
        .head.getAs[Double]("j") > 0.3)
      // bottom_k registered as a SQL aggregate: 2 smallest of 5 structs
      val bk = extended.sql(
        """SELECT bottom_k(named_struct('v', vec_id), 2) b
          |FROM emb5""".stripMargin).collect().head
        .getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0))
      assert(bk == Seq(0L, 1L), bk.toString)
      // jaro_winkler registered and agrees with the static kernel
      val jwSql = extended.sql(
        "SELECT jaro_winkler('MARTHA', 'MARHTA') j").collect().head.getDouble(0)
      assert(jwSql == graft.functions.StrSim.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString("MARTHA"),
        org.apache.spark.unsafe.types.UTF8String.fromString("MARHTA")))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("JaccardPrefilterRule injects size guard and preserves the result set") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      extended.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs")
      val sql =
        """WITH toks AS (SELECT doc_id, lang, source,
          |  array_sort(array_distinct(split(text, ' '))) tk FROM docs)
          |SELECT a.doc_id a_id, b.doc_id b_id FROM toks a JOIN toks b
          |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
          |  WHERE sorted_jaccard(a.tk, b.tk) >= 0.9""".stripMargin
      val df = extended.sql(sql)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("size("),
        s"size-ratio prefilter missing from optimized plan:\n${optimized.take(600)}")
      // same pair set as the rule-free DataFrame implementation
      val viaRule = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plain = SparkEntry.queries("dedup_near_jaccard")(extended, sf)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      assert(viaRule == plain)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("CosineBandRule bands the cosine-threshold join and preserves results") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // dedup_embedding_cosine's shape: same-language inner self-join
      // with a cosine > 0.42 predicate over precomputed norms
      val df = SparkEntry.queries("dedup_embedding_cosine")(extended, sf)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__cosb"),
        s"cosine band key missing from optimized plan:\n${optimized.take(800)}")
      assert(optimized.toLowerCase.contains("vecsum"),
        s"projection kernel missing:\n${optimized.take(800)}")
      // the band key turns the pure-theta join into an equi-join: no
      // nested-loop join remains in the physical plan
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical.take(800))
      // identical pair set with the rule off (the shared plain session)
      val banded = df.collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
                   r.getAs[Long]("sim_pct"))).toSet
      val plain = q("dedup_embedding_cosine").collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
                   r.getAs[Long]("sim_pct"))).toSet
      assert(banded == plain)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("CosineBandRule is ragged-safe: no size guard → no rewrite, no dropped pairs") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import extended.implicits._
      import graft.functions.VectorFunctions.vec_dot
      // the round-2 advice counterexample: a 4-dim and a 1-dim vector
      // have truncating-cosine 1 but land in non-adjacent band buckets
      val vs = Seq(
        (1L, Seq(1.0, 0.0, 0.0, 0.0)),
        (2L, Seq(1.0)),
        (3L, Seq(0.95, 0.05, 0.0, 0.0)),
        (4L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "ve")
        // barrier: without it ConvertToLocalRelation folds the norm
        // projection into the LocalRelation and the rule (correctly)
        // can no longer prove na/nb are norms — real corpora are
        // file-backed, which is what this mimics
        .repartition(2)
        .withColumn("nv", sqrt(vec_dot(col("ve"), col("ve"))))
      val a = vs.select(col("id").as("a_id"), col("ve").as("va"), col("nv").as("na"))
      val b = vs.select(col("id").as("b_id"), col("ve").as("vb"), col("nv").as("nb"))
      def pairs(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // WITHOUT a size(a)=size(b) conjunct the band bound is invalid
      // for ragged pairs — the rule must leave the join alone, and
      // every truncating-cosine pair must survive
      val ragged = a.join(b, col("a_id") < col("b_id") &&
          vec_dot(col("va"), col("vb")) / (col("na") * col("nb")) > lit(0.9))
        .select("a_id", "b_id")
      assert(!ragged.queryExecution.optimizedPlan.toString.contains("__cosb"),
        "rule fired without an equal-dimensionality guarantee")
      assert(pairs(ragged) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
      // WITH the conjunct the rewrite is sound: it fires and returns
      // exactly the equal-dimension qualifying pairs
      val guarded = a.join(b, col("a_id") < col("b_id") &&
          size(col("va")) === size(col("vb")) &&
          vec_dot(col("va"), col("vb")) / (col("na") * col("nb")) > lit(0.9))
        .select("a_id", "b_id")
      assert(guarded.queryExecution.optimizedPlan.toString.contains("__cosb"),
        "rule must fire once dimensions are pinned equal")
      assert(pairs(guarded) == Set((1L, 3L)))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("LevenshteinPrefilterRule injects a length-gap guard and preserves results") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.functions.{abs => cabs, _}
      val base = extended.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
      val a = base.select(col("doc_id").as("a_id"), col("lang"), col("source"),
                          col("text").as("a_text"))
      val b = base.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                          col("source").as("b_source"), col("text").as("b_text"))
      // NO manual length-gap prefilter: the rule must supply it, for
      // BOTH predicate forms
      val plainForm = a.join(b,
          col("lang") === col("b_lang") && col("source") === col("b_source") &&
          col("a_id") < col("b_id") &&
          levenshtein(col("a_text"), col("b_text")) <= 20)
        .select("a_id", "b_id")
      val threshForm = a.join(b,
          col("lang") === col("b_lang") && col("source") === col("b_source") &&
          col("a_id") < col("b_id") &&
          levenshtein(col("a_text"), col("b_text"), 20) >= 0)
        .select("a_id", "b_id")
      for ((df, form) <- Seq((plainForm, "plain"), (threshForm, "thresholded"))) {
        val optimized = df.queryExecution.optimizedPlan.toString
        assert(optimized.contains("length("),
          s"$form form: length-gap guard missing:\n${optimized.take(800)}")
      }
      // identical pair set to the guard-free join in the PLAIN session
      // (the guard is a necessary condition, so results cannot change)
      val viaRule = plainForm.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val aP = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").as("a_id"), col("lang"), col("source"),
                col("text").as("a_text"))
      val bP = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
                col("source").as("b_source"), col("text").as("b_text"))
      val plain = aP.join(bP,
          col("lang") === col("b_lang") && col("source") === col("b_source") &&
          col("a_id") < col("b_id") &&
          levenshtein(col("a_text"), col("b_text")) <= 20)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaRule == plain)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("malformed CSV rows quarantine in _corrupt_record, never kill or silently vanish") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    val f = dir.resolve("events.csv")
    java.nio.file.Files.writeString(f,
      """event_id,ts,user_id,event_type,value,props
        |1,2024-01-01 10:00:00.000000,7,click,1.50,{}
        |not-a-long,garbage-timestamp,x,?,NaNaN,{{{
        |3,2024-01-02 11:30:00.000000,8,view,2.25,{}
        |""".stripMargin)
    val df = graft.sources.Sources.eventsFromCsvQuarantined(spark, f.toString).cache()
    assert(df.count() == 3) // nothing dropped, nothing failed
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.collect().head.getAs[String]("_corrupt_record").startsWith("not-a-long"))
    // clean rows parse fully typed
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.agg(sum(round(col("value") * 100).cast("long"))).collect().head.getLong(0) == 375L)
    df.unpersist()
  }

  private def seqDf(opts: (String, String)*) = {
    val r = spark.read.format(classOf[graft.sources.SeqDataSource].getName)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("DSv2 SeqSource: deterministic rows, id-range filter pushdown narrows the scan") {
    import org.apache.spark.sql.functions._
    val df = seqDf("rows" -> "10000", "users" -> "50")
    assert(df.count() == 10000)
    val filtered = df.filter(col("id") >= 9990L && col("id") < 9995L)
    assert(filtered.count() == 5)
    // the range reached the Scan (generator analogue of row-group pruning)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("SeqScan[lo=9990, hi=9995"), p.take(1200))
    // and row content is the documented pure function of id
    val r = filtered.orderBy("id").collect().head
    assert(r.getAs[Long]("id") == 9990L)
    assert(r.getAs[Long]("user_id") == 9990L % 50)
    assert(r.getAs[String]("event_type") == "click") // 9990 % 5 == 0
    assert(r.getAs[Double]("value") == 9990 % 10000 / 100.0)
  }

  test("DSv2 SeqSource: complete aggregate pushdown answers count/min/max in O(1)") {
    import org.apache.spark.sql.functions._
    // a "billion-row" table: any plan that actually generates rows
    // would take minutes — the closed-form SeqAggScan answers instantly
    val big = seqDf("rows" -> "1000000000")
    val t0 = System.nanoTime()
    val r = big.agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1000000000L, 0L, 999999999L))
    assert(sec < 30, s"closed-form aggregate took ${sec}s — rows were generated")
    // the plan carries the pushed aggregate scan and NO aggregate exec
    val p = big.agg(count(lit(1)), min("id"), max("id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("SeqAggScan"), p.take(800))
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"), p.take(800))
    // composes with filter pushdown: the WHERE narrows [lo, hi) FIRST
    val f = big.filter(col("id") >= 10L && col("id") < 17L)
      .agg(count(lit(1)), min("id"), max("id")).collect().head
    assert((f.getLong(0), f.getLong(1), f.getLong(2)) == (7L, 10L, 16L))
    // empty interval: SQL aggregate semantics (count 0, min/max NULL)
    val e = big.filter(col("id") < 0L)
      .agg(count(lit(1)), min("id"), max("id")).collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(1) && e.isNullAt(2))
    // declined shapes still work through the normal row scan: group-bys
    // and non-id aggregates are NOT pushed
    val g = seqDf("rows" -> "1000")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(g.queryExecution.executedPlan.toString.contains("SeqScan"))
    assert(g.count() == 100)
    val v = seqDf("rows" -> "1000").agg(min("value")).collect().head
    assert(v.getDouble(0) == 0.0)
  }

  test("DSv2 SeqSource: limit pushdown caps generation before partition planning") {
    import org.apache.spark.sql.functions._
    // a billion-row table: limit(7) must generate 7 rows, not 1e9
    val df = seqDf("rows" -> "1000000000").limit(7)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SeqScan[lo=0, hi=7"), p.take(1200))
    assert(df.count() == 7)
    // composes with filter pushdown: the limit caps the NARROWED range
    val both = seqDf("rows" -> "1000000000")
      .filter(col("id") >= 500L).limit(3)
    val p2 = both.queryExecution.executedPlan.toString
    assert(p2.contains("SeqScan[lo=500, hi=503"), p2.take(1200))
    assert(both.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(500L, 501L, 502L))
  }

  test("DSv2 SeqSource: column pruning reaches the reader") {
    import org.apache.spark.sql.functions._
    val df = seqDf("rows" -> "1000").select("user_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=user_id]"), p.take(1200)) // only the projected field generates
    assert(df.distinct().count() == 100)
  }

  test("DSv2 SeqSource: columnar read path feeds ColumnarToRow, content identical to row path") {
    import org.apache.spark.sql.functions._
    val colDf = seqDf("rows" -> "10000", "users" -> "50", "columnar" -> "true")
    val plan = colDf.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan.take(1200))
    val rowDf = seqDf("rows" -> "10000", "users" -> "50")
    val agg = (df: org.apache.spark.sql.DataFrame) => df.agg(
      sum("id"), sum(round(col("value") * 100).cast("long")),
      min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
      count(lit(1))).collect().head
    assert(agg(colDf) == agg(rowDf))
    // string + pruned-schema decode paths agree too
    val byType = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType(colDf) == byType(rowDf))
    // pushdown composes with the columnar face
    assert(colDf.filter(col("id") >= 9995L).count() == 5)
  }

  test("DSv2 SeqSource: reported key-grouped partitioning makes keyed agg and join shuffle-free") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val prev = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.sources.v2.bucketing.enabled", "true")
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
      def pdf = s.read.format(classOf[graft.sources.SeqDataSource].getName)
        .option("rows", "10000").option("users", "20")
        .option("partitionByUser", "true").load()
      // keyed aggregation: ClusteredDistribution(user_id) satisfied by
      // the scan's KeyGroupedPartitioning — NO exchange anywhere
      val agg = pdf.groupBy("user_id").agg(count(lit(1)).as("c"), sum("value").as("v"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), aggPlan.take(1500))
      val rows = agg.collect()
      assert(rows.length == 20 && rows.forall(_.getAs[Long]("c") == 500L))
      // storage-partitioned join: both sides report the same key
      // grouping, so the equi-join is co-located — NO shuffle either
      val joined = pdf.as("a").join(pdf.as("b"), "user_id")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val jPlan = joined.queryExecution.executedPlan.toString
      assert(!jPlan.contains("Exchange"), jPlan.take(1500))
      assert(joined.collect().forall(_.getAs[Long]("n") == 500L * 500L))
      // content identical to the range-partitioned form of the source
      val plain = seqDf("rows" -> "10000", "users" -> "20")
        .agg(sum("id"), sum(round(col("value") * 100).cast("long"))).collect().head
      val keyed = pdf
        .agg(sum("id"), sum(round(col("value") * 100).cast("long"))).collect().head
      assert(plain == keyed)
      // SupportsReportOrdering: with broadcast off, the equi-join
      // becomes a sort-merge join with NO Sort node — the scan's
      // reported (user_id, id) ordering feeds SMJ directly
      // (scan → SMJ: no exchange, no sort)
      val smj = pdf.as("a").hint("merge")
        .join(pdf.as("b").hint("merge"), "user_id")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val smjPlan = smj.queryExecution.executedPlan.toString
      assert(smjPlan.contains("SortMergeJoin"), smjPlan.take(1500))
      assert(!smjPlan.contains("+- Sort "), smjPlan.take(1500))
      assert(!smjPlan.contains("Exchange"), smjPlan.take(1500))
      assert(smj.collect().forall(_.getAs[Long]("n") == 500L * 500L))
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("DSv2 SeqSource streams: micro-batches drain the range deterministically") {
    import org.apache.spark.sql.functions._
    val sink = s"seq_stream_${System.nanoTime()}"
    val q = spark.readStream.format(classOf[graft.sources.SeqDataSource].getName)
      .option("rows", "250").option("rowsPerBatch", "100")
      .load()
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    // 3 micro-batches (100 + 100 + 50), then latestOffset stays parked
    q.processAllAvailable()
    q.stop()
    val got = spark.table(sink)
    assert(got.count() == 250)
    // content identical to the batch read of the same range
    val batch = spark.read.format(classOf[graft.sources.SeqDataSource].getName)
      .option("rows", "250").load()
    assert(got.orderBy("id").collect().toSeq == batch.orderBy("id").collect().toSeq)
  }

  test("DSv2 SeqSource: checkpoint restart resumes from the committed offset, exactly once") {
    import org.apache.spark.sql.functions._
    // phase 1 drains rows [0, 300) and checkpoints; phase 2 reuses the
    // SAME checkpoint with the range widened to 1000. A restart-safe
    // source resumes at the committed offset (300) and emits exactly
    // the 700 missing rows; the old driver-local cursor would regress
    // below the committed offset and replay/stall. Distinct-id count
    // catches both duplication and loss.
    val dir = java.nio.file.Files.createTempDirectory("graft_seq_restart").toString
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    def run(rows: Int): Unit = {
      val q = spark.readStream.format(classOf[graft.sources.SeqDataSource].getName)
        .option("rows", rows.toString).option("rowsPerBatch", "100")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    run(300)
    assert(spark.read.parquet(out).count() == 300)
    run(1000)
    val ids = spark.read.parquet(out).select("id")
    assert(ids.count() == 1000, "resume must emit exactly the missing 700 rows")
    assert(ids.distinct().count() == 1000, "no row may be replayed across the restart")
    assert(ids.agg(min("id"), max("id")).collect().head.toSeq == Seq(0L, 999L))
  }

  test("DSv2 SeqSource: partition planning splits the narrowed range only") {
    import org.apache.spark.sql.functions._
    val df = seqDf("rows" -> "1000000", "slices" -> "8")
      .filter(col("id") < 100L)
    // 100 rows / 8 slices -> every partition tiny; full plan would be 1M rows
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions <= 8)
  }
}
