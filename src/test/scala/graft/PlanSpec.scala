package graft

import org.apache.spark.sql.functions._

/** Plan-regression guards: the physical properties PLANS.md documents,
  * asserted so a refactor can't silently lose them.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("direct parquet scans push filters and prune columns") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      p.take(400))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_shipdate"))
  }

  test("topk_global fuses into TakeOrderedAndProject (no full sort)") {
    assert(plan("topk_global").contains("TakeOrderedAndProject"))
  }

  test("q5 joins are all broadcast at this scale (no sort-merge)") {
    // materialize the Tables cache first: the hint-free library default
    // relies on the planner seeing sizes, and only a MATERIALIZED cache
    // carries exact (tiny) sizes — un-executed plans fall back to
    // static estimates that the semi join defeats. Order-independent
    // this way (the full suite used to materialize it incidentally).
    q("q5_local_supplier").count()
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("q3/q5 stay broadcast-joined at sf0.1 (hints beat bad static estimates)") {
    // the sf0.001 guard below can't catch this: small inputs broadcast
    // regardless; at sf0.1 the filtered/semi-joined intermediates
    // defeat static size estimates and only the explicit hints keep
    // orders⋈lineitem off a sort-merge join. The hints are gated on
    // the bench session's conf (they are an OOM hazard beyond bench
    // scale), so this guard asserts the BENCH-shape plan.
    spark.conf.set("spark.graft.benchHints", "true")
    try {
      for (name <- Seq("q3_shipping_priority", "q5_local_supplier")) {
        val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
          .queryExecution.executedPlan.toString
        assert(!p.contains("SortMergeJoin"), s"$name at sf0.1:\n${p.take(600)}")
      }
    } finally spark.conf.unset("spark.graft.benchHints")
  }

  test("topkRewrite flag: row_number<=k becomes bottom_k aggregate, identical rows") {
    import org.apache.spark.sql.SparkSession
    val off = q("win_topk_per_group").collect().map(_.toSeq).toSeq
    val offPlan = plan("win_topk_per_group")
    assert(offPlan.contains("Window") && !offPlan.contains("bottom_k"),
      "default (off) must keep the window plan:\n" + offPlan.take(400))
    // the rule ships via GraftExtensions (like the similarity rules),
    // so the on-direction needs an extended session — same pattern as
    // SourcesSpec; the shared SparkContext is reused
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // flag still off in the extended session: plan must keep Window
      val dfExtOff = SparkEntry.queries("win_topk_per_group")(extended, sf)
      val extOffPlan = dfExtOff.queryExecution.executedPlan.toString
      assert(extOffPlan.contains("Window") && !extOffPlan.contains("bottom_k"),
        "rule registered but flag off must keep the window plan:\n" + extOffPlan.take(600))
      extended.conf.set("spark.graft.topkRewrite", "true")
      val dfOn = SparkEntry.queries("win_topk_per_group")(extended, sf)
      val onPlan = dfOn.queryExecution.executedPlan.toString
      assert(onPlan.contains("bottom_k") && !onPlan.contains("Window"),
        "flag on must replace the window with the heap aggregate:\n" + onPlan.take(600))
      assert(dfOn.collect().map(_.toSeq).toSeq == off)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("join_theta_band: shipped form is a banded equi-join equal to the naive BNLJ twin") {
    import org.apache.spark.sql.functions._
    val p = plan("join_theta_band")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "shipped theta-band must never plan a nested loop:\n" + p.take(800))
    val naive = broadcast(graft.tables.Tables.t(spark, sf, "supplier"))
      .join(graft.tables.Tables.t(spark, sf, "customer"),
        col("c_acctbal").between(col("s_acctbal") - 100, col("s_acctbal") + 100))
      .groupBy("s_suppkey").agg(count(lit(1)).as("c")).orderBy("s_suppkey")
      .collect().map(_.toSeq).toSeq
    assert(q("join_theta_band").collect().map(_.toSeq).toSeq == naive,
      "banded equi-join must equal the naive nested-loop twin")
  }

  test("bandJoinRewrite flag: band theta-join becomes a bucketed equi-join, identical rows") {
    import org.apache.spark.sql.SparkSession
    // a user-declared naive band join (the shape the shipped
    // join_theta_band used before it was natively banded in r18)
    def naiveBand(s: SparkSession) = {
      import org.apache.spark.sql.functions._
      graft.tables.Tables.t(s, sf, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"))
        .join(graft.tables.Tables.t(s, sf, "customer")
            .select(col("c_custkey"), col("c_acctbal")),
          col("c_acctbal").between(col("s_acctbal") - 100, col("s_acctbal") + 100))
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("c"))
        .orderBy("s_suppkey")
    }
    val off = naiveBand(spark).collect().map(_.toSeq).toSeq
    assert(naiveBand(spark).queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
      "plain session must plan the declared nested-loop band join")
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val extOffPlan = naiveBand(extended)
        .queryExecution.executedPlan.toString
      assert(extOffPlan.contains("BroadcastNestedLoopJoin"),
        "rule registered but flag off must keep the nested loop:\n" + extOffPlan.take(600))
      extended.conf.set("spark.graft.bandJoinRewrite", "true")
      val dfOn = naiveBand(extended)
      val onPlan = dfOn.queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin") &&
             !onPlan.contains("CartesianProduct") && onPlan.contains("__bandb"),
        "flag on must plan the bucketed equi-join:\n" + onPlan.take(800))
      assert(dfOn.collect().map(_.toSeq).toSeq == off,
        "banding must not change the result")
      // the asymmetric/reversed orientation fires too, and stays exact:
      // supplier bounded by customer mirror (x on the RIGHT side)
      import org.apache.spark.sql.functions._
      def mirror(s: SparkSession) = {
        val sup = graft.tables.Tables.t(s, sf, "supplier")
          .select(col("s_suppkey"), col("s_acctbal"))
        val cust = graft.tables.Tables.t(s, sf, "customer")
          .select(col("c_custkey"), col("c_acctbal"))
        sup.join(cust,
            col("c_acctbal") >= col("s_acctbal") - 40.0 &&
            col("c_acctbal") <= col("s_acctbal") + 60.0)
          .groupBy("s_suppkey").agg(count(lit(1)).as("c")).orderBy("s_suppkey")
      }
      extended.conf.set("spark.graft.bandJoinRewrite", "false")
      val mOff = mirror(extended).collect().map(_.toSeq).toSeq
      extended.conf.set("spark.graft.bandJoinRewrite", "true")
      val mOnDf = mirror(extended)
      assert(mOnDf.queryExecution.executedPlan.toString.contains("__bandb"),
        "asymmetric band must fire")
      assert(mOnDf.collect().map(_.toSeq).toSeq == mOff)
      // NEGATIVES (must NOT fire): both band expressions on one side
      // (a filter, not a join-locality statement), and a non-literal
      // width (no W to bucket by)
      import org.apache.spark.sql.functions._
      val sup = graft.tables.Tables.t(extended, sf, "supplier")
        .select(col("s_suppkey"), col("s_acctbal"), col("s_nationkey"))
      val cust = graft.tables.Tables.t(extended, sf, "customer")
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
      val sameSide = sup.join(cust,
        col("s_nationkey") === col("c_nationkey") &&
        col("s_acctbal") >= col("s_acctbal") - 10.0 &&
        col("s_acctbal") <= col("s_acctbal") + 10.0)
      assert(!sameSide.queryExecution.executedPlan.toString.contains("__bandb"),
        "one-sided band must not fire")
      val varWidth = sup.join(cust,
        col("c_acctbal") >= col("s_acctbal") - col("s_nationkey") &&
        col("c_acctbal") <= col("s_acctbal") + col("s_nationkey"))
      assert(!varWidth.queryExecution.executedPlan.toString.contains("__bandb"),
        "non-literal width must not fire")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("bandJoinRewrite guard: magnitudes past width*2^50 raise instead of dropping pairs") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      extended.conf.set("spark.graft.bandJoinRewrite", "true")
      import extended.implicits._
      def bandQ(scale: Double, w: Double) = {
        val l = Seq(1e18 * scale, 2e18 * scale).toDF("lv").withColumn("lid", lit(1L))
        val r = Seq(1e18 * scale + w / 2).toDF("rv").withColumn("rid", lit(2L))
        l.join(r, col("lv") >= col("rv") - w && col("lv") <= col("rv") + w)
      }
      // |x| ~ 1e18 with W = 1: floor(x/W) double rounding can shift the
      // bucket past the ±2 probe slack — completeness is unprovable, so
      // the rewritten plan must fail LOUDLY, never silently drop pairs
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
      // (on a local-relation fixture the optimizer itself evaluates the
      // guard — loud at plan OR run time is equally acceptable)
      val e = intercept[Exception] { bandQ(1.0, 1.0).collect() }
      assert(msgs(e).contains("probe slack"),
        s"expected the band-guard error, got: ${msgs(e).take(300)}")
      // same shape inside the guard: fires and matches the nested loop
      val okOn = bandQ(1e-6, 1.0) // |x| ~ 1e12 < 2^50
      assert(okOn.queryExecution.executedPlan.toString.contains("__bandb"))
      val onRows = okOn.collect().map(_.toSeq).toSeq
      extended.conf.set("spark.graft.bandJoinRewrite", "false")
      assert(bandQ(1e-6, 1.0).collect().map(_.toSeq).toSeq == onRows)
      // NULL values keep flowing through as non-matching, no error
      extended.conf.set("spark.graft.bandJoinRewrite", "true")
      val ln = Seq(Some(100.0), None).toDF("lv")
      val rn = Seq(Some(100.5)).toDF("rv")
      val withNull = ln.join(rn,
        col("lv") >= col("rv") - 1.0 && col("lv") <= col("rv") + 1.0)
      assert(withNull.queryExecution.executedPlan.toString.contains("__bandb"))
      assert(withNull.collect().length == 1)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("asofRewrite flag: declared as-of shapes route onto AsOfMergeExec, identical rows") {
    import org.apache.spark.sql.SparkSession
    val names = Seq("join_asof_last_signup", "join_asof_left", "join_asof_tolerance")
    val off = names.map(n => n -> q(n).collect().map(_.toSeq).toSeq).toMap
    // default (no rule): none of the plans contains the custom exec
    names.foreach { n =>
      assert(!plan(n).contains("AsOfMerge"), s"$n rewritten without opt-in")
    }
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // rule registered but flag off: plans unchanged
      names.foreach { n =>
        val p = SparkEntry.queries(n)(extended, sf).queryExecution.executedPlan.toString
        assert(!p.contains("AsOfMerge"), s"$n rewritten with flag off:\n${p.take(600)}")
      }
      extended.conf.set("spark.graft.asofRewrite", "true")
      names.foreach { n =>
        val df = SparkEntry.queries(n)(extended, sf)
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("AsOfMerge"),
          s"$n must plan through AsOfMergeExec with the flag on:\n${p.take(900)}")
        // the candidate-pair band join is gone: the argmax aggregate's
        // input is the merge exec (one row per left row), not a join
        assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
          s"$n still contains the original join:\n${p.take(900)}")
        val on = df.collect().map(_.toSeq).toSeq
        // row equality both directions
        assert(on.diff(off(n)).isEmpty && off(n).diff(on).isEmpty,
          s"$n rows differ under the rewrite")
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("asofRewrite equivalence on generated legs: hot keys, ts ties, dup grouping keys, nulls") {
    import org.apache.spark.sql.{DataFrame, Row, SparkSession}
    import org.apache.spark.sql.types._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny domains force the hard cases: hot keys (5 users), exact-ts
    // ties (10 instants), non-unique grouping keys (10 pids over 60
    // left rows), and ~10% nulls on every join column
    val legGen = for {
      nL <- Gen.choose(40, 60); nR <- Gen.choose(40, 60)
      ls <- Gen.listOfN(nL, for {
        pid <- Gen.choose(0L, 9L)
        u <- Gen.frequency(9 -> Gen.choose(0L, 4L).map(Option(_)), 1 -> Gen.const(None))
        t <- Gen.frequency(9 -> Gen.choose(0L, 9L).map(Option(_)), 1 -> Gen.const(None))
      } yield (pid, u, t))
      rs <- Gen.listOfN(nR, for {
        sid <- Gen.choose(0L, 999L)
        u <- Gen.frequency(9 -> Gen.choose(0L, 4L).map(Option(_)), 1 -> Gen.const(None))
        t <- Gen.frequency(9 -> Gen.choose(0L, 9L).map(Option(_)), 1 -> Gen.const(None))
      } yield (sid, u, t))
    } yield (ls, rs)
    val cases = Iterator.from(0)
      .map(i => legGen.apply(Gen.Parameters.default, Seed(1042L + i)))
      .collect { case Some(a) => a }.take(4).toSeq
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      def df(rows: Seq[(Long, Option[Long], Option[Long])], names: Seq[String]): DataFrame =
        extended.createDataFrame(
          extended.sparkContext.parallelize(
            rows.map(r => Row(r._1, r._2.orNull, r._3.orNull)), 2),
          StructType(names.map(StructField(_, LongType))))
      def shapes(l: DataFrame, r: DataFrame): Seq[(String, DataFrame)] = {
        val argmax = max(struct(col("s_ts"), col("sid")))
          .getField("sid").as("last_sid")
        Seq(
          "inner" -> l.join(r, col("u") === col("su") && col("s_ts") <= col("p_ts"))
            .groupBy("pid").agg(argmax),
          "left_outer" -> l.join(r, col("u") === col("su") && col("s_ts") <= col("p_ts"),
              "left_outer").groupBy("pid").agg(argmax),
          "tolerance" -> l.join(r, col("u") === col("su") &&
              col("s_ts") <= col("p_ts") && col("s_ts") > col("p_ts") - 3)
            .groupBy("pid").agg(argmax))
      }
      cases.foreach { case (ls, rs) =>
        val l = df(ls, Seq("pid", "u", "p_ts"))
        val r = df(rs, Seq("sid", "su", "s_ts"))
        val names = shapes(l, r).map(_._1)
        names.foreach { what =>
          // a DataFrame caches its queryExecution, so the query must be
          // REBUILT after each flag flip for the rule to (not) apply
          extended.conf.set("spark.graft.asofRewrite", "false")
          val off = shapes(l, r).toMap.apply(what)
            .collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
          extended.conf.set("spark.graft.asofRewrite", "true")
          val q = shapes(l, r).toMap.apply(what)
          val plan = q.queryExecution.executedPlan.toString
          assert(plan.contains("AsOfMerge"), s"$what did not rewrite:\n${plan.take(500)}")
          val on = q.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
          assert(on == off, s"$what differs under rewrite:\noff=$off\non=$on")
        }
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
      spark.conf.unset("spark.graft.asofRewrite")
    }
  }

  test("asofRewrite multi-column payload: enrichment shape routes onto AsOfMergeExec") {
    // The round-10 generality fix (VERDICT r9 task 1): the natural
    // enrichment query — "attach the last-prior signup's channel,
    // campaign AND region" — selects SEVERAL right payload columns.
    // The struct lists the range ts then every residual right column
    // in output order, so the exec's sweep winner IS the struct max.
    import org.apache.spark.sql.{DataFrame, SparkSession}
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val e = extended.read.parquet(s"$sf/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
      def purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("u"),
                col("ts").as("p_ts"))
      def signups = e.filter(col("event_type") === "signup")
        .select(col("user_id").as("su"), col("ts").as("s_ts"),
                col("event_id").as("signup_id"),
                // three derived enrichment attributes (one a string):
                // the multi-column payload the old rule silently missed
                concat(lit("ch"), pmod(col("event_id"), lit(5))).as("channel"),
                pmod(col("event_id"), lit(97)).as("campaign"),
                pmod(col("user_id"), lit(7)).as("region"))
      val payload = Seq("signup_id", "channel", "campaign", "region")
      def argmaxStruct = struct(col("s_ts") +: payload.map(col): _*)
      def query(joinType: String): DataFrame =
        purchases.join(signups,
            col("u") === col("su") && col("s_ts") <= col("p_ts"), joinType)
          .groupBy("purchase_id")
          .agg(max(argmaxStruct).getField("signup_id").as("last_signup_id"),
               max(argmaxStruct).getField("channel").as("last_channel"),
               max(argmaxStruct).getField("campaign").as("last_campaign"),
               max(argmaxStruct).getField("region").as("last_region"))
      Seq("inner", "left_outer").foreach { jt =>
        extended.conf.set("spark.graft.asofRewrite", "false")
        val off = query(jt).collect().map(_.toSeq).toSeq
        extended.conf.set("spark.graft.asofRewrite", "true")
        val dfOn = query(jt)
        val p = dfOn.queryExecution.executedPlan.toString
        assert(p.contains("AsOfMerge"),
          s"$jt 4-payload enrichment must rewrite:\n${p.take(900)}")
        assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
          s"$jt still contains the candidate-pair join:\n${p.take(900)}")
        val on = dfOn.collect().map(_.toSeq).toSeq
        assert(on.diff(off).isEmpty && off.diff(on).isEmpty,
          s"$jt enrichment rows differ under rewrite")
      }
      // A struct over a payload SUBSET is rescued by column pruning:
      // Catalyst prunes the join's right side down to exactly the
      // demanded columns BEFORE this rule runs, so the residual set
      // equals the struct tail and the rewrite is sound (the exec's
      // sweep order over the PRUNED output matches the struct order).
      // Assert it fires and stays row-identical.
      extended.conf.set("spark.graft.asofRewrite", "false")
      def subset() = purchases.join(signups,
          col("u") === col("su") && col("s_ts") <= col("p_ts"))
        .groupBy("purchase_id")
        .agg(max(struct(col("s_ts"), col("channel")))
               .getField("channel").as("last_channel"))
      val subOff = subset().collect().map(_.toSeq).toSeq
      extended.conf.set("spark.graft.asofRewrite", "true")
      val subOn = subset()
      assert(subOn.queryExecution.executedPlan.toString.contains("AsOfMerge"),
        "pruned-subset payload must rewrite (pruning makes it exact)")
      val subRows = subOn.collect().map(_.toSeq).toSeq
      assert(subRows.diff(subOff).isEmpty && subOff.diff(subRows).isEmpty,
        "pruned-subset rows differ under rewrite")
      // A PERMUTED payload struct (field order ≠ right-output order)
      // diverges from the exec's sweep order on ts ties — must not fire.
      val permuted = purchases.join(signups,
          col("u") === col("su") && col("s_ts") <= col("p_ts"))
        .groupBy("purchase_id")
        .agg(max(struct(col("s_ts"), col("channel"), col("signup_id"),
                        col("campaign"), col("region")))
               .getField("channel").as("last_channel"))
      val permPlan = permuted.queryExecution.executedPlan.toString
      assert(!permPlan.contains("AsOfMerge"),
        s"rule must not fire on payload permutation (tie divergence):\n${permPlan.take(600)}")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("asofRewrite forward: first-within-window min-struct shape routes onto the forward exec") {
    // round 10: the chained-reconciliation hop — "each signup's FIRST
    // purchase within 24 h" — is min(struct(p_ts, …)) over a strict
    // rTs > lTs join; the rule must route it onto AsOfMergeExec's
    // forward (descending-sweep) mode, window bound included
    import org.apache.spark.sql.{DataFrame, SparkSession}
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      val e = extended.read.parquet(s"$sf/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
      def signups = e.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("user_id").as("u"),
                col("ts").as("s_ts"))
      def purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("p_ts"),
                col("event_id").as("p_id"), pmod(col("event_id"), lit(13)).as("channel"))
      def argmin = min(struct(col("p_ts"), col("p_id"), col("channel")))
      def query(banded: Boolean): DataFrame = {
        val cond = col("u") === col("pu") && col("p_ts") > col("s_ts") &&
          (if (banded) col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOURS") else lit(true))
        signups.join(purchases, cond)
          .groupBy("s_id")
          .agg(argmin.getField("p_id").as("first_p_id"),
               argmin.getField("channel").as("first_channel"))
      }
      for (banded <- Seq(false, true)) {
        extended.conf.set("spark.graft.asofRewrite", "false")
        val off = query(banded).collect().map(_.toSeq).toSeq
        extended.conf.set("spark.graft.asofRewrite", "true")
        val dfOn = query(banded)
        val p = dfOn.queryExecution.executedPlan.toString
        assert(p.contains("AsOfMerge"),
          s"forward shape (banded=$banded) must rewrite:\n${p.take(900)}")
        assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
          s"forward (banded=$banded) still contains the original join:\n${p.take(900)}")
        val on = dfOn.collect().map(_.toSeq).toSeq
        assert(on.diff(off).isEmpty && off.diff(on).isEmpty,
          s"forward (banded=$banded) rows differ under rewrite")
      }
      // direction mismatches must not fire: min over the BACKWARD <=
      // range, and max over the FORWARD > range
      extended.conf.set("spark.graft.asofRewrite", "true")
      val minBackward = signups.join(purchases,
          col("u") === col("pu") && col("p_ts") <= col("s_ts"))
        .groupBy("s_id")
        .agg(min(struct(col("p_ts"), col("p_id"), col("channel")))
               .getField("p_id").as("x"))
      val maxForward = signups.join(purchases,
          col("u") === col("pu") && col("p_ts") > col("s_ts"))
        .groupBy("s_id")
        .agg(max(struct(col("p_ts"), col("p_id"), col("channel")))
               .getField("p_id").as("x"))
      for ((df, what) <- Seq((minBackward, "min over <= (last-prior range)"),
                             (maxForward, "max over > (first-after range)"))) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("AsOfMerge"),
          s"rule must not fire on $what:\n${p.take(600)}")
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
      spark.conf.unset("spark.graft.asofRewrite")
    }
  }

  test("asofRewrite forward equivalence on generated legs: ties, hot keys, windows") {
    // the forward mirror of the backward generated-legs test: tiny
    // domains force ts ties (where the descending sweep's residual
    // order must equal the struct-min comparison) and hot keys
    import org.apache.spark.sql.{DataFrame, Row, SparkSession}
    import org.apache.spark.sql.types._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val legGen = for {
      nL <- Gen.choose(30, 50); nR <- Gen.choose(30, 50)
      ls <- Gen.listOfN(nL, for {
        sid <- Gen.choose(0L, 9L); u <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 6L)
      } yield Seq(sid, u, t))
      rs <- Gen.listOfN(nR, for {
        u <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 6L)
        pid <- Gen.choose(0L, 999L); c <- Gen.choose(0L, 2L)
      } yield Seq(u, t, pid, c))
    } yield (ls, rs)
    val cases = Iterator.from(0)
      .map(i => legGen.apply(Gen.Parameters.default, Seed(3042L + i)))
      .collect { case Some(a) => a }.take(4).toSeq
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      def df(rows: Seq[Seq[Long]], names: Seq[String]): DataFrame =
        extended.createDataFrame(
          extended.sparkContext.parallelize(rows.map(Row.fromSeq), 2),
          StructType(names.map(StructField(_, LongType))))
      cases.foreach { case (ls, rs) =>
        val l = df(ls, Seq("sid", "u", "s_ts"))
        val r = df(rs, Seq("pu", "p_ts", "pid", "c"))
        def query(banded: Boolean): DataFrame = {
          val st = struct(col("p_ts"), col("pid"), col("c"))
          val cond = col("u") === col("pu") && col("p_ts") > col("s_ts") &&
            (if (banded) col("p_ts") <= col("s_ts") + 3 else lit(true))
          l.join(r, cond).groupBy("sid")
            .agg(min(st).getField("pid").as("first_pid"),
                 min(st).getField("c").as("first_c"))
        }
        for (banded <- Seq(false, true)) {
          extended.conf.set("spark.graft.asofRewrite", "false")
          val off = query(banded).collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
          extended.conf.set("spark.graft.asofRewrite", "true")
          val qOn = query(banded)
          val plan = qOn.queryExecution.executedPlan.toString
          assert(plan.contains("AsOfMerge"),
            s"forward banded=$banded did not rewrite:\n${plan.take(500)}")
          val on = qOn.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
          assert(on == off, s"forward banded=$banded differs:\noff=$off\non=$on")
        }
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
      spark.conf.unset("spark.graft.asofRewrite")
    }
  }

  test("asofRewrite payload-width property: generated widths, tie-heavy domains") {
    // widths 1..3 over tiny domains: every column collides constantly,
    // so the lexicographic tail of the struct decides winners — the
    // exact surface where a sort-order/struct-order mismatch would show
    import org.apache.spark.sql.{DataFrame, Row, SparkSession}
    import org.apache.spark.sql.types._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      w <- Gen.choose(1, 3)
      nL <- Gen.choose(30, 50); nR <- Gen.choose(30, 50)
      ls <- Gen.listOfN(nL, for {
        pid <- Gen.choose(0L, 7L); u <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 5L)
      } yield Seq(pid, u, t))
      rs <- Gen.listOfN(nR, for {
        u <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 5L)
        ps <- Gen.listOfN(w, Gen.choose(0L, 2L))
      } yield Seq(u, t) ++ ps)
    } yield (w, ls, rs)
    val cases = Iterator.from(0)
      .map(i => caseGen.apply(Gen.Parameters.default, Seed(2042L + i)))
      .collect { case Some(a) => a }.take(5).toSeq
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions).getOrCreate()
      def df(rows: Seq[Seq[Long]], names: Seq[String]): DataFrame =
        extended.createDataFrame(
          extended.sparkContext.parallelize(rows.map(Row.fromSeq), 2),
          StructType(names.map(StructField(_, LongType))))
      cases.foreach { case (w, ls, rs) =>
        val pCols = (1 to w).map(i => s"c$i")
        val l = df(ls, Seq("pid", "u", "p_ts"))
        val r = df(rs, Seq("su", "s_ts") ++ pCols)
        def query(): DataFrame = {
          val st = struct(col("s_ts") +: pCols.map(col): _*)
          l.join(r, col("u") === col("su") && col("s_ts") <= col("p_ts"))
            .groupBy("pid")
            .agg(pCols.map(c => max(st).getField(c).as(s"last_$c")).head,
                 pCols.tail.map(c => max(st).getField(c).as(s"last_$c")): _*)
        }
        extended.conf.set("spark.graft.asofRewrite", "false")
        val off = query().collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
        extended.conf.set("spark.graft.asofRewrite", "true")
        val qOn = query()
        val plan = qOn.queryExecution.executedPlan.toString
        assert(plan.contains("AsOfMerge"), s"width $w did not rewrite:\n${plan.take(500)}")
        val on = qOn.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
        assert(on == off, s"width $w differs under rewrite:\noff=$off\non=$on")
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
      spark.conf.unset("spark.graft.asofRewrite")
    }
  }

  test("asofRewrite does NOT fire on near-miss shapes (strict <, DISTINCT, outer+band)") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      extended.conf.set("spark.graft.asofRewrite", "true")
      val e = extended.read.parquet(s"$sf/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
      def legs(): (DataFrame, DataFrame) = (
        e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("u"),
                  col("ts").as("p_ts")),
        e.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id").as("su"),
                  col("ts").as("s_ts")))
      val argmax = max(struct(col("s_ts"), col("signup_id")))
        .getField("signup_id").as("last_signup_id")
      val (p, g) = legs()
      // strictly-prior (<) is a DIFFERENT operator than the exec's <=
      val strict = p.join(g, col("u") === col("su") && col("s_ts") < col("p_ts"))
        .groupBy("purchase_id").agg(argmax)
      // max DISTINCT has different merge semantics than plain max
      val distinct = p.join(g, col("u") === col("su") && col("s_ts") <= col("p_ts"))
        .groupBy("purchase_id")
        .agg(max_by(col("signup_id"), struct(col("s_ts"), col("signup_id"))).as("x"))
      // left-outer + band: a post-filter would drop the padded rows
      val outerBand = p.join(g, col("u") === col("su") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") > col("p_ts") - expr("INTERVAL 7 DAYS"), "left_outer")
        .groupBy("purchase_id").agg(argmax)
      for ((df, what) <- Seq((strict, "strict <"), (distinct, "distinct/max_by"),
                             (outerBand, "outer+band"))) {
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("AsOfMerge"),
          s"rule must not fire on $what:\n${plan.take(600)}")
      }
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("recon_leg_match is a single full-outer join (no anti-join recompute)") {
    val p = plan("recon_leg_match")
    assert(p.contains("FullOuter"), p.take(600))
    assert(!p.contains("LeftAnti"))
  }

  test("win_ntile never single-partitions the fact table") {
    val p = plan("win_ntile")
    // The two-phase ranking replaces `Window.orderBy(...)`'s
    // data-sized Exchange SinglePartition with a hash exchange per
    // price bucket; bucket offsets come from a broadcast cross join
    // over the bucket-count table, so NO single-partition exchange
    // exists anywhere in the plan.
    assert(!p.contains("Exchange SinglePartition"), p.take(1200))
    // and the fact-side window is bucket-partitioned
    assert(p.contains("windowspecdefinition(__cb"), p.take(800))
  }

  test("round-5 warehouse ops never single-partition the fact table") {
    // customer_rfm: three globalNtile passes — every ranking is
    // bucket-parallel, offsets broadcast; ts_merge_intervals and
    // win_streak_longest: entity-partitioned windows only
    for (name <- Seq("customer_rfm", "ts_merge_intervals", "win_streak_longest",
                     "win_ratio_to_report", "win_pct_change", "win_cum_distinct",
                     "join_asof_left", "agg_bitmap_distinct", "agg_weighted_avg",
                     "events_transition_counts")) {
      val p = plan(name)
      assert(!p.contains("Exchange SinglePartition"), s"$name: ${p.take(1200)}")
    }
    // skyline_pareto's one ordered window runs on the aggregated
    // x-domain table (bounded), never the corpus: the window input is
    // the groupBy(n_chars) aggregate, and the corpus-sized side joins
    // back by equi-join
    val sky = plan("skyline_pareto")
    assert(sky.contains("BroadcastHashJoin") || sky.contains("SortMergeJoin"),
      sky.take(1200))
  }

  test("win_ntile two-phase ranking equals the window-ntile formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("o_totalprice", "o_orderkey")
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_totalprice"), ntile(4).over(w).cast("long").as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("c"),
           (round(min(col("o_totalprice")) * 100)).cast("long").as("mn"))
      .orderBy("b")
      .collect().toSeq
    assert(q("win_ntile").collect().toSeq == expect)
  }

  test("correlated EXISTS decorrelates to a semi join (no per-row subquery)") {
    assert(plan("subq_exists_correlated").contains("LeftSemi"),
      plan("subq_exists_correlated").take(600))
  }

  test("globalRank ranks null sort keys first (parity with Window.orderBy)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = Seq[(java.lang.Long, Long)]((null, 1L), (10L, 2L), (null, 3L),
                                         (5L, 4L), (20L, 5L))
      .toDF("price", "id")
    val got = graft.ops.Scale
      .globalRank(df, floor(col("price") / 10), Seq(col("price"), col("id")))
      .select("id", "__rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = df
      .withColumn("rn", row_number().over(Window.orderBy("price", "id")).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"null rows must rank first and never drop: $got vs $expect")
  }

  test("globalPrefixSum equals the global-window running sum; no single-partition pass") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = Seq[(java.lang.Long, Long, Long)]((null, 1L, 5L), (10L, 2L, 7L),
                                               (null, 3L, 1L), (5L, 4L, 2L), (20L, 5L, 9L))
      .toDF("price", "id", "v")
    val got = graft.ops.Scale
      .globalPrefixSum(df, floor(col("price") / 10), Seq(col("price"), col("id")), col("v"))
      .select("id", "__ps").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy("price", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("ps", sum("v").over(w))
      .select("id", "ps").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"$got vs $expect")
    val p = SparkEntry.queries("pack_token_shards")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
  }

  test("corpus_shuffle_shards never single-partitions (md5-bucketed globalRank)") {
    val p = plan("corpus_shuffle_shards")
    assert(!p.contains("Exchange SinglePartition"), p.take(1200))
    assert(p.contains("windowspecdefinition(__cb"), p.take(800))
  }

  test("similarity kernel (VecDot) sits in the join hot path") {
    // execute first so AQE finalizes; codegen stages show as *(n)
    val df = q("sim_pairs_threshold")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("vecdot"), "VecDot missing from physical plan:\n" + p.take(600))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("win_topk_agg: bounded-heap aggregate partial-aggregates, no WindowExec") {
    val df = q("win_topk_agg")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(1000))
    assert(p.contains("partial_bottom_k"), p.take(1000)) // map-side heap BEFORE the shuffle
    assert(!p.contains("Window"), "the whole point is no window sort:\n" + p.take(1000))
    // and it computes exactly what the window formulation does
    assert(df.collect().toSeq == q("win_topk_per_group").collect().toSeq)
  }

  // ---- battery-wide invariants -------------------------------------------
  //
  // Every query in SparkEntry.queries is plan-checked against the three
  // scale anti-patterns. New operators are covered automatically; adding
  // a query that regresses an invariant fails here with its name, and
  // the ONLY way to ship it is to add it to the allowlist below with a
  // justification — which is exactly the review conversation we want.

  /** Queries permitted to plan a BroadcastNestedLoopJoin, and why.
    * Three legitimate classes:
    *  - contract-quadratic: the oracle pins all-pairs semantics; each
    *    has a linear banded/bucketed twin (PLANS.md) for real scale;
    *  - 1-row scalar: a broadcast cross join against a single-row
    *    aggregate (Spark plans broadcast-1-row as BNLJ) — bytes moved;
    *  - bounded-bucket: globalRank/globalNtile's B×B bucket-count
    *    cross join — cardinality fixed by construction, never data.
    */
  private val bnljAllowed: Map[String, String] = Map(
    "customer_churn_labels" -> "1-row scalar: corpus-horizon date broadcast over the customer census",
    "alloc_largest_remainder" -> "1-row scalar: revenue-total + leftover-seat broadcasts over the 25-row nation domain",
    "orders_queue_backlog" -> "1-row scalar: capacity constant broadcast over the bounded day domain",
    "li_ship_dow_profile" -> "1-row scalar: revenue-total broadcast over the bounded 7-row dow domain",
    "events_anomaly_daily" -> "1-row scalar: global moment (N,S,SS) broadcast over the day domain",
    "dq_clock_uniformity" -> "1-row scalar: corpus-total broadcast over the bounded 60-row minute domain",
    "embedding_label_norm_gap" -> "1-row scalar: global norm totals broadcast over the bounded label table",
    "events_hour_share_drift" -> "1-row scalar: corpus-total broadcast over the bounded day-hour grid",
    "events_top_minutes" -> "1-row scalar: corpus-total broadcast over the minute census",
    "ml_population_drift_bins" -> "1-row scalar: per-half totals broadcast over the bounded band table",
    "sim_pairs_threshold" -> "contract-quadratic (linear twin: dedup_minhash_lsh)",
    "sim_knn_per_query" -> "contract-quadratic (linear twin: ann_ivf_topk)",
    "ml_mrr_hits" -> "contract-quadratic: exact-ranking eval contract (serving twin: ann_ivf_topk)",
    "text_pmi_bigrams" -> "1-row scalar: corpus-total broadcast",
    "agg_kmv_distinct" -> "1-row scalar: merged-sketch x global-truth 1-row join",
    "ml_lift_gain" -> "1-row scalar: totals broadcast over the 10-row decile table",
    "ts_cusum_changepoint" -> "1-row scalar: n-days/total + peak broadcasts",
    "events_cooccur_lift" -> "1-row scalar: session-total broadcast",
    "join_theta_band" -> "contract: non-equi band theta join",
    "join_cross_small" -> "contract: declared cross join, dims only",
    "text_sim_funcs" -> "contract-quadratic jaro-winkler pairs (blocked)",
    "dedup_near_jaccard" -> "contract-quadratic (linear twin: dedup_minhash_lsh)",
    "dedup_ngram_jaccard" -> "contract-quadratic (linear twin: dedup_ngram_banded)",
    "dedup_editdist" -> "contract-quadratic, length-gap prefiltered",
    "dedup_embedding_cosine" -> "banded by CosineBandRule; residual in-band verify",
    "ts_mann_kendall" -> "bounded-bucket: all-pairs over the 366-day year domain (Mann-Kendall sign contract) + 1-row n broadcast",
    "ml_cramers_v" -> "1-row scalar: grand-total + bounded brand/size marginal broadcasts",
    "alloc_sainte_lague" -> "1-row scalar: 1000-divisor literal broadcast over the 25-row nation domain",
    "customer_kaplan_meier" -> "1-row scalar: censoring-horizon broadcast over the customer census",
    "li_abc_xyz" -> "1-row scalar: revenue-total broadcast over the part domain",
    "nation_kendall_w" -> "1-row scalar: nation-count broadcast over the 25-row domain",
    "orders_runs_test" -> "1-row scalar: count-total broadcast over the bounded day domain",
    "orders_weekday_anova" -> "1-row scalar: grand-total broadcast over the 7-row dow domain",
    "ts_hurst_rs" -> "1-row scalar: series-length broadcast over the bounded day domain x 4 window sizes",
    "ts_ljung_box" -> "1-row scalar: mean/denominator broadcasts over the bounded day domain x 7 lags",
    "ml_kendall_tau_nation" -> "bounded-bucket: all-pairs over the 25-row nation domain + 1-row count broadcast",
    "alloc_greedy_knapsack" -> "1-row scalar: capacity broadcast over the bounded part-type domain",
    "event_funnel" -> "1-row scalar: funnel-total broadcast",
    "ml_auc_rank" -> "1-row scalar: grand-total broadcast",
    "ml_kmeans_2iter" -> "1-row scalar: broadcast centroid array",
    "agg_heavy_hitters" -> "1-row scalar: total-count broadcast",
    "sample_weighted" -> "1-row scalar: weight-sum broadcast",
    "recon_aging_buckets" -> "1-row scalar: as-of timestamp broadcast",
    "q11_important_stock" -> "1-row scalar: threshold subquery broadcast",
    "ann_ivf_topk" -> "1-row scalar: broadcast IVF centroid array",
    "ann_ivf_persistent" -> "1-row scalar: broadcast stored-centroid table (numCells rows) in the probe rank",
    "embedding_cluster_sizes" -> "1-row scalar: broadcast centroid array",
    "graph_triangle_count" -> "bounded: degree-table broadcast",
    "win_ntile" -> "bounded-bucket: B×B offsets cross join",
    "win_pct_rank_global" -> "bounded-bucket: B×B offsets cross join",
    "pack_token_shards" -> "bounded-bucket: B×B prefix-sum offsets",
    "corpus_shuffle_shards" -> "bounded-bucket: B×B offsets cross join",
    "customer_rfm" -> "bounded-bucket: D·B×B fused-ntile offsets",
    "ts_acf_lags" -> "1-row scalar: n/total + denominator broadcasts",
    "ml_precision_recall_k" -> "contract-quadratic: exact-ranking eval contract (serving twin: ann_ivf_topk)",
    "events_dau_wau" -> "1-row scalar: max-day bound broadcast",
    "text_bpe_train_merges" -> "1-row scalar: selected merge pair broadcast per round",
    "basket_apriori_pairs" -> "1-row scalar: basket-total broadcast",
    "supplier_abc_class" -> "1-row scalar: revenue-total broadcast",
    "events_decayed_score" -> "1-row scalar: as-of day broadcast",
    "dq_benford_first_digit" -> "1-row scalar: order-count total broadcast",
    "events_activity_gini" -> "bounded-bucket: B×B globalRank offsets",
    "part_qty_price_spearman" -> "bounded-bucket: B×B globalRank offsets (two rankings)",
    "text_zipf_slope" -> "bounded-bucket: B×B globalRank offsets (B = count bit lengths)",
    "events_survival_curve" -> "1-row scalar: user-total broadcast",
    "graph_kcore" -> "1-row scalar: node-census broadcast onto the 1-row edge count",
    "customer_nation_affinity" -> "1-row scalar: line-total broadcast over the bounded nation-pair table",
    "text_ngram_coverage" -> "1-row scalar: top-1000 sum broadcast onto the 1-row totals",
    "ts_seasonal_strength" -> "1-row scalar: SSres broadcast onto the 1-row total",
    "ml_ks_weekday_weekend" -> "1-row scalar: weekday/weekend totals broadcast + B×B prefix-sum offsets",
    "ml_chi2_priority_status" -> "bounded: priorities×statuses marginal grid + 1-row total broadcast",
    "sample_systematic" -> "bounded-bucket: B×B globalRank offsets (B = 256 md5 prefixes)",
    "corpus_length_token_deciles" -> "bounded-bucket: B×B ntile-census offsets (B = n_chars/20 buckets)",
    "ml_knn_label_purity" -> "contract-quadratic: exact 1-NN eval contract (serving twin: ann_ivf_topk)",
    "part_type_price_median_gap" -> "1-row scalar: global-median broadcast",
    "customer_balance_spend_quadrant" -> "1-row scalar: two-median broadcast",
    "supplier_nation_price_index" -> "1-row scalar: global price-total broadcast",
    "segment_wallet_share" -> "1-row scalar: balance/revenue totals broadcast over the bounded segment table",
    "mw_u_segments" -> "1-row scalar: n1/n2 totals broadcast + bounded-bucket prefix-sum offsets",
    "ks_price_segments" -> "1-row scalar: n1/n2 totals broadcast + bounded-bucket prefix-sum offsets (two cumulatives)",
    "js_div_nation_prices" -> "1-row scalar: per-nation totals broadcast over the bounded 50k-dollar bucket table",
    "little_law_openorders" -> "1-row scalar: corpus-span broadcast over the order-duration census",
    "pacf2_daily_revenue" -> "1-row scalar: day-count broadcast over the bounded day domain",
    "page_hinkley_revenue" -> "1-row scalar: (n, S) broadcast over the bounded day domain",
    "cust_rfm_cells" -> "1-row scalar: corpus-horizon broadcast + bounded-bucket globalRank offsets (three rankings)")

  /** Queries permitted an Exchange SinglePartition, and why. The only
    * legitimate class: a FINAL aggregate/limit whose input is already
    * reduced to one row per upstream partition (1-row global aggs,
    * scalar subqueries) or a bounded domain table — never fact data.
    */
  private val singleAllowed: Map[String, String] = Map(
    "li_return_wilson_rank" -> "bounded 25-row brand-domain rank window over the aggregate",
    "customer_churn_labels" -> "1-row corpus-horizon aggregate (the broadcast side; customer census stays parallel)",
    "alloc_largest_remainder" -> "bounded 25-row nation-domain remainder-rank window over the aggregate",
    "orders_queue_backlog" -> "bounded day-domain Lindley windows (fact collapses to daily counts first; the ts_sma_crossover class)",
    "li_ship_dow_profile" -> "1-row revenue-total aggregate (dow census stays parallel)",
    "orders_daily_count_autocorr" -> "bounded day-domain lead window + 1-row final moment aggregate",
    "ts_spearman_autocorr" -> "bounded day-domain rank windows + 1-row final moment aggregate (the orders_daily_count_autocorr class)",
    "alloc_dhondt" -> "bounded 25k-row nation x divisor domain rank window over the aggregate (the alloc_largest_remainder class)",
    "orders_priority_runlength" -> "bounded day-domain island windows (fact collapses to daily majorities first; the ts_runs_updown class)",
    "ts_mann_kendall" -> "1-row final sign-count aggregate over the bounded 366-day pair domain",
    "ml_kendall_tau_nation" -> "1-row final concordance aggregate over the 300 nation pairs",
    "alloc_greedy_knapsack" -> "bounded ~150-row part-type domain density-rank window + 1-row final",
    "events_anomaly_daily" -> "1-row moment aggregate (the broadcast side; day census stays parallel)",
    "dq_clock_uniformity" -> "1-row corpus-total aggregate (minute census stays parallel)",
    "embedding_label_norm_gap" -> "1-row norm-total aggregate (label census stays parallel)",
    "customer_acquisition_monthly" -> "bounded month-domain cumulative window (customer grain collapses to months first)",
    "customer_monthly_active_share" -> "bounded month-domain cumulative window (customer grain collapses to months first)",
    "part_brand_revenue_rank" -> "bounded 25-row brand-domain rank window over the aggregate",
    "events_hour_share_drift" -> "1-row corpus-total aggregate (grid/day aggs stay parallel)",
    "events_top_minutes" -> "1-row corpus-total aggregate (minute census stays parallel)",
    "ml_population_drift_bins" -> "1-row totals aggregate (band census stays parallel)",
    "supplier_volume_balance_spearman" -> "1-row spearman final aggregate (ranks via bucket-parallel globalRank)",
    "ts_runs_updown" -> "bounded day-domain sign/run windows (fact collapses to daily cents first; the ts_sma_crossover class)",
    "agg_count_distinct" -> "1-row global aggregate",
    "agg_approx_topk" -> "1-row global sketch merge",
    "agg_kmv_distinct" -> "1-row global sketch merge",
    "embedding_pca_power" -> "1-row Gram-array merge (one array per partition)",
    "agg_heavy_hitters" -> "1-row total-count scalar",
    "dedup_exact_hash" -> "1-row census aggregate",
    "dq_domain_violations" -> "1-row violation census",
    "dq_duplicate_keys" -> "1-row census aggregate",
    "dq_referential_orphans" -> "1-row orphan census",
    "profile_table_stats" -> "per-table 1-row profile union",
    "q6_forecast_revenue" -> "1-row revenue scalar",
    "q14_promo_revenue" -> "1-row ratio scalar",
    "q15_top_supplier" -> "scalar max-revenue subquery",
    "q17_small_qty_revenue" -> "1-row revenue scalar",
    "q19_disjunctive_revenue" -> "1-row revenue scalar",
    "q22_idle_balance" -> "scalar avg-balance subquery",
    "q11_important_stock" -> "scalar threshold subquery",
    "subq_scalar" -> "scalar subquery by definition",
    "skyline_pareto" -> "bounded x-domain aggregate window",
    "ml_lift_gain" -> "bounded 10-row decile-table window",
    "ts_cusum_changepoint" -> "bounded day-domain aggregate window",
    "text_unigram_surprisal" -> "1-row corpus-total scalar",
    "text_pmi_bigrams" -> "1-row corpus-total scalar",
    "events_cooccur_lift" -> "1-row session-total scalar",
    "ml_auc_rank" -> "1-row grand-total scalar",
    "ml_kmeans_2iter" -> "1-row broadcast centroid collect",
    "event_funnel" -> "1-row funnel-total scalar",
    "recon_aging_buckets" -> "1-row as-of timestamp scalar",
    "sample_weighted" -> "1-row weight-sum scalar",
    "graph_triangle_count" -> "1-row triangle-count total",
    "corpus_mix_resample" -> "bounded per-source mix table",
    "audit_table_checksum" -> "per-table 1-row checksum union",
    "ts_acf_lags" -> "1-row n/total + denominator aggregates",
    "events_dau_wau" -> "1-row max-day aggregate",
    "str_collation_distinct" -> "1-row global distinct-count aggregate",
    "supplier_abc_class" -> "bounded supplier-domain ranking window + 1-row total",
    "ts_rolling_corr" -> "bounded date-domain rolling window (days, never fact rows)",
    "events_pattern_match" -> "1-row pattern-census final aggregate",
    "events_activity_gini" -> "1-row gini final aggregate (ranks via bucket-parallel globalRank)",
    "orders_backlog_sweep" -> "bounded day-domain cumulative window (fact collapses to ~2.4k days first)",
    "part_qty_price_spearman" -> "1-row spearman final aggregate (ranks via bucket-parallel globalRank)",
    "text_zipf_slope" -> "1-row OLS-fit final aggregate (ranks via bucket-parallel globalRank)",
    "dq_benford_first_digit" -> "1-row order-count total + 9-digit domain",
    "basket_apriori_pairs" -> "1-row basket-total aggregate",
    "agg_bitmap_union_all" -> "1-row ALL-row final over bucket-merged bitmaps",
    "text_vocab_growth" -> "bounded milestone-domain cumulative window",
    "events_error_budget" -> "bounded day-domain cumulative window",
    "events_decayed_score" -> "1-row as-of-day aggregate",
    "events_survival_curve" -> "1-row user-total aggregate",
    "graph_kcore" -> "1-row census aggregates (edges + nodes)",
    "ml_cohen_kappa" -> "1-row agreement-count final aggregate",
    "ts_theil_sen_trend" -> "1-row fit over the bounded day-pair slope list",
    "customer_nation_affinity" -> "1-row line-total aggregate",
    "ts_sma_crossover" -> "bounded day-domain SMA/crossover windows (fact collapses to daily cents first)",
    "text_ngram_coverage" -> "1-row totals final aggregate (top-k plans as TakeOrdered)",
    "graph_assortativity" -> "1-row correlation final aggregate",
    "ts_seasonal_strength" -> "1-row SSres/SStot final aggregates (bounded DOW domain)",
    "ml_ks_weekday_weekend" -> "1-row KS-max final aggregate (cumulative via bucket-parallel globalPrefixSum)",
    "ml_chi2_priority_status" -> "1-row χ² final over the bounded contingency grid",
    "ts_peak_days" -> "bounded day-domain ±3-row extrema windows (fact collapses to daily cents first)",
    "part_type_price_median_gap" -> "1-row global-median scalar",
    "customer_balance_spend_quadrant" -> "1-row two-median scalar",
    "supplier_nation_price_index" -> "1-row global price-total scalar",
    "ts_record_highs" -> "bounded day-domain cumulative-max window (fact collapses to daily cents first)",
    "ts_mom_growth" -> "bounded month-domain lag window (fact collapses to monthly cents first)",
    "ts_dom_seasonality" -> "bounded 31-row day-of-month domain total window (fact collapses first)",
    "dq_fk_fanout_profile" -> "per-relation 1-row profile union (the profile_table_stats shape)",
    "segment_wallet_share" -> "1-row totals scalar over the bounded segment table",
    "ml_cramers_v" -> "1-row chi-square/V final aggregate over the bounded contingency grid",
    "ts_holt_linear" -> "1-row sequential-fold final (fact collapses to the bounded day array first)",
    "customer_kaplan_meier" -> "bounded month-domain at-risk/survival windows (fact collapses to lifetimes first)",
    "li_abc_xyz" -> "1-row revenue-total + bucket-parallel prefix sum (globalPrefixSum, no part-domain single-partition sort)",
    "nation_kendall_w" -> "bounded 25-row nation ranking windows + 1-row W final",
    "li_bartlett_k2" -> "1-row K-squared final over the 3-row flag group table",
    "orders_runs_test" -> "1-row runs/z final + bounded day-domain lag window (fact collapses to days first)",
    "orders_weekday_anova" -> "1-row F final over the 7-row dow group table",
    "ts_hurst_rs" -> "bounded day-domain ranking window (fact collapses to ~2.4k days first) + per-size means",
    "ts_ljung_box" -> "1-row Q final + bounded day-domain ranking window (fact collapses to days first)",
    "mw_u_segments" -> "1-row final rank-sum aggregate (value cumulatives bucket-parallel via globalPrefixSum)",
    "ks_price_segments" -> "1-row final max-deviation aggregate (cumulatives bucket-parallel via globalPrefixSum)",
    "js_div_nation_prices" -> "1-row final JS aggregate over the bounded bucket table",
    "little_law_openorders" -> "1-row final over the single corpus-span group",
    "cohens_d_segments" -> "1-row final pooled-moment aggregate over the 2-row segment frame",
    "pacf2_daily_revenue" -> "bounded day-domain lag windows + 1-row moment finals (the orders_daily_count_autocorr class)",
    "page_hinkley_revenue" -> "bounded day-domain cumulative windows + 1-row final (the ts_cusum_changepoint class)",
    "cust_rfm_cells" -> "1-row corpus-horizon aggregate (the broadcast side; customer rankings stay bucket-parallel — the customer_churn_labels class)")

  test("AQE OptimizeSkewedJoin splits a hot-key shuffle join at runtime (salting OFF)") {
    // the declarative skew path a 100 TB user gets by DEFAULT — the
    // plan-guard half of ScaleBench `skew` (VERDICT r12 task 7):
    // with salting off and broadcast disabled, the executed adaptive
    // plan must carry the skew=true SMJ split, and the rows must equal
    // the AQE-off run. Scale.saltedJoin remains the explicit tool for
    // shapes AQE can't split (a hash join it must keep intact, or a
    // post-join agg keyed on the hot column re-merging the splits).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      // 400k rows, half on ONE key: the hot shuffle partition is ~40×
      // the others and well past the (tuned-down) skew threshold
      def fact = spark.range(400000L).select(
        when(pmod(col("id"), lit(10)) < 5, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(5000L))).as("k"),
        concat(lit("payload_"), col("id")).as("p"))
      def dim = spark.range(5000L).select(col("id").as("k"),
        concat(lit("attr_"), col("id")).as("a"))
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val df = fact.join(dim, "k")
      // execute THIS df's own QueryExecution (count() would build a
      // fresh aggregate plan and leave df's adaptive plan un-final)
      val n = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin must fire on the hot key; executed plan:\n$plan")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      assert(fact.join(dim, "k").count() == n,
        "the skew-split plan must not change the result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("battery-wide: no data-sized BNLJ / cartesian / single-partition exchange") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct (never acceptable — use broadcast or banding)"
      if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
        offenders += s"$name: BroadcastNestedLoopJoin outside the declared quadratic/scalar set"
      if (p.contains("Exchange SinglePartition") && !singleAllowed.contains(name))
        offenders += s"$name: Exchange SinglePartition outside the 1-row-final set"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("battery-wide: no SortMergeJoin keyed on a string column") {
    // Spark 4.1's UTF8String.compareTo runs a System.getenv isTesting
    // probe PER COMPARISON (PLANS.md round-7 session 2) — a
    // string-keyed merge is orders slower than hash probes at high
    // pair multiplicity. Blocked/banded joins carry shuffle_hash
    // hints; this pins the property for every future operator.
    //
    // Traversal MUST unwrap adaptive nodes: AdaptiveSparkPlanExec and
    // QueryStageExec are LeafExecNodes, so a plain plan.collect never
    // reaches the real operators under AQE (a plain-collect version of
    // this guard was VACUOUS — caught by review, self-checked below).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.types.StringType
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ nested).flatMap(allNodes)
    }
    def stringKeyedSmjs(df: org.apache.spark.sql.DataFrame): Seq[SortMergeJoinExec] =
      allNodes(df.queryExecution.executedPlan).collect {
        case s: SortMergeJoinExec if s.leftKeys.exists(_.dataType == StringType) => s
      }
    // positive control: the detector must SEE a forced string-keyed SMJ
    // through the adaptive wrapper, or the battery sweep proves nothing
    val canary = {
      import spark.implicits._
      val l = Seq(("a", 1L), ("b", 2L)).toDF("k", "v").hint("merge")
      val r = Seq(("a", 3L)).toDF("k", "w").hint("merge")
      l.join(r, "k")
    }
    assert(stringKeyedSmjs(canary).nonEmpty,
      "detector lost the plan under AQE:\n" + canary.queryExecution.executedPlan)
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val strKeyed = stringKeyedSmjs(fn(spark, sf))
      if (strKeyed.nonEmpty)
        offenders += s"$name: ${strKeyed.size} string-keyed SMJ — hint shuffle_hash " +
          "or use a numeric key"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("battery-wide: production path pushes filters into the parquet scan") {
    // Direct (uncached) reads — the 100 TB path. Each probe filters a
    // scan column; its plan must show a non-empty PushedFilters list.
    // Registry bypass alone is not enough: CacheManager SUBSTITUTES any
    // fresh identical read with a registered cached relation, so drop
    // the cache registry too (later suites re-materialize on demand —
    // the registry's persist marks survive).
    spark.catalog.clearCache()
    spark.conf.set("spark.graft.tableCache", "false")
    try {
      val pushed = "PushedFilters: \\[[A-Z]".r
      for (name <- Seq("scan_filter", "filter_compound", "q1_pricing_summary",
                       "q6_forecast_revenue", "join_broadcast_dim",
                       "q3_shipping_priority", "q5_local_supplier")) {
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(pushed.findFirstIn(p).isDefined,
          s"$name: no non-empty PushedFilters on the uncached path\n${p.take(1000)}")
      }
      // Filterless scans must still PRUNE: a full-width documents read
      // for a 1-2 column aggregate would be the wrong plan at 100 TB.
      for ((name, schema) <- Seq(
             "dedup_exact_hash" -> "ReadSchema: struct<text:string>",
             "text_quality_score" -> "ReadSchema: struct<text:string,lang:string>")) {
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(p.contains(schema), s"$name: scan not pruned\n${p.take(1000)}")
      }
    } finally spark.conf.set("spark.graft.tableCache", "true")
  }
}
