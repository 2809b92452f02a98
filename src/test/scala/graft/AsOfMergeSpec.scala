package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** The custom physical as-of operator (plans/AsOfMerge.scala):
  * semantics vs the cogroup form, outer semantics, plan shape, and the
  * O(1)-state hot-key property that motivates the operator.
  */
class AsOfMergeSpec extends SparkSpecBase {

  private def legs() = {
    val e = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("key"),
              unix_micros(col("ts")).as("p_ts"))
    val sg = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_key"),
              unix_micros(col("ts")).as("s_ts"))
    (p, sg)
  }

  test("merge exec == cogroup form on the full corpus (no limit)") {
    val (p, sg) = legs()
    val merged = AsOf.asofMergePlan(p, sg, "key", "p_ts", "s_key", "s_ts")
      .select(col("purchase_id"), col("signup_id"))
    val cogrouped = AsOf.asofLastPrior(
      p.select(col("purchase_id").as("id"), col("key"), col("p_ts").as("ts")),
      sg.select(col("signup_id").as("id"), col("s_key").as("key"), col("s_ts").as("ts")))
      .select(col("purchase_id"), col("last_signup_id").as("signup_id"))
    assert(merged.exceptAll(cogrouped).isEmpty && cogrouped.exceptAll(merged).isEmpty)
  }

  test("left outer keeps unmatched lefts with null right columns") {
    val (p, sg) = legs()
    val outer = AsOf.asofMergePlan(p, sg, "key", "p_ts", "s_key", "s_ts",
      leftOuter = true)
    // every purchase survives
    assert(outer.count() == p.count())
    // unmatched = purchases whose user has no signup at-or-before; they
    // carry null signup_id, and inner drops exactly them
    val inner = AsOf.asofMergePlan(p, sg, "key", "p_ts", "s_key", "s_ts")
    assert(outer.filter(col("signup_id").isNull).count() ==
      p.count() - inner.count())
  }

  test("null keys/timestamps follow SQL join semantics on both sides") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("t", LongType)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // left: null key, null ts, and a key-0 row (a null key hashing near
    // 0 must NOT match real key 0); right: null key/ts rows plus real
    // candidates for keys 0 and 1
    val left = df(Seq(Row(1L, null, 50L), Row(2L, 7L, null), Row(3L, 0L, 50L),
                      Row(4L, 1L, 50L)))
    val right = df(Seq(Row(10L, null, 10L), Row(11L, 0L, null), Row(12L, 0L, 20L),
                       Row(13L, 1L, 20L), Row(14L, 1L, 40L), Row(15L, 1L, 60L)))
      .toDF("rid", "rk", "rt")
    val outer = graft.ops.AsOf.asofMergePlan(left, right, "k", "t", "rk", "rt",
        leftOuter = true)
      .select("id", "rid").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // null-field left rows survive unmatched; null-field right rows are
    // never candidates; real matches pick the last prior
    assert(outer == Map(1L -> None, 2L -> None, 3L -> Some(12L), 4L -> Some(14L)))
    val inner = graft.ops.AsOf.asofMergePlan(left, right, "k", "t", "rk", "rt")
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inner == Map(3L -> 12L, 4L -> 14L))
  }

  test("plan: AsOfMergeExec with exactly two exchanges and two sorts") {
    val (p, sg) = legs()
    val df = AsOf.asofMergePlan(p, sg, "key", "p_ts", "s_key", "s_ts")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMerge"), plan.take(800))
    // EnsureRequirements satisfies the SMJ-style contract: one hash
    // exchange + one sort per side, nothing else (no window, no
    // band-join candidate explosion)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges\n${plan.take(1200)}")
    assert(sorts == 2, s"expected 2 sorts, got $sorts\n${plan.take(1200)}")
  }

  test("hot key: 200k left rows on ONE key sweep in O(1) state and stay exact") {
    import spark.implicits._
    val n = 200000
    // left: one key, ts = 2i; right: same key, ts = 4j (j < n/2) —
    // expected match for left i: greatest 4j <= 2i -> j = i/2
    val l = spark.range(n).select(col("id").as("lid"), lit(7L).as("key"),
      (col("id") * 2).as("lts"))
    val r = spark.range(n / 2).select(col("id").as("rid"), lit(7L).as("rkey"),
      (col("id") * 4).as("rts"))
    val out = AsOf.asofMergePlan(l, r, "key", "lts", "rkey", "rts")
      .select(col("lid"), col("rid"))
    val wrong = out.filter(col("rid") =!= expr("div(lid, 2)")).count()
    assert(wrong == 0L && out.count() == n)
  }

  // ---- forward (first-after) mode, round 10 ----------------------------

  test("forward: merge exec == band-join min-struct form on the full corpus") {
    val e = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("key"),
              unix_micros(col("ts")).as("p_ts"))
    val er = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_key"), unix_micros(col("ts")).as("e_ts"),
              col("event_id").as("e_id"))
    val merged = AsOf.asofMergePlan(p, er, "key", "p_ts", "e_key", "e_ts",
        forward = true)
      .select(col("purchase_id"), col("e_id"))
    val banded = p.join(er, col("key") === col("e_key") && col("e_ts") > col("p_ts"))
      .groupBy("purchase_id")
      .agg(min(struct(col("e_ts"), col("e_id"))).getField("e_id").as("e_id"))
    assert(merged.exceptAll(banded).isEmpty && banded.exceptAll(merged).isEmpty)
  }

  test("forward: null semantics and strictness (same-instant right row never matches)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("t", LongType)))
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // left 3 has a right row at the SAME ts (strict > must skip it and
    // take the later one); left 4's only candidates are <= its ts
    val left = df(Seq(Row(1L, null, 50L), Row(2L, 7L, null), Row(3L, 0L, 20L),
                      Row(4L, 1L, 60L)))
    val right = df(Seq(Row(10L, null, 10L), Row(11L, 0L, null), Row(12L, 0L, 20L),
                       Row(13L, 0L, 30L), Row(14L, 1L, 20L), Row(15L, 1L, 60L)))
      .toDF("rid", "rk", "rt")
    val outer = graft.ops.AsOf.asofMergePlan(left, right, "k", "t", "rk", "rt",
        leftOuter = true, forward = true)
      .select("id", "rid").collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(outer == Map(1L -> None, 2L -> None, 3L -> Some(13L), 4L -> None),
      outer.toString)
    val inner = graft.ops.AsOf.asofMergePlan(left, right, "k", "t", "rk", "rt",
        forward = true)
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inner == Map(3L -> 13L))
  }

  test("forward hot key: 200k left rows on ONE key sweep exactly") {
    import spark.implicits._
    val n = 200000
    // left: one key, ts = 2i; right: same key, ts = 4j — expected
    // first-after for left i: smallest 4j > 2i -> j = i/2 + 1 (even i)
    // or (i+1)/2 (odd i) = floor(i/2) + 1; unmatched once 4j exceeds
    // the right domain
    val l = spark.range(n).select(col("id").as("lid"), lit(7L).as("key"),
      (col("id") * 2).as("lts"))
    val r = spark.range(n / 2).select(col("id").as("rid"), lit(7L).as("rkey"),
      (col("id") * 4).as("rts"))
    val out = AsOf.asofMergePlan(l, r, "key", "lts", "rkey", "rts",
        forward = true)
      .select(col("lid"), col("rid"))
    val wrong = out.filter(col("rid") =!= expr("div(lid, 2) + 1")).count()
    // matched lefts: those with some 4j > 2i, j < n/2 -> i/2 + 1 <= n/2 - 1
    val expected = l.filter(expr(s"div(lid, 2) + 1 <= ${n / 2 - 1}")).count()
    assert(wrong == 0L && out.count() == expected, s"wrong=$wrong n=${out.count()}")
  }
}
