package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Layer-4 property tests (SURVEY.md §5.2-4): algebraic laws every
  * relational engine must satisfy, checked on real data + generated
  * predicates (scalacheck `Gen` sampled with a fixed seed — no
  * scalatestplus bridge is available offline).
  */
class PropertySpec extends SparkSpecBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(a) => a }
      .take(n).toSeq

  private lazy val orders = graft.tables.Tables.t(spark, sf, "orders")

  test("filter(p) and filter(!p) partition the input") {
    val thresholds = Seq(0.0, 100000.0, 250000.0, 500000.0, 1e9)
    val total = orders.count()
    thresholds.foreach { t =>
      val p = col("o_totalprice") > t
      assert(orders.filter(p).count() + orders.filter(!p).count() == total)
    }
  }

  test("dropDuplicates is idempotent and equals distinct key count") {
    val d1 = orders.select("o_custkey").dropDuplicates()
    assert(d1.count() == orders.select("o_custkey").distinct().count())
    assert(d1.dropDuplicates().count() == d1.count())
  }

  test("tumbling windows partition the stream: window counts sum to total") {
    val e = graft.tables.Tables.t(spark, sf, "events")
    val windowed = e.groupBy(window(col("ts"), "1 day")).agg(count(lit(1)).as("c"))
    val sumOfWindows = windowed.agg(sum("c")).collect().head.getLong(0)
    assert(sumOfWindows == e.count())
  }

  test("cents-sum is partitioning-invariant (R2 guard)") {
    val base = orders.select(round(col("o_totalprice") * 100).cast("long").as("c"))
    val s1 = base.repartition(1).agg(sum("c")).collect().head.getLong(0)
    val s7 = base.repartition(7).agg(sum("c")).collect().head.getLong(0)
    assert(s1 == s7)
  }

  test("join with key-preserving transform commutes") {
    val c = graft.tables.Tables.t(spark, sf, "customer")
    val j1 = c.join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_totalprice") > 200000).count()
    val j2 = c.join(orders.filter(col("o_totalprice") > 200000),
                    col("c_custkey") === col("o_custkey")).count()
    assert(j1 == j2)
  }

  test("null semantics: join keys, aggregates, set ops") {
    val s = spark
    import s.implicits._
    val a = Seq((Some(1L), "a1"), (None, "a2"), (Some(2L), "a3"))
      .toDF("k", "va")
    val b = Seq((Some(1L), "b1"), (None, "b2"))
      .toDF("k", "vb")
    // null keys never match in equi-joins
    val inner = a.join(b, a("k") === b("k")).count()
    assert(inner == 1)
    // ...but null-safe equality matches them
    val nullSafe = a.join(b, a("k") <=> b("k")).count()
    assert(nullSafe == 2)
    // count(*) counts nulls, count(col) skips them
    assert(a.agg(count(lit(1))).collect().head.getLong(0) == 3)
    assert(a.agg(count(col("k"))).collect().head.getLong(0) == 2)
    // distinct/set semantics treat null as a value
    val u = a.select("k").union(b.select("k")).distinct().count()
    assert(u == 3) // 1, 2, null
    // left join null-pads and coalesce recovers
    val lj = a.join(b, a("k") === b("k"), "left_outer")
      .select(coalesce(col("vb"), lit("none")).as("vb")).collect()
    assert(lj.count(_.getString(0) == "none") == 2)
  }

  test("generated integer predicates: filter partition law on custkeys") {
    val total = orders.count()
    samples(Gen.choose(2, 97), 8).foreach { m =>
      val p = col("o_custkey") % m === 0
      val a = orders.filter(p).count()
      val b = orders.filter(!p).count()
      assert(a + b == total, s"modulo $m")
    }
  }

  test("globalRank emits a permutation 1..n under generated bucket widths") {
    val n = orders.count()
    // the ranking must be a bijection onto 1..n REGARDLESS of how the
    // coarse bucketing slices the data — bucket width is an internal
    // parallelism knob, not a semantic one
    samples(Gen.choose(500, 100000), 5).foreach { w =>
      val rns = graft.ops.Scale
        .globalRank(orders.select("o_totalprice", "o_orderkey"),
                    floor(col("o_totalprice") / w),
                    Seq(col("o_totalprice"), col("o_orderkey")))
      val stats = rns.agg(count(lit(1)).as("c"),
                          countDistinct(col("__rn")).as("d"),
                          min("__rn").as("mn"), max("__rn").as("mx"))
        .collect().head
      assert(stats.getLong(0) == n && stats.getLong(1) == n &&
             stats.getLong(2) == 1L && stats.getLong(3) == n,
        s"width $w: $stats")
    }
  }

  test("globalNtileCensus equals rank-every-row globalNtile census under generated widths and k") {
    // the aggregate-pushdown census (interior buckets skip ranking;
    // only straddlers window) must be bit-identical to ranking every
    // row and aggregating — for ANY bucket width (including widths
    // that put whole tiles inside one bucket or straddle several) and
    // any k, including k > n (every tile is a single row or empty)
    val cases = samples(Gen.zip(Gen.choose(500, 100000), Gen.choose(2, 9)), 6) ++
      Seq((20000, 4), (1, 3)) // the bench shape; width 1 ≈ one bucket per price
    cases.foreach { case (w, k) =>
      val src = orders.select("o_totalprice", "o_orderkey")
      val expected = graft.ops.Scale
        .globalNtile(src, k, floor(col("o_totalprice") / w),
                     Seq(col("o_totalprice"), col("o_orderkey")))
        .groupBy(col("__tile")).agg(count(lit(1)).as("c"),
                                    min("o_totalprice").as("mn"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = graft.ops.Scale
        .globalNtileCensus(src, k, floor(col("o_totalprice") / w),
          Seq(col("o_totalprice"), col("o_orderkey")),
          aggs = Seq(count(lit(1)).as("c"), min("o_totalprice").as("mn")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"width $w k $k")
    }
    // n < k: 3 rows into 5 tiles — tiles 4..5 empty, sizes all 1
    val tiny = orders.select("o_totalprice", "o_orderkey")
      .orderBy("o_orderkey").limit(3)
    val tinyGot = graft.ops.Scale
      .globalNtileCensus(tiny, 5, floor(col("o_totalprice") / 1000),
        Seq(col("o_totalprice"), col("o_orderkey")),
        aggs = Seq(count(lit(1)).as("c")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tinyGot == Set((1L, 1L), (2L, 1L), (3L, 1L)), tinyGot.toString)
  }

  test("globalPrefixSum is bucket-width invariant (KS consumer contract)") {
    // the coarse bucket is an internal parallelism knob — the prefix
    // sum (and so any statistic derived from it, e.g. the KS max)
    // must be identical for ANY width
    val vals = orders.select(col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("v"))
    def psChecksum(w: Int): (Long, Long) = {
      val ps = graft.ops.Scale.globalPrefixSum(vals,
        floor(col("v") / w), Seq(col("v"), col("k")), col("v"))
      val r = ps.agg(max("__ps"), sum(expr("__ps * (k % 1000)")))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    val base = psChecksum(2000)
    samples(Gen.choose(100, 5000000), 4).foreach { w =>
      assert(psChecksum(w) == base, s"width $w diverged")
    }
  }

  test("sample_systematic picks identical doc_ids under any internal bucketing") {
    // the md5-order systematic sample must be a pure function of the
    // data: re-deriving the rank with different coarse buckets (or a
    // plain window at test scale) yields the same every-20th set
    val docs = graft.tables.Tables.t(spark, sf, "documents").select(col("doc_id"))
      .withColumn("k", md5(col("doc_id").cast("string")))
    val expected = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .filter(col("rn") % 20 === 1).select("doc_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    samples(Gen.choose(1, 4), 3).foreach { nibbles =>
      val got = graft.ops.Scale.globalRank(docs,
          expr(s"conv(substring(k, 1, $nibbles), 16, 10)").cast("long"),
          Seq(col("k"), col("doc_id")))
        .filter(col("__rn") % 20 === 1)
        .select(col("doc_id"), col("__rn"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"bucket prefix $nibbles diverged")
    }
  }

  test("incrementalJoin law: refresh equals full recompute across generated mutation sequences") {
    import spark.implicits._
    import graft.sinks.CowTable
    val dir = java.nio.file.Files.createTempDirectory("graft_ivmj_prop").toString
    val (pa, pb) = (s"$dir/a", s"$dir/b")
    CowTable.create((0L until 60L).map(i => (i, i % 7)).toDF("id", "va"), pa)
    CowTable.create((0L until 60L).filter(_ % 3 != 0)
      .map(i => (i, i * 2)).toDF("id", "vb"), pb)
    def joinOf(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.join(b, Seq("id"), "full").select(col("id"), col("va"), col("vb"))
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0),
                 if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
                 if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))
      .sorted.toSeq
    var mv = joinOf(CowTable.read(spark, pa), CowTable.read(spark, pb))
      .localCheckpoint()
    var (va, vb) = (CowTable.currentVersion(pa), CowTable.currentVersion(pb))
    // generated mutations: (side, op, key-seed) — upsert existing,
    // insert new, or MoR-delete; after EACH, the incremental refresh
    // from the last maintained state must equal the full recompute
    val ops = samples(Gen.zip(Gen.oneOf("a", "b"),
                              Gen.oneOf("upsert", "insert", "delete"),
                              Gen.choose(0L, 59L)), 8)
    var nextNew = 1000L
    ops.foreach { case (side, op, k) =>
      val (path, valCol) = if (side == "a") (pa, "va") else (pb, "vb")
      op match {
        case "upsert" => CowTable.merge(spark, path,
          Seq((k, k + 777L)).toDF("id", valCol), "id")
        case "insert" =>
          nextNew += 1
          CowTable.merge(spark, path,
            Seq((nextNew, nextNew)).toDF("id", valCol), "id")
        case "delete" => CowTable.deleteMorKeys(spark, path,
          Seq(k).toDF("id"), "id")
      }
      val (na, nb) = (CowTable.currentVersion(pa), CowTable.currentVersion(pb))
      mv = CowTable.incrementalJoin(spark, pa, pb, "id", mv, va, na, vb, nb)(joinOf)
        .localCheckpoint()
      va = na; vb = nb
      val full = joinOf(CowTable.read(spark, pa), CowTable.read(spark, pb))
      assert(snap(mv) == snap(full), s"diverged after $side/$op/$k")
    }
  }

  test("connectedComponents equals GraphX on generated random graphs (both label min node id)") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.choose(0L, 29L)
      b <- Gen.choose(0L, 29L)
      if a != b
    } yield (a, b)
    val graphs = samples(Gen.listOfN(40, edgeGen).map(_.toSeq), 3)
    graphs.foreach { es =>
      val ours = graft.ops.Scale
        .connectedComponents(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gx = org.apache.spark.graphx.Graph
        .fromEdgeTuples(spark.sparkContext.parallelize(es), defaultValue = 0)
        .connectedComponents().vertices.collect().toMap
      assert(ours == gx.map { case (k, v) => (k, v) },
        s"ours=$ours graphx=$gx")
    }
  }

  test("connectedComponentsStar: same labels as propagation, O(log n) rounds on a path") {
    import spark.implicits._
    // random graphs: label-for-label equality with the propagation loop
    val edgeGen = for {
      a <- Gen.choose(0L, 29L)
      b <- Gen.choose(0L, 29L)
      if a != b
    } yield (a, b)
    samples(Gen.listOfN(40, edgeGen).map(_.toSeq), 3).foreach { es =>
      val prop = graft.ops.Scale
        .connectedComponents(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (starDf, _) = graft.ops.Scale
        .connectedComponentsStar(es.toDF("src", "dst"), "src", "dst")
      val star = starDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == prop, s"star=$star prop=$prop")
    }
    // a 30-node path has diameter 29: propagation needs ~30 rounds
    // (past its default maxIter=25); star contraction collapses it in
    // O(log n)
    val chain = (0L until 29L).map(i => (i, i + 1))
    val (labels, rounds) = graft.ops.Scale
      .connectedComponentsStar(chain.toDF("src", "dst"), "src", "dst")
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 30 && m.values.forall(_ == 0L), m.toString)
    assert(rounds <= 8, s"expected O(log n) rounds, got $rounds")
  }

  test("triangleCount equals brute-force enumeration on generated random graphs") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.choose(0L, 19L)
      b <- Gen.choose(0L, 19L)
    } yield (a, b)
    val graphs = samples(Gen.listOfN(60, edgeGen).map(_.toSeq), 5)
    graphs.zipWithIndex.foreach { case (es, trial) =>
      val adj = es.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val nodes = adj.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
      val brute = (for {
        i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
        if adj((nodes(i), nodes(j))) && adj((nodes(j), nodes(k))) && adj((nodes(i), nodes(k)))
      } yield 1).size.toLong
      val got = graft.ops.Scale
        .triangleCount(es.toDF("src", "dst"))
        .collect().headOption.map(_.getLong(0)).getOrElse(0L)
      assert(got == brute, s"trial $trial: oriented=$got brute=$brute adj=$adj")
      // third implementation: GraphX counts per-vertex memberships (3 per triangle)
      val gx = org.apache.spark.graphx.Graph
        .fromEdgeTuples(spark.sparkContext.parallelize(adj.toSeq), 0)
        .partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
        .triangleCount().vertices.map(_._2.toLong).sum().toLong
      assert(gx == 3 * brute, s"trial $trial: graphx=$gx brute=$brute")
    }
  }

  test("VecSumLong is partitioning-invariant and equals the scalar sums") {
    import spark.implicits._
    import graft.functions.VectorFunctions.vec_sum_long
    val gen = Gen.listOfN(8, Gen.chooseNum(-1000000L, 1000000L))
    val rows = samples(gen, 400).map(_.toArray)
    val expected = (0 until 8).map(j => rows.map(_(j)).sum)
    Seq(1, 3, 32).foreach { parts =>
      val got = rows.toSeq.toDF("a")
        .repartition(parts)
        .agg(vec_sum_long(col("a")))
        .collect().head.getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("streaming KMV hash/merge: min-k union is associative and order-free") {
    import graft.streaming.StreamOps.kmvHash
    val k = 16
    val vals = samples(Gen.chooseNum(0L, 1000000L), 300).distinct
    def sketch(vs: Seq[Long]): Seq[Long] =
      vs.map(kmvHash).distinct.sorted.take(k)
    val whole = sketch(vals)
    // any split, merged as the min-k of the union, equals the one-shot sketch
    Seq(1, 7, 50, 299).foreach { cut =>
      val (a, b) = vals.splitAt(cut % vals.length max 1)
      val merged = (sketch(a) ++ sketch(b)).distinct.sorted.take(k)
      assert(merged == whole, s"cut=$cut")
    }
    // and the batch operator's estimator agrees with the scala replay
    val est = if (whole.length < k) whole.length.toLong
              else (k - 1).toLong * 2147483648L / whole.last
    assert(est > 0)
  }

  test("AsOfMergeExec equals the cogroup as-of on generated skewed legs (inner AND outer)") {
    import spark.implicits._
    import graft.ops.AsOf
    // few keys (forced collisions + hot keys), coarse timestamps
    // (forced exact ts ties — the (ts, id)-max tiebreak must matter)
    val genRow = for {
      key <- Gen.oneOf(1L, 2L, 2L, 2L, 3L, 7L) // key 2 hot
      ts <- Gen.choose(0L, 40L)
    } yield (key, ts)
    for (trial <- 0 until 4) {
      val lRows = samples(genRow, 300 + trial * 137).zipWithIndex
        .map { case ((kk, t), i) => (i.toLong, kk, t) }
      val rRows = samples(genRow, 200 + trial * 91).zipWithIndex
        .map { case ((kk, t), i) => (10000L + i, kk, t) }
      val l = lRows.toDF("lid", "key", "lts")
      val r = rRows.toDF("rid", "rkey", "rts")
      // scala truth: greatest (ts, id) right row at-or-before each left
      val truth = lRows.flatMap { case (lid, kk, lts) =>
        val cands = rRows.filter(rr => rr._2 == kk && rr._3 <= lts)
        if (cands.isEmpty) None
        else Some(lid -> cands.map(rr => (rr._3, rr._1)).max._2)
      }.toMap
      val exec = AsOf.asofMergePlan(l, r, "key", "lts", "rkey", "rts")
        .select("lid", "rid").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(exec == truth, s"trial $trial inner")
      val outer = AsOf.asofMergePlan(l, r, "key", "lts", "rkey", "rts",
        leftOuter = true)
      assert(outer.count() == lRows.length, s"trial $trial outer count")
      val outerMatched = outer.filter(col("rid").isNotNull)
        .select("lid", "rid").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(outerMatched == truth, s"trial $trial outer matches")
    }
  }

  test("globalPrefixSums fused pass equals sequential single-value passes (+ totals)") {
    // the r19 KS fusion contract: D cumulatives in one window pass must
    // equal D sequential globalPrefixSum passes, and the free totals
    // must equal a plain aggregate
    val vals = orders.select(col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("v"),
      (col("o_orderkey") % 7).as("w"))
    val coarse = floor(col("v") / 50000)
    val sort = Seq(col("v"), col("k"))
    val fused = graft.ops.Scale.globalPrefixSums(vals, coarse, sort,
      Seq("psv" -> col("v"), "psw" -> col("w")), totals = true)
    val seqV = graft.ops.Scale.globalPrefixSum(vals, coarse, sort, col("v"))
      .withColumnRenamed("__ps", "psv")
    val seqW = graft.ops.Scale.globalPrefixSum(vals, coarse, sort, col("w"))
      .withColumnRenamed("__ps", "psw")
    val expect = seqV.select("k", "psv")
      .join(seqW.select(col("k"), col("psw")), "k")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = fused.select("k", "psv", "psw")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    val tot = vals.agg(sum("v"), sum("w")).collect().head
    val fTot = fused.select("psv_tot", "psw_tot").distinct().collect()
    assert(fTot.length == 1)
    assert(fTot.head.getLong(0) == tot.getLong(0) &&
      fTot.head.getLong(1) == tot.getLong(1))
  }

  test("Scale.materialize reliable path survives conf switch and writes the checkpoint store") {
    // spark.graft.reliableCheckpoints=true routes the lineage cut
    // through a RELIABLE checkpoint (cluster-grade: survives executor
    // loss) instead of localCheckpoint; results must be identical and
    // the checkpoint dir must actually receive the data
    // conf isolation: newSession() clones the SQLConf, so the flag
    // never leaks into suites sharing the JVM-wide session; the
    // checkpoint dir is SparkContext-level but harmless to others
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.reliableCheckpoints", "true")
    val base = SparkEntry.queries("cust_rfm_cells")(s2, sf)
      .collect().map(_.toString).sorted
    val expect = q("cust_rfm_cells").collect().map(_.toString).sorted
    assert(base.sameElements(expect))
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable checkpoint wrote nothing to the checkpoint dir")
  }
}
