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

  test("generated integer predicates: filter partition law on custkeys") {
    val total = orders.count()
    samples(Gen.choose(2, 97), 8).foreach { m =>
      val p = col("o_custkey") % m === 0
      val a = orders.filter(p).count()
      val b = orders.filter(!p).count()
      assert(a + b == total, s"modulo $m")
    }
  }
}
