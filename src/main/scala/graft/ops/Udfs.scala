package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.tables.Tables
import Util._

/** The user-extension surface (SURVEY.md §2.3 UDF block): a registered
  * scalar UDF, a typed `Aggregator` UDAF, and a typed `flatMap`
  * generator. These three deliberately exercise the extension
  * registration paths; everything else in the library stays on
  * codegen'd built-ins (SURVEY §4.3: compose Catalyst, don't rebuild).
  */
object Udfs {

  /** Geometric mean as a typed Aggregator: fold ln(x), finish with
    * exp(Σln/n). Partial aggregation (reduce) + merge mirror Spark's
    * two-phase agg, so it scales like any built-in aggregate.
    */
  case class GeoBuf(sumLn: Double, n: Long)

  object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    def zero: GeoBuf = GeoBuf(0.0, 0L)
    def reduce(b: GeoBuf, x: Double): GeoBuf = GeoBuf(b.sumLn + math.log(x), b.n + 1)
    def merge(a: GeoBuf, b: GeoBuf): GeoBuf = GeoBuf(a.sumLn + b.sumLn, a.n + b.n)
    def finish(b: GeoBuf): Double = math.exp(b.sumLn / b.n)
    def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val udfScalarBucket: Q = (s, d) => {
    val bucket = udf((p: Double) => if (p < 100000) "S" else if (p < 300000) "M" else "L")
    Tables.t(s, d, "orders")
      .groupBy(bucket(col("o_totalprice")).as("b"))
      .agg(cnt.as("c"))
      .orderBy("b")
  }

  val udafGeomean: Q = (s, d) => {
    val geo = udaf(GeoMean)
    Tables.t(s, d, "customer")
      .filter(col("c_acctbal") > 0)
      .groupBy("c_mktsegment")
      .agg(round(geo(col("c_acctbal")) * 100).cast("long").as("geo_cents"))
      .orderBy("c_mktsegment")
  }

  val udtfExplodeChars: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    Tables.t(s, d, "documents")
      .select(col("lang"), col("text")).as[(String, String)]
      .flatMap { case (lang, text) => text.split(" ").iterator.map(t => (lang, t)) }
      .toDF("lang", "tok")
      .filter(col("tok").isin("join", "filter", "window"))
      .groupBy("lang", "tok")
      .agg(cnt.as("c"))
      .orderBy("lang", "tok")
  }

  /** OUTER generator semantics: `posexplode_outer` keeps parent rows
    * whose generated list is EMPTY (null-extended) — the LATERAL VIEW
    * OUTER contract an inner explode silently violates by dropping
    * them. Rare-marker filter empties most documents on purpose.
    */
  val udtfExplodeOuter: Q = (s, d) =>
    Tables.t(s, d, "documents")
      .withColumn("l", expr("filter(split(text, ' '), x -> x IN ('vector', 'variant'))"))
      .select(col("doc_id"), posexplode_outer(col("l")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
      .orderBy("doc_id", "pos")

  val queries: Map[String, Q] = Map(
    "udf_scalar_bucket" -> udfScalarBucket,
    "udaf_geomean" -> udafGeomean,
    "udtf_explode_chars" -> udtfExplodeChars,
    "udtf_explode_outer" -> udtfExplodeOuter,
  )
}
