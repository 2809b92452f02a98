package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a static kernel shared by the
  * interpreted and codegen paths of [[JaroWinkler]].
  *
  * Standard parameterization (matches DuckDB's RapidFuzz-backed
  * `jaro_winkler_similarity`, probed empirically):
  *   - Jaro match window `max(|a|,|b|)/2 - 1` (floor, clamped ≥ 0),
  *     transpositions counted over the matched subsequences;
  *   - either side empty → 0.0 (including both empty);
  *   - Winkler prefix boost `+ L·0.1·(1−jaro)` with L = common prefix
  *     length capped at 4, applied ONLY when jaro > 0.7.
  *
  * The arithmetic is the same tree on both engines — three exact
  * integer ratios summed and divided by 3 — so quantized comparison
  * (`floor(x·1e6 + 0.5)`) is oracle-stable.
  */
object StrSim {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](l1)
    val matched2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the two matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
           s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` — codegen Catalyst expression. The per-row
  * kernel is a static call (the same shape Spark's own `levenshtein`
  * uses), so it stays inside whole-stage codegen with no interpreted
  * fallback and no allocation beyond the two per-row flag arrays.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StrSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StrSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinkler(ColumnShim.expression(a), ColumnShim.expression(b)))
}
