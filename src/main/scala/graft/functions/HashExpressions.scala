package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Shared 64-bit token hash: two Murmur3 passes (seeds 41, 97) over the
  * token's UTF-8 bytes, combined — deterministic across JVMs, cheap in
  * codegen. Used by both MinHash and SimHash so their band/bit math is
  * derived from one hash family.
  */
object TokenHash {
  def hash64(t: UTF8String): Long = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 41)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 97)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** SplitMix64 finalizer — mixes a seed into a well-distributed odd
    * multiplier / offset for the universal-hash permutation family.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** MinHash signature of a token set: `sig[i] = min over tokens of
  * (a_i * h(token) + b_i)` with `(a_i, b_i)` a fixed universal-hash
  * family — the standard one-hash-then-permute construction. One
  * codegen'd O(|tokens| × k) loop per document, computed ONCE per doc
  * on the build side of the LSH join (the whole point of MinHash+LSH:
  * the quadratic candidate phase touches only the k-long signatures,
  * never the token sets).
  *
  * At 100 TB this replaces the blocked O(n²) Jaccard join: band keys
  * hash-partition the corpus, so candidate generation is a shuffle on
  * (band, bucket) — linear in corpus size — and the exact Jaccard
  * verify runs only inside buckets.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash requires array<string>, got ${t.catalogString}")
  }

  // Fixed permutation family (deterministic across sessions).
  private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => TokenHash.mix64(2L * i + 1L) | 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => TokenHash.mix64(0x5851f42d4c957f2dL + i))

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val h = TokenHash.hash64(toks.getUTF8String(t))
      var i = 0
      while (i < numHashes) {
        val g = as(i) * h + bs(i)
        if (g < sig(i)) sig(i) = g
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val g = ctx.freshName("g"); val sig = ctx.freshName("sig")
      val s = ctx.freshName("s")
      s"""
         |int $n = $toks.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n; $t++) {
         |  UTF8String $s = $toks.getUTF8String($t);
         |  long $h = graft.functions.TokenHash.hash64($s);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $g = $aRef[$i] * $h + $bRef[$i];
         |    if ($g < $sig[$i]) $sig[$i] = $g;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token set: per-bit sign-sum of token hashes —
  * near-identical documents land within a small Hamming distance.
  * Complements MinHash: SimHash keys are a single long (cheap to
  * store/cluster at 100 TB); MinHash bands give tunable recall.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var t = 0
    while (t < toks.numElements()) {
      val h = TokenHash.hash64(toks.getUTF8String(t))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      s"""
         |int $n = $toks.numElements();
         |int[] $acc = new int[64];
         |for (int $t = 0; $t < $n; $t++) {
         |  UTF8String $s = $toks.getUTF8String($t);
         |  long $h = graft.functions.TokenHash.hash64($s);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $acc[$j]++; else $acc[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($acc[$j] > 0) $out |= (1L << $j); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  def minhash(tokens: Column, numHashes: Int = 128): Column =
    ColumnShim.column(MinHashSignature(ColumnShim.expression(tokens), numHashes))

  def simhash(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))
}
