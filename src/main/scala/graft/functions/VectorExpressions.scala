package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding-similarity hot path.
  *
  * `VecDot(a, b)` = Σ aᵢ·bᵢ in double precision over `array<float>` or
  * `array<double>` inputs — one fused, codegen'd loop per row pair.
  * The reference semantics (cosine over float vectors cast to double,
  * SURVEY.md §2.1-R5) are preserved bit-for-bit: each element is
  * widened to double and the products are accumulated sequentially in
  * index order, exactly like the `transform(cast) ∘ aggregate` chain it
  * replaces — but ~20× faster, because Catalyst's higher-order lambda
  * functions are interpreted per element while this compiles into the
  * whole-stage-codegen loop.
  *
  * At 100 TB this is the inner kernel of every similarity operator
  * (threshold self-join, kNN, IVF probe); a non-codegen path there
  * would dominate the profile.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float> or array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σxᵢ in double precision over `array<float>`/`array<double>` — the
  * projection kernel of the cosine band rewrite
  * ([[graft.plans.CosineBandRule]]): ⟨x, 1⃗⟩ = Σxᵢ, so the normalized
  * all-ones projection is `vec_sum(x) / (‖x‖·√d)`. Same widening and
  * sequential accumulation rules as [[VecDot]].
  */
case class VecSum(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum requires array<float> or array<double> input, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val isFloat = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < n) {
      s += (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $s += ((double) $a.$get($i)); }
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity |A∩B| / |A∪B| over two SORTED, DISTINCT string
  * arrays — a single codegen'd merge pass, O(|A|+|B|), no per-call hash
  * sets. Replaces the interpreted `array_intersect`/`array_union` pair
  * in the near-dup join (each of which builds a hash set per row pair).
  * The counts are exact integers, so the double division matches any
  * engine computing the same ratio bit-for-bit.
  *
  * Inputs MUST be pre-processed with `array_sort(array_distinct(...))`
  * — done once per document on the build side of the join, not per
  * pair, which is the point.
  */
case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    // Pattern-match rather than ArrayType equality: containsNull varies
    // by producer (split() vs array_distinct) and is irrelevant here.
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard requires array<string> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      // binaryCompare, NOT compareTo: Spark 4.1's compareTo runs an
      // isTesting() System.getenv probe per call (collation assert) —
      // fatal at billions of merge steps. Inputs come from array_sort,
      // whose default UTF8_BINARY ordering IS binaryCompare's.
      val c = x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).binaryCompare($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = ($union == 0) ? 1.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A∩B| over two SORTED, DISTINCT string arrays — the same single
  * merge pass as [[SortedJaccard]] but returning the raw intersection
  * count, for ASYMMETRIC set similarities (containment |A∩B|/|A| —
  * quote/subset detection — where Jaccard's symmetric union
  * normalization is wrong).
  */
case class SortedOverlap(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_overlap requires array<string> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $inter = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).binaryCompare($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Argmin-centroid for integer-quantized k-means: given a query vector
  * `array<bigint>` and a broadcast centroid list
  * `array<struct<cid:bigint, c:array<bigint>>>`, returns the cid of the
  * squared-L2-nearest centroid, ties to the SMALLEST cid (the (d2, cid)
  * lexicographic comparison is explicit in the loop, so the result is
  * independent of centroid array order).
  *
  * This is the fused, codegen'd form of
  * `array_min(transform(cents, ct -> struct(aggregate(zip_with(...)), cid))).cid`
  * — the interpreted higher-order chain evaluates k·dim lambda calls
  * per row and dominated the k-means profile; this is one flat nested
  * loop inside whole-stage codegen.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _),
          ArrayType(StructType(Array(f0, f1)), _))
        if f0.dataType == LongType &&
          f1.dataType.isInstanceOf[ArrayType] &&
          f1.dataType.asInstanceOf[ArrayType].elementType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires (array<bigint>, array<struct<bigint, array<bigint>>>), " +
        s"got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    var bestD = Long.MaxValue
    var bestC = -1L
    var j = 0
    while (j < cents.numElements()) {
      val st = cents.getStruct(j, 2)
      val cid = st.getLong(0)
      val cv = st.getArray(1)
      val n = math.min(q.numElements(), cv.numElements())
      var d = 0L
      var i = 0
      while (i < n) {
        val t = q.getLong(i) - cv.getLong(i)
        d += t * t
        i += 1
      }
      if (d < bestD || (d == bestD && cid < bestC)) { bestD = d; bestC = cid }
      j += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val st = ctx.freshName("st")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
         |long $bestD = Long.MAX_VALUE;
         |long $bestC = -1L;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $st = $b.getStruct($j, 2);
         |  long $cid = $st.getLong(0);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $st.getArray(1);
         |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $t = $a.getLong($i) - $cv.getLong($i);
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD || ($d == $bestD && $cid < $bestC)) { $bestD = $d; $bestC = $cid; }
         |}
         |${ev.value} = $bestC;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Element-wise sum of `array<long>` rows — the mergeable dense-vector
  * accumulator (Gram/covariance builds): each partition partial-combines
  * its rows into ONE array, so the shuffle carries one array per
  * partition instead of n·len (cell, value) rows. All input arrays must
  * share a length; state is the running array.
  */
case class VecSumLong(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_long requires array<bigint>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // an empty row would silently no-op through the (0 == 0) fresh-buffer
    // path while the contract promises ragged inputs fail loudly
    require(n > 0, "vec_sum_long: empty input array")
    val acc = if (buf.length == n) buf else {
      require(buf.isEmpty, s"vec_sum_long: ragged input (${buf.length} vs $n)")
      new Array[Long](n)
    }
    var i = 0
    while (i < n) {
      // explicit: UnsafeArrayData would silently read 0 for a null
      // element (corrupt sums); fail the way the ragged check does
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"vec_sum_long: null element at $i")
      acc(i) += arr.getLong(i); i += 1
    }
    acc
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length, "vec_sum_long: ragged partials")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): VecSumLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumLong =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "vec_sum_long"
}

/** Product-quantization encoder: `ve` (array<double>, length m·dsub)
  * → m tinyint codes, each the argmin-L2 codeword of its subvector
  * (ties to the SMALLEST code via strict `<`, the same tiebreak as the
  * HOF form it replaces), stored as `code − 128`. The codebook is a
  * flat `double[]` reference object (`cb[(s·ks + c)·dsub + j]`) with
  * +Infinity sentinels for dead codes, so generated code is ONE tight
  * m × ks × dsub loop — no per-row array slicing, no named_struct
  * accumulators, no interpreted HOF lambda calls. Encode is the
  * measured index-build cost center (PLANS.md r15: 845 s at ks=256 /
  * 2M rows through the HOF path), which is exactly the shape codegen
  * exists for.
  *
  * Distance math is bit-identical to the HOF path: per-subvector sums
  * accumulate in j-order over `(x_j − cw_j)²` doubles, and the strict
  * `<` comparison against the running best reproduces the aggregate's
  * first-wins tiebreak.
  */
case class PqEncode(child: Expression, m: Int, ks: Int, dsub: Int,
                    codebook: Array[Double]) extends UnaryExpression {
  require(codebook.length == m * ks * dsub,
    s"codebook length ${codebook.length} != m*ks*dsub = ${m * ks * dsub}")

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val ve = v.asInstanceOf[ArrayData]
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bi = 0
      var c = 0
      while (c < ks) {
        val base = (s * ks + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = ve.getDouble(s * dsub + j) - codebook(base + j)
          d += t * t
          j += 1
        }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      out(s) = (bi - 128).toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, ve => {
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val base = ctx.freshName("base")
      val best = ctx.freshName("best"); val bi = ctx.freshName("bi")
      val out = ctx.freshName("out")
      s"""
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bi = 0;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    int $base = ($s * $ks + $c) * $dsub;
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      double $t = $ve.getDouble($s * $dsub + $j) - $cbRef[$base + $j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bi = $c; }
         |  }
         |  $out[$s] = (byte) ($bi - 128);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column-level entry point: dot product in double precision. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Element-wise array<long> sum aggregate (see [[VecSumLong]]). */
  def vec_sum_long(v: Column): Column =
    ColumnShim.column(
      VecSumLong(ColumnShim.expression(v)).toAggregateExpression())

  /** Σx² — the squared L2 norm, via the same kernel. */
  def vec_sqnorm(v: Column): Column = vec_dot(v, v)

  /** PQ code array for `ve` under a flat codebook (see [[PqEncode]]). */
  def pq_encode(ve: Column, m: Int, ks: Int, dsub: Int,
                codebook: Array[Double]): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(ve), m, ks, dsub, codebook))

  /** Σx — element sum in double precision (see [[VecSum]]). */
  def vec_sum(v: Column): Column =
    ColumnShim.column(VecSum(ColumnShim.expression(v)))

  /** Jaccard over sorted-distinct string arrays (see [[SortedJaccard]]). */
  def sorted_jaccard(a: Column, b: Column): Column =
    ColumnShim.column(SortedJaccard(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** |A∩B| over sorted-distinct string arrays (see [[SortedOverlap]]). */
  def sorted_overlap(a: Column, b: Column): Column =
    ColumnShim.column(SortedOverlap(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Squared-L2 argmin centroid id (see [[NearestCentroid]]). */
  def nearest_centroid(q: Column, cents: Column): Column =
    ColumnShim.column(NearestCentroid(ColumnShim.expression(q), ColumnShim.expression(cents)))
}
