package graft.functions.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Input typing shared by the vector expressions: every child must be
  * `array<float>`. (`ExpectsInputTypes` would say this declaratively, but
  * its `AbstractDataType` vocabulary is `private[sql]` — a manual
  * `checkInputDataTypes` is the public-API spelling.)
  */
trait FloatArrayInputs { self: Expression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = self.children.zipWithIndex.collect {
      case (c, i) if !c.dataType.isInstanceOf[ArrayType] ||
        c.dataType.asInstanceOf[ArrayType].elementType != FloatType => (c.dataType, i)
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects array<float> inputs, got " +
        bad.map { case (t, i) => s"arg $i: ${t.simpleString}" }.mkString(", "))
  }
}

/** Native Catalyst expressions for the embedding hot path (SURVEY §2.11's
  * stretch goal). Spark's higher-order functions (`aggregate`, `zip_with`,
  * `transform`) evaluate their lambda interpreted, per element, OUTSIDE
  * whole-stage codegen — measured at sf0.1 that makes the HOF dot product
  * the dominant cost of every similarity query. These expressions compile
  * to a tight primitive `for` loop over `ArrayData.getFloat` inside the
  * generated code: no lambda dispatch, no boxing, no codegen fence.
  *
  * Numeric contract (FIXTURES.md determinism rules): floats are widened to
  * double BEFORE any arithmetic and each accumulator sums in index order —
  * bit-identical to the HOF formulation and to the DuckDB oracles'
  * `list_sum(list_transform(...))`, so 6dp-rounded scores are unchanged.
  *
  * Null contract (matches the HOF spellings exactly): null array → null;
  * length mismatch → null (`zip_with` pads with null, poisoning the sum);
  * any null element → null.
  */
object VecExprs {

  /** (identifier, info, builder) triples for SparkSessionExtensions
    * .injectFunction — also usable directly via [[graft.GraftExtensions]].
    */
  /** SQL-path arity guard: without it `graft_dot(a)` dies with an opaque
    * IndexOutOfBoundsException and `graft_cosine(a,b,c)` silently drops
    * the extra argument. AnalysisException is what Spark's own builtins
    * raise for wrong arity, so callers see a uniform analysis-time error.
    * Shared by every graft_* registration (EwmaWin uses it too) so the
    * SQL error surface stays uniform.
    */
  private[expressions] def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"))
      build(es)
    }

  def registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      arity("graft_dot", 2)(es => FloatVecDot(es(0), es(1)))),
    (FunctionIdentifier("graft_normsq"),
      new ExpressionInfo(classOf[FloatVecNormSq].getName, "graft_normsq"),
      arity("graft_normsq", 1)(es => FloatVecNormSq(es(0)))),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "graft_cosine"),
      arity("graft_cosine", 2)(es => FloatVecCosine(es(0), es(1)))))
}

/** Σᵢ aᵢ·bᵢ over two float arrays, accumulated in double, index order. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs {

  override def dataType: DataType = DoubleType
  // nullable beyond child nullability: length mismatch / null element
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ aᵢ² in double — ‖a‖² in one traversal (vs transform+aggregate). */
case class FloatVecNormSq(child: Expression)
    extends UnaryExpression with FloatArrayInputs {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_normsq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble; acc += v * v; i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket over a float vector: bit h of the result
  * is `sign(Σᵢ s(h,i)·vᵢ)` with the ±1 sign table derived from splitmix64
  * and baked into the generated class as a byte array reference — one
  * tight loop replaces the `numPlanes × dim`-term unrolled expression
  * tree the Column-API spelling builds (512 nodes at 8×64: measured
  * multi-second codegen + eval cost on the ANN path).
  *
  * Exact-equivalence contract with [[graft.functions.VectorOps.lshBucket]]:
  * same sign function `splitmix64(h·4096 + i) & 1` (i is 1-based), same
  * per-plane left-to-right accumulation, elements beyond `dim` ignored,
  * and a vector shorter than `dim` — or any null element in the first
  * `dim` slots — zeroes every plane (the unrolled spelling's null
  * `element_at`/sum fails each `when(proj > 0)` test).
  */
case class FloatVecLsh(child: Expression, numPlanes: Int, dim: Int)
    extends UnaryExpression with FloatArrayInputs {
  require(numPlanes > 0 && numPlanes <= 64, "numPlanes must be in 1..64")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_lsh"

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** signs(h * dim + (i-1)) ∈ {−1, +1} for plane h, 1-based element i. */
  @transient private lazy val signs: Array[Byte] =
    Array.tabulate(numPlanes * dim) { idx =>
      val h = idx / dim; val i = idx % dim + 1
      if ((splitmix64(h.toLong * 4096 + i) & 1L) == 0L) (-1).toByte else 1.toByte
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < dim) return 0L
    var i = 0
    while (i < dim) { if (x.isNullAt(i)) return 0L; i += 1 }
    var bucket = 0L; var h = 0
    while (h < numPlanes) {
      var acc = 0.0; var j = 0
      while (j < dim) { acc += signs(h * dim + j) * x.getFloat(j).toDouble; j += 1 }
      if (acc > 0) bucket |= 1L << h
      h += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tbl = ctx.addReferenceObj("lshSigns", signs, "byte[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val bucket = ctx.freshName("bucket")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |final int $n = $a.numElements();
         |boolean $hasNull = ($n < $dim);
         |if (!$hasNull) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) { $hasNull = true; break; }
         |  }
         |}
         |long $bucket = 0L;
         |if (!$hasNull) {
         |  for (int $h = 0; $h < $numPlanes; $h++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $tbl[$h * $dim + $j] * (double) $a.getFloat($j);
         |    }
         |    if ($acc > 0) { $bucket |= 1L << $h; }
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused cosine similarity: dot, ‖a‖², ‖b‖² accumulated in ONE pass, then
  * `dot / (sqrt(na)·sqrt(nb))` — the exact operation order every oracle
  * mirrors (each accumulator is its own index-order sum, so fusing the
  * loops changes nothing numerically). One traversal replaces the five
  * (zip_with+aggregate, 2×transform+aggregate) of the HOF spelling.
  * Zero vectors yield NaN (0/0) exactly like the unfused spelling.
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayInputs {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = (double) $a.getFloat($i);
         |    final double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
