package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Symmetric int8 code arithmetic for the quantized IVF cells
  * ([[graft.sources.IvfIndex]]): codes are stored as a BINARY column —
  * ONE byte per dimension, the honest 4× storage/IO reduction over
  * float32 (an `array<tinyint>` would round-trip through parquet INT32
  * pages). The quantization spelling matches `llm_quantize`'s declared
  * transform: per-vector `scale = max|x|/127`,
  * `code_i = round(x_i/scale)` with round-half-away-from-zero (both
  * engines' `round()`), clamped to [-127, 127].
  */

/** `(embedding array<float>, scale double) → binary` — the encoder.
  * Zero scale (an all-zero vector) encodes to all-zero bytes; a null
  * element poisons the row to null, like the FloatVec* family.
  */
case class FloatVecInt8Encode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(FloatType, containsNull = true) ||
        left.dataType == ArrayType(FloatType, containsNull = false)) {
      if (right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a double scale, got ${right.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> codes input, got ${left.dataType.simpleString}")

  override def nullSafeEval(a: Any, s: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      if (scale != 0.0) {
        val v = x.getFloat(i).toDouble / scale
        // round half away from zero — Spark's/DuckDB's round(), NOT
        // Math.round's half-toward-positive-infinity
        val r = if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)
        out(i) = math.max(-127.0, math.min(127.0, r)).toByte
      }
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val v = ctx.freshName("v")
      val r = ctx.freshName("r")
      s"""
         |final int $n = $a.numElements();
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  if ($s != 0.0) {
         |    final double $v = ((double) $a.getFloat($i)) / $s;
         |    final double $r = ($v >= 0) ? java.lang.Math.floor($v + 0.5)
         |                                : java.lang.Math.ceil($v - 0.5);
         |    $out[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(127.0, $r));
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `(q array<float>, codes binary) → double` — cosine of a float query
  * against an int8-coded vector. The per-vector scale CANCELS in cosine
  * (cos(q, s·c) = cos(q, c)), so ranking needs only the codes — the
  * scoring scan never touches the float or scale columns at all. Null
  * query element → null; zero-norm either side → NaN-free null is NOT
  * special-cased (matches [[FloatVecCosine]]'s arithmetic exactly).
  */
case class FloatVecInt8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_int8_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(left.dataType == ArrayType(FloatType, containsNull = true) ||
          left.dataType == ArrayType(FloatType, containsNull = false)))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float> query, got ${left.dataType.simpleString}")
    else if (right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary codes, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[Array[Byte]]
    val n = x.numElements()
    if (n != c.length) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble; val yv = c(i).toDouble
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
         |if ($n != $b.length) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = (double) $a.getFloat($i);
         |    final double $yv = (double) $b[$i];
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
