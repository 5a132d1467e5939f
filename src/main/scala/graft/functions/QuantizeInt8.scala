package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an `array<double>` in ONE fused pass:
  * `struct(scale = max|x|/127, codes[i] = round(x_i/scale))` (round half
  * away from zero, the SQL ROUND the s06 oracle pins; zero scale → all-
  * zero codes; null elements are skipped for the scale and stay null in
  * the codes, except the zero-scale branch which mirrors the old
  * `transform(v, _ => 0)`).
  *
  * Replaces the composable HOF form (`aggregate` for the scale + two
  * `transform` branches): HOF lambdas don't CSE, so Catalyst re-inlined
  * the bound child (itself an l2-normalize HOF chain) into every
  * reference — and when the projection collapsed into the probe join of
  * [[graft.llm.Similarity.ivfTopKQuantized]], the whole chain re-ran PER
  * CANDIDATE PAIR instead of per corpus row (s07 at sf1: ~53 s vs
  * s05's 1.6 s for the same join shape). One native expression evaluates
  * its child exactly once per call and keeps the loop in codegen — the
  * [[DotInt8]]/[[CosineSimilarity]] rationale. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 expects array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = true),
      nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = math.abs(arr.getDouble(i))
        if (a > mx) mx = a
      }
      i += 1
    }
    val scale = mx / 127.0
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      if (scale == 0.0) codes(i) = 0
      else if (arr.isNullAt(i)) codes(i) = null
      else {
        val r = arr.getDouble(i) / scale
        codes(i) =
          (if (r >= 0) math.floor(r + 0.5d) else math.ceil(r - 0.5d)).toInt
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(codes)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val mx = ctx.freshName("mx"); val sc = ctx.freshName("sc")
      val a = ctx.freshName("a"); val r = ctx.freshName("r")
      val codes = ctx.freshName("codes")
      val gad = classOf[GenericArrayData].getName
      val gir = classOf[GenericInternalRow].getName
      s"""
         |int $n = $x.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    double $a = java.lang.Math.abs($x.getDouble($i));
         |    if ($a > $mx) $mx = $a;
         |  }
         |}
         |double $sc = $mx / 127.0;
         |Object[] $codes = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($sc == 0.0) {
         |    $codes[$i] = 0;
         |  } else if ($x.isNullAt($i)) {
         |    $codes[$i] = null;
         |  } else {
         |    double $r = $x.getDouble($i) / $sc;
         |    $codes[$i] = (int) ($r >= 0
         |      ? java.lang.Math.floor($r + 0.5d)
         |      : java.lang.Math.ceil($r - 0.5d));
         |  }
         |}
         |${ev.value} = new $gir(new Object[] {
         |  (Object) $sc, new $gad($codes) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  def apply(v: Column): Column =
    GraftColumnBridge.column(QuantizeInt8(
      GraftColumnBridge.expression(v.cast("array<double>"))))
}
