package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Quantized dot product of two `array<float>` columns as a single
  * codegen'd expression: Σ q(a_i)·q(b_i) where
  * q(v) = round_half_away(double(v) × 1e6) as long — the same
  * quantization [[graft.llm.Similarity]] uses, so scores stay
  * bit-identical to the SQL-expressible formulation.
  *
  * Why a custom Expression (SURVEY §7.3 / builder guidance order (b)):
  * the composable alternative explodes both vectors to (id, pos, val)
  * rows, equi-joins on pos and re-aggregates — two shuffles and a 64×
  * row blow-up per pair. This evaluates per-row inside whole-stage
  * codegen: the ANN pair scoring becomes a scan-shaped map. At 100 TB
  * the explode/join form shuffles O(pairs × dims) rows; this shuffles
  * nothing beyond the candidate join itself.
  */
case class QuantDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_quant_dot expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += QuantDot.quantize(a.getFloat(i)) *
        QuantDot.quantize(b.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val q = classOf[QuantDot].getName
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $q.quantize($a.getFloat($i))
         |    * $q.quantize($b.getFloat($i));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantDot =
    copy(left = newLeft, right = newRight)
}

object QuantDot {
  /** round-half-away-from-zero of v×1e6 — matches SQL ROUND in Spark
    * (BigDecimal HALF_UP) and DuckDB (std::round) on all non-adversarial
    * inputs; called from generated code, keep it JIT-friendly. */
  def quantize(v: Float): Long = {
    val d = v.toDouble * 1000000.0
    val r = Math.floor(Math.abs(d) + 0.5)
    (if (d < 0) -r else r).toLong
  }

  private val fnName = "graft_quant_dot"

  /** Registers the SQL-callable form once per session; returns the name. */
  def register(spark: SparkSession): String = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => QuantDot(exprs(0), exprs(1)), "built-in")
    fnName
  }
}
