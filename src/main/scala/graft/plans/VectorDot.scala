package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vector_dot(array<float|double>, array<float|double>) -> double` —
  * the embedding dot product as a NATIVE Catalyst expression.
  *
  * The composed built-in form `aggregate(zip_with(a, b, (x, y) -> ...))`
  * is correct but runs as interpreted higher-order lambdas: per element
  * it allocates/boxes and makes several virtual calls, and it
  * materializes the zipped array. This expression is one tight
  * primitive loop over the two `ArrayData`s inside whole-stage codegen —
  * the preferred extension rung (built-ins > native Expression > UDF)
  * for the ANN scoring hot path, where a candidate pair costs exactly
  * one dot product.
  *
  * Semantics mirror the composed form exactly, so oracle results are
  * bit-identical: elements multiply in double precision and accumulate
  * left-to-right; a length mismatch or a null element yields NULL (the
  * zip_with pad / null-product behavior).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r = graft.plans.VectorDot.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {

  /** Shared by interpreted eval and generated code. Boxed return carries
    * the NULL cases (length mismatch / null element); one box per ROW is
    * noise next to the per-ELEMENT boxing of the lambda form. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Runtime registration (no session rebuild needed). Idempotent: query
    * builders call this once per plan, so an unguarded
    * `createOrReplaceTempFunction` emits a `SimpleFunctionRegistry ...
    * replaced` WARN per build — dozens per bench run, enough to crowd the
    * ~2 KB output window the harness parses the metric line from. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot")))
      registry.createOrReplaceTempFunction(
        "vector_dot",
        { exprs: Seq[Expression] => VectorDot(exprs(0), exprs(1)) },
        "built-in")
  }
}
