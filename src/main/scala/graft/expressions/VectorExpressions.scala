package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native codegen dot product over two `array<float>` columns.
  *
  * Semantics are bit-for-bit identical to the built-in composition
  *   aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0d, _+_)
  * (left-to-right double accumulation over index order), but run as a tight
  * generated-java loop instead of interpreted higher-order functions —
  * ~50× less per-pair overhead, which is the difference between an
  * all-pairs similarity stage finishing or not. Null array, null element,
  * or length mismatch → null (matching zip_with+aggregate null semantics).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // returns the generated java block
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** SparkSessionExtensions hook — the supported way to install graft's
  * native expressions cluster-wide:
  *   spark.sql.extensions=graft.expressions.GraftExtensions
  * (or `.withExtensions(new GraftExtensions)` on the builder). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_bounds"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "graft_cdc_bounds"),
      (children: Seq[Expression]) => CdcBoundaries(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowAnchors].getName, "graft_winnow"),
      (children: Seq[Expression]) => WinnowAnchors(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_gopher_cov"),
      new ExpressionInfo(classOf[GopherCoverage].getName, "graft_gopher_cov"),
      (children: Seq[Expression]) => GopherCoverage(children(0), children(1))))
  }
}

/** Runtime registration of graft's native expressions into a session's
  * function registry (same effect as [[GraftExtensions]] for an
  * already-built classic session; idempotent). */
object GraftFunctions {
  @volatile private var registered: Set[String] = Set.empty

  def ensureRegistered(spark: SparkSession): Unit = {
    val key = spark.sessionState.toString
    if (!registered.contains(key)) synchronized {
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_vec_dot"),
        new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
        (children: Seq[Expression]) => FloatVectorDot(children(0), children(1)))
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_jaro_winkler"),
        new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
        (children: Seq[Expression]) => JaroWinkler(children(0), children(1)))
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_cdc_bounds"),
        new ExpressionInfo(classOf[CdcBoundaries].getName, "graft_cdc_bounds"),
        (children: Seq[Expression]) => CdcBoundaries(children(0)))
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_winnow"),
        new ExpressionInfo(classOf[WinnowAnchors].getName, "graft_winnow"),
        (children: Seq[Expression]) => WinnowAnchors(children(0)))
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier("graft_gopher_cov"),
        new ExpressionInfo(classOf[GopherCoverage].getName, "graft_gopher_cov"),
        (children: Seq[Expression]) => GopherCoverage(children(0), children(1)))
      registered += key
    }
  }
}
