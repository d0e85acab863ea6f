package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler kernel, shared verbatim by the interpreted `eval`
  * path and the generated code (the codegen emits a call to this static
  * method — one branch-free call site, no boxing, stays inside the
  * whole-stage span).
  *
  * Semantics follow the classic C formulation that DuckDB/RapidFuzz
  * implement, pinned empirically against `jaro_winkler_similarity`:
  *   - match window  max(|a|,|b|)/2 − 1  (floor, ≥ 0)
  *   - transpositions = (mismatched matched-position count) / 2, in
  *     INTEGER division (a 3-cycle counts 1, not 1.5)
  *   - either string empty → 0.0 (also for both empty — not 1.0)
  *   - Winkler boost  j + p·0.1·(1−j)  only when j > 0.7, prefix p
  *     capped at 4; double ops associate left-to-right exactly as
  *     written, which is what makes the doubles bit-identical to the
  *     oracle engine
  * Operates on UTF-8 bytes (ASCII-exact; multi-byte code points compare
  * as byte runs, which preserves equality but weighs them by byte
  * length).
  */
object JaroWinklerAlgo {
  def compute(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes
    val b = s2.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var j2 = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j2)) j2 += 1
        if (a(i) != b(j2)) k += 1
        j2 += 1
      }
      i += 1
    }
    val t = k / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    val maxP = math.min(math.min(l1, l2), 4)
    var p = 0
    while (p < maxP && a(p) == b(p)) p += 1
    jaro + p * 0.1 * (1 - jaro)
  }
}

/** Native codegen Jaro–Winkler similarity over two string columns —
  * the record-linkage scorer (blocked fuzzy matching, survivorship)
  * as a single generated call instead of a UDF: null-safe, no boxing,
  * no Python/serialization boundary, bit-compatible with DuckDB's
  * `jaro_winkler_similarity` (see [[JaroWinklerAlgo]] for the pinned
  * semantics). Null on either side → null.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.JaroWinklerAlgo.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
