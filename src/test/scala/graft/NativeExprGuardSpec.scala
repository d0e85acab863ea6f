package graft

import graft.expressions.{CellArgmin, MicroArgmin, PqEncode, Sq8Codes}

/** Codegen-cliff guard (r14 verdict #5): the JIT size cliff bit three
  * times in round 14 — a model/dim-wide expression unroll (K-struct
  * array_min cell fold, fused PQ encode, dim-64 sq8 unroll) sharing a
  * whole-stage-codegen stage with a join blows the JVM's JIT method
  * ceiling and the stage silently runs interpreted bytecode at 2–4× the
  * wall. The fix was four native expressions whose generated code is a
  * loop regardless of K/dim. A regression back to the unrolled/HOF forms
  * would pass every correctness gate and only show up as a slow bench
  * row — so this spec pins the natives INTO the optimized plans of all
  * ten consumer queries. If a refactor drops one (e.g. a codebook stops
  * folding to a LocalRelation, so pqCodes falls to its relational
  * branch), this goes red instead of the bench going quiet. */
class NativeExprGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Native-expression tags present anywhere in the query's optimized
    * plan (cached subplans included — InMemoryRelation hides its child
    * from `expressions`, so descend into cached plans explicitly). */
  private def natives(name: String): Set[String] = {
    val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
    var found = Set.empty[String]
    def tag(e: org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      e.foreach {
        case _: CellArgmin  => found += "cell"
        case _: MicroArgmin => found += "micro"
        case _: PqEncode    => found += "pq"
        case _: Sq8Codes    => found += "sq8"
        case _ =>
      }
    def scanPhysical(p: org.apache.spark.sql.execution.SparkPlan): Unit =
      p.foreach {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scanPhysical(s.relation.cachedPlan)
        case node => node.expressions.foreach(tag)
      }
    def scan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
      p.foreach {
        // InMemoryRelation hides its child from `expressions` — descend
        // into the cached PHYSICAL plan (which may itself scan another
        // cache) so natives living only inside a cached subtree count
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          scanPhysical(r.cachedPlan)
        case node => node.expressions.foreach(tag)
      }
    scan(plan)
    found
  }

  // ground truth probed on the r15 tree (tools-side sweep over all 215
  // catalog queries): exactly these ten carry a native vector expression
  private val expected = Map(
    "x46_quantized_ann"         -> Set("sq8"),
    "x52_ann_rerank"            -> Set("sq8"),
    "x121_pq_adc_ann"           -> Set("pq"),
    "x122_ivf_pq_ann"           -> Set("cell", "pq"),
    "x123_ivf_pq_residual_ann"  -> Set("cell", "pq"),
    "x129_kmeans_train"         -> Set("micro"),
    "x134_kmeans_ivf"           -> Set("cell"),
    "x152_multiprobe_recall"    -> Set("pq"),
    "x153_opq_perm_recall"      -> Set("pq"),
    "x177_bitext_margin_ivf"    -> Set("cell"))

  expected.foreach { case (q, want) =>
    test(s"$q keeps its native expressions (${want.mkString(",")}) in the plan") {
      val got = natives(q)
      assert(want.subsetOf(got),
        s"$q lost native expression(s) ${(want -- got).mkString(",")} — " +
          "the consumer fell back to an unrolled/HOF form that runs " +
          s"interpreted past the JIT ceiling (r14 cliff); plan has: $got")
    }
  }
}
