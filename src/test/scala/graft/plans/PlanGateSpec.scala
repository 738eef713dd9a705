package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, LocalTableScanExec, RangeExec}

import scala.collection.mutable

/** Suite-wide physical-plan gate — PlanAudit promoted from artifact to test
  * (VERDICT r4 item 7). Every SparkEntry query must plan without the three
  * classic scale-killers:
  *
  *  1. `CartesianProductExec` — never acceptable.
  *  2. `BroadcastNestedLoopJoinExec` — only when the broadcast side is
  *     provably singleton-ish (a global aggregate, a limit, a local/range
  *     relation): the deliberate "crossJoin(broadcast(one-row stats))"
  *     pattern. Anything else is an accidental O(n·m) join.
  *  3. un-partitioned `WindowExec` over an input that is not provably
  *     bounded (no aggregate/limit/local scan anywhere below it): the
  *     single-task global sort bottleneck. The two-phase Rank operator
  *     exists precisely so no corpus-sized input ever needs one.
  *
  * Boundedness here is a structural heuristic (an aggregate below the
  * window bounds its cardinality by the group count; limits and local
  * relations are bounded by construction). It catches the mistake that
  * matters — a global window straight over a scan or join — which is how
  * every real regression of this class would first appear. */
class PlanGateSpec extends SparkSpec {

  // ReusedExchangeExec is a LEAF that stands in for an exchange planned
  // elsewhere — both heuristics must look through it to the original
  // subtree, or the second consumer of a shared broadcast gets flagged
  private def isBoundedSource(p: SparkPlan): Boolean = p.exists {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec | _: LocalLimitExec => true
    // orderBy+limit(k) plans as TakeOrderedAndProject — bounded by k
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: LocalTableScanExec => true
    case _: RangeExec => true
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      isBoundedSource(r.child)
    case _ => false
  }

  private def isSingletonish(p: SparkPlan): Boolean = p.exists {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case l: LocalTableScanExec => l.rows.lengthCompare(1) <= 0
    case _: GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case _: RangeExec => true
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      isSingletonish(r.child)
    case _ => false
  }

  /** Queries whose broadcast-side cross join is bounded BY CONTRACT rather
    * than by plan structure — each entry must say why the broadcast side
    * cannot grow with the corpus. Adding a query here is a design decision,
    * not a fix. */
  private val boundedBroadcastByContract: Map[String, String] = Map(
    "ss1_bruteforce_topk" -> "query set is broadcast-sized by contract (ANN probe side)",
    "ss4_pq_topk" -> "query set (with its nSub×ks distance tables) is broadcast-sized by contract",
    "ss5_recall_audit" -> "same query-side contract as ss1/ss4, joined for recall",
    "ss6_sq8_topk" -> "query set (as d-byte code arrays) is broadcast-sized by contract — the ss1 probe-side shape",
    "ir3_hybrid_dense" -> "dense arm's broadcast side is ONE query vector by key contract (vec_id = 0) — the ss1 probe-side shape",
    "j8_conjunctive_keywords" -> "broadcast side is the fixed keyword list (17 SDGs × ≤55 keywords shape)")

  test("every query plans free of cartesians, wide BNL joins, and corpus-global windows") {
    val dir = "/root/testdata/sf0.001"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prior = spark.conf.getOption(aqeKey)
    // AQE wraps plans in AdaptiveSparkPlanExec before execution; disabling it
    // for the audit makes join/window nodes directly visible pre-execution
    spark.conf.set(aqeKey, "false")
    try {
      val failures = mutable.ArrayBuffer.empty[String]
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan =
          try fn(spark, dir).queryExecution.executedPlan
          catch { case e: Exception =>
            failures += s"$name: failed to plan: ${e.getMessage}"; null
          }
        if (plan != null) plan.foreach {
          case _: CartesianProductExec =>
            failures += s"$name: CartesianProduct in physical plan"
          case j: BroadcastNestedLoopJoinExec =>
            val bcastSide = j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
            if (!isSingletonish(bcastSide) && !boundedBroadcastByContract.contains(name))
              failures += s"$name: BroadcastNestedLoopJoin with non-singleton broadcast side"
          case w: WindowExec if w.partitionSpec.isEmpty =>
            if (!isBoundedSource(w.child))
              failures += s"$name: un-partitioned WindowExec over non-bounded input"
          case _ =>
        }
      }
      assert(failures.isEmpty, s"\nplan gate failures:\n${failures.mkString("\n")}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
    }
  }
}
