package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape fingerprint: counts of the operators that determine
  * scale behavior (shuffle exchanges, join strategies, cartesian products).
  *
  * Counted from `explainString(SimpleMode)` text rather than a SparkPlan
  * traversal: with AQE enabled the pre-execution plan root is an
  * `AdaptiveSparkPlanExec` whose inner plan is not public API, while the
  * explain text prints the full initial plan deterministically on every
  * Spark version. The counts describe the STATIC planner output (AQE may
  * still improve a shape at runtime — e.g. SMJ → broadcast — but can only
  * start from what is counted here, so a regression in the static shape is
  * a regression in the best case too).
  *
  * Used by PlanShapeSpec to pin the audited shape of the most expensive
  * queries: the timing bench would eventually catch a plan regressing to
  * an extra shuffle, but only as an unattributed slowdown — this turns it
  * into a named spec failure at the query that changed.
  */
object PlanAudit {
  /** Operator-class keys, in the order they are reported. */
  val Keys: Seq[String] = Seq(
    "shuffle_exchange", "broadcast_exchange", "reused_exchange",
    "broadcast_hash_join", "sort_merge_join", "shuffled_hash_join",
    "broadcast_nested_loop_join", "cartesian_product")

  private val patterns: Seq[(String, java.util.regex.Pattern)] = Seq(
    // "Exchange hashpartitioning(...)", "Exchange rangepartitioning(...)",
    // "Exchange SinglePartition" — but not "BroadcastExchange"/"Reused"
    "shuffle_exchange" -> "(?m)^[^A-Za-z]*Exchange ",
    "broadcast_exchange" -> "(?m)^[^A-Za-z]*BroadcastExchange",
    "reused_exchange" -> "(?m)^[^A-Za-z]*ReusedExchange",
    "broadcast_hash_join" -> "(?m)^[^A-Za-z]*BroadcastHashJoin",
    "sort_merge_join" -> "(?m)^[^A-Za-z]*SortMergeJoin",
    "shuffled_hash_join" -> "(?m)^[^A-Za-z]*ShuffledHashJoin",
    "broadcast_nested_loop_join" -> "(?m)^[^A-Za-z]*BroadcastNestedLoopJoin",
    "cartesian_product" -> "(?m)^[^A-Za-z]*CartesianProduct"
  ).map { case (k, re) => k -> java.util.regex.Pattern.compile(re) }

  /** Shape of a DataFrame's pre-execution physical plan (zero counts
    * included, so a spec diff names every class that moved). */
  def shape(df: DataFrame): Map[String, Int] = {
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    patterns.map { case (k, p) =>
      val m = p.matcher(txt)
      var n = 0
      while (m.find()) n += 1
      k -> n
    }.toMap
  }

  /** One-line rendering for probe output / spec failure messages. */
  def render(s: Map[String, Int]): String =
    Keys.map(k => s"$k=${s.getOrElse(k, 0)}").mkString(", ")
}
