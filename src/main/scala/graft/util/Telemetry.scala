package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Per-query execution telemetry: the numbers an operator watches at
  * 100 TB — how much was scanned, how much crossed the shuffle, how
  * many rows came out — pulled from the executed plan's SQLMetrics
  * after an action. No listener wiring, no UI scraping: run, then read
  * the metrics off the final (AQE) plan.
  */
object Telemetry {

  final case class QueryMetrics(
      durationMs: Long,
      rowsOut: Long,
      shuffleBytesWritten: Long,
      shuffleRecordsWritten: Long,
      scanOutputRows: Long,
      filesRead: Long,
      spillBytes: Long = 0L) {
    /** The question that decides "will this survive a 100× scale-up":
      * how many bytes move per output row. */
    def shuffleBytesPerOutputRow: Double =
      if (rowsOut == 0) 0.0 else shuffleBytesWritten.toDouble / rowsOut
  }

  /** Unwrap AQE so metric collection sees the final physical plan. */
  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def sumMetric(plan: SparkPlan, names: Set[String],
      nodeFilter: String => Boolean): Long = {
    var total = 0L
    def walk(p: SparkPlan): Unit = {
      // ReusedExchange aliases the ORIGINAL exchange's SQLMetrics —
      // counting it double-counts shuffle bytes whenever AQE reuses an
      // exchange (self-joins, cube/pivot). It is a leaf (the reused
      // subtree is not among its children), so skipping collection
      // here drops nothing else.
      if (p.nodeName.startsWith("ReusedExchange")) return
      if (nodeFilter(p.nodeName))
        p.metrics.foreach { case (k, m) =>
          if (names.contains(k) && m.value > 0) total += m.value
        }
      p match {
        // AQE materializes stages behind QueryStageExec, whose
        // `children` is empty — the real subtree hangs off `.plan`
        case q: QueryStageExec => walk(q.plan)
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => p.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(finalPlan(plan))
    total
  }

  /** Execute `df` and read back the plan's metrics. The action runs on
    * df's OWN QueryExecution (`toRdd.count()` — no driver collect, no
    * separate count plan), so the metrics we read belong to the plan
    * that actually ran. */
  def measure(df: DataFrame): QueryMetrics = {
    val qe = df.queryExecution
    val t0 = System.nanoTime()
    val rows = qe.toRdd.count()
    val durMs = (System.nanoTime() - t0) / 1000000
    val plan = qe.executedPlan
    QueryMetrics(
      durationMs = durMs,
      rowsOut = rows,
      shuffleBytesWritten = sumMetric(plan, Set("shuffleBytesWritten"),
        _.contains("Exchange")),
      shuffleRecordsWritten = sumMetric(plan,
        Set("shuffleRecordsWritten"), _.contains("Exchange")),
      scanOutputRows = sumMetric(plan, Set("numOutputRows"),
        _.startsWith("Scan")),
      filesRead = sumMetric(plan, Set("numFiles"),
        _.startsWith("Scan")),
      // sort/aggregate/shuffle-read spill ("spill size" SQLMetrics) —
      // nonzero means the partition sizing no longer fits executor
      // memory, the first thing that goes wrong on a scale-up
      spillBytes = sumMetric(plan, Set("spillSize"), _ => true))
  }
}
