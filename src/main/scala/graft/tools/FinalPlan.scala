package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a slate query's FINAL adaptive plan — the post-execution
  * AQE plan (isFinalPlan=true), which is where runtime effects like
  * exchange/stage reuse, AQEShuffleRead coalescing, and join-strategy
  * rewrites become visible (PlanDump prints the INITIAL plan). Run:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.FinalPlan <query>"
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: FinalPlan <query> [outFile]")
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries.toMap.apply(name)(spark, sfDir)
    // capture the QueryExecution the action actually runs (df.count()
    // builds a DIFFERENT QueryExecution; reading df.queryExecution
    // afterwards shows an unexecuted plan, isFinalPlan=false)
    @volatile var captured: org.apache.spark.sql.execution.QueryExecution =
      null
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = captured = qe
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    df.write.format("noop").mode("overwrite").save()
    // listener delivery is async; poll briefly for the capture
    var waited = 0
    while (captured == null && waited < 5000) {
      Thread.sleep(100); waited += 100
    }
    spark.listenerManager.unregister(listener)
    val plan = (if (captured != null) captured.executedPlan
      else df.queryExecution.executedPlan).toString
    args.lift(1) match {
      case Some(out) => java.nio.file.Files.write(
        java.nio.file.Paths.get(out), plan.getBytes("UTF-8"))
      case None => println(plan)
    }
    graft.dedup.Dedup.releaseCaches()
    spark.stop()
  }
}
