package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named slate queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  * Sessions carry the same extensions/config as Verify and Bench so
  * the dumped plan is the one those paths execute.
  *
  *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...>"
  *
  * writes <outDir>/<query><suffix>.txt for each query name (suffix
  * e.g. `_before` / `_after`). SPARK_GRAFT_SF_DIR picks the data dir.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, qcsv) = args
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional session confs ("k=v;k=v") — used to dump the size-gated
    // plan variants (e.g. the incremental-dedup bucket prune, which
    // engages from measured index stats at scale) at local SF
    sys.env.get("SPARK_GRAFT_PLAN_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    Files.createDirectories(Paths.get(outDir))
    val slate = graft.SparkEntry.queries
    names.foreach { name =>
      val plan =
        try slate(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      Files.write(Paths.get(outDir, s"$name$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/$name$suffix.txt (${plan.length} chars)")
      graft.dedup.Dedup.releaseCaches()
    }
    spark.stop()
  }
}
