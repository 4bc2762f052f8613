package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Scratch diagnostic: per-node spill/sort metrics for the bigram op. */
object SpillDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextAnalysis
    val docs = spark.read.parquet("target/scale-stress/docs_x100")
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(t)-2), " +
        "i -> concat(element_at(t, i+1), ' ', element_at(t, i+2)))"))
        .as("bigram"))
    val counts = bi.groupBy(col("bigram")).agg(count(lit(1)).as("c"))
    val joined =
      if (args.contains("shj")) bi.join(counts.hint("shuffle_hash"), Seq("bigram"))
      else bi.join(counts, Seq("bigram"))
    val res = joined
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("c")).cast("double") / count(lit(1)).cast("double"))
          .as("commonness"))
    if (args.contains("card"))
      println("distinct_bigrams=" + counts.count())
    val qe = res.queryExecution
    val t0 = System.nanoTime()
    println("rows=" + qe.toRdd.count())
    println(f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val spills = p.metrics.filter { case (k, m) =>
        (k.toLowerCase.contains("spill") || k == "peakMemory") && m.value > 0 }
      if (spills.nonEmpty)
        println("  " * depth + p.nodeName + " -> " + spills.map {
          case (k, m) => s"$k=${m.value / 1048576}MB" }.mkString(", "))
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(qe.executedPlan, 0)
    spark.stop()
  }
}
