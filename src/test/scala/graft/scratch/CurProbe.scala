package graft.scratch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.util.Checkpointing
object CurProbe {
  implicit class Piper[A](a: A) { def pipe[B](f: A => B): B = f(a) }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm
    spark.read.parquet(s"$d/documents.parquet").count()
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val docs = graft.util.Tables.documents(spark, d)
      val bench = docs.filter(col("doc_id") < 5)
      val clean = t("clean") { Checkpointing.materialize(
        docs.filter(col("doc_id") >= 5)
          .withColumn("text", TextAnalysis.redactPii(col("text")))
          .filter(TextAnalysis.qualityScore(col("text")) >= 0.3)).tap(_.count _) }
      t("clean_count")(clean.count())
      val exact = t("exact") { Checkpointing.materialize(
        Dedup.exactDedup(clean.withColumn("fp", TextAnalysis.contentFingerprint(col("text"))), "doc_id", Seq("fp"))
          .select("doc_id").join(clean, Seq("doc_id"))) }
      t("exact_count")(exact.count())
      val near = t("near") { Checkpointing.materialize(
        Dedup.dedupMinHash(exact, "doc_id", "text", threshold = 0.5)) }
      t("near_count")(near.count())
      val decon = t("decon") { Dedup.decontaminate(near, bench, "doc_id", "text") }
      t("final") { graft.operators.Sampling.splitByHash(decon, "doc_id", 90)
        .select(col("doc_id"), col("lang"), col("split")).count() }
      Dedup.releaseCaches()
    }
    spark.stop()
  }
  implicit class Tapper[A](a: A) { def tap(f: A => Any): A = { a } }
}
