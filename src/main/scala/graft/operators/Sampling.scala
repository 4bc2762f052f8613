package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data curation.
  *
  * Random sampling (`df.sample`) is seed × partitioning dependent — a
  * repartition or a retry changes the sample, which is unacceptable for
  * reproducible train/eval splits. These operators derive membership
  * from a content hash of a stable id, so the assignment is a pure
  * function of the data: same row → same bucket on any cluster, any
  * partitioning, any engine. The hash is the base-31 polynomial mod
  * 1e9+7 (cross-engine reproducible in plain SQL — no engine-specific
  * hash builtin), evaluated per row in a narrow map.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the string form of `id` —
    * polynomial char hash, portable integer arithmetic. */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0)
    val h = aggregate(split(id.cast("string"), ""), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)
    pmod(h, lit(buckets.toLong))
  }

  /** Keep ~pct% of rows, deterministically (bucket < pct of 100). */
  def deterministicSample(df: DataFrame, idCol: String,
      pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(hashBucket(col(idCol), 100) < pct)
  }

  /** Add a `split` column: "train" for ~trainPct% of rows, "eval"
    * otherwise. Stable across reruns, repartitions, and engines —
    * a row never migrates between splits. */
  def splitByHash(df: DataFrame, idCol: String,
      trainPct: Int = 90): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100)
    df.withColumn("split",
      when(hashBucket(col(idCol), 100) < trainPct, lit("train"))
        .otherwise(lit("eval")))
  }
}
