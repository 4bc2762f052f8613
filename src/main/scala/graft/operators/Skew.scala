package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-mitigation operators for the cases AQE can't fix.
  *
  * AQE's skew-join handling splits oversized shuffle partitions at
  * runtime, and broadcast joins sidestep skew entirely — both preferred
  * when applicable. What remains is aggregation skew (one hot group
  * key) and skewed shuffle joins where neither side broadcasts: the
  * classic fix is salting, done here as library transforms.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Deterministic per-row salt: a content hash of every column, mod
    * `salts`. NEVER derived from monotonically_increasing_id/rand: a
    * recomputed shuffle map task (fetch-failure retry) must re-salt
    * each row to the SAME value, or reducers that already consumed the
    * old output see rows duplicated/dropped — the classic
    * nondeterministic-repartition hazard at cluster scale.
    *
    * Known tradeoff: byte-identical duplicate rows share a salt. For
    * aggregation this is harmless (map-side combine collapses them);
    * for [[saltedJoin]] a hot key made of mostly IDENTICAL rows will
    * still land on one reducer — for that shape, collapse duplicates
    * to (row, count) first (one exact-dedup aggregation), join, and
    * re-weight; a random salt would spread them but reintroduces the
    * retry-correctness hazard above, which is worse (silent wrong
    * results vs a slow task). */
  private[operators] def contentSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))

  /** Two-phase salted aggregation: partial sums over (keys, salt) —
    * spreading a hot key over `salts` reducers — then a final cheap
    * re-aggregation over the (keys) partials. Identical result to a
    * direct groupBy+sum; the first shuffle's max partition size drops
    * by ~`salts`× for the hottest key. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val keyed = df.withColumn(SaltCol, contentSalt(df, salts))
    val partial = keyed
      .groupBy((keyCols :+ SaltCol).map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join: each row of the skewed side gets one
    * deterministic salt; the other side is replicated across all
    * `salts` values; the join key becomes (key, salt). Row-identical
    * to the plain inner join, but the hot key's rows spread over
    * `salts` shuffle partitions instead of one straggler.
    *
    * The replicated side grows `salts`× — use this when it is the
    * smaller (but not broadcastable) side. When the replicated side is
    * itself large, use [[Joins.saltedJoin]]: it detects the hot keys
    * first and replicates only THEIR dim rows. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedL = skewed.withColumn(SaltCol, contentSalt(skewed, salts))
    val replicated = other.withColumn(SaltCol,
      explode(typedLit((0L until salts.toLong).toArray)))
    saltedL.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Top-n heaviest values of a key column with their share of rows —
    * the diagnostic you run before deciding broadcast vs salt vs AQE. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n").cast("double") / total)
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
