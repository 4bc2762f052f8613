package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Join-side reduction operators for 100 TB fact-to-dimension joins.
  *
  * The reference's serving joins (dbt_modeling/models/serving_layer sql models
  * — fact_session joined to dim_songs/dim_artists/dim_users) are
  * fact × filtered-dimension shapes. At scale the dominant cost is
  * shuffling the FACT side; when the dimension is selective, most fact
  * rows shuffle only to be dropped by the join. Bloom pruning removes
  * them before the exchange.
  */
object Joins {

  /** Filter `large` down to rows whose `largeKey` PROBABLY appears in
    * `small`'s `smallKey` — a Bloom-filter semi-join reduction. The
    * result is a superset of the true semi-join (false-positive rate
    * `fpp`), so composing with the real join afterwards is exact; what
    * the filter buys is that the dropped fraction never reaches the
    * join's shuffle.
    *
    * Mechanics: both sides hash the key to int64 with codegen'd
    * xxhash64 (type-uniform probes); the small side aggregates into a
    * Bloom filter merged on the driver (size is bounded by
    * `expectedItems`/`fpp` — 1M items at 1% ≈ 1.2 MB, independent of
    * the large side), which ships to executors as a literal inside the
    * native [[BloomFilterMightContain]] expression — the same
    * expression Spark's AQE runtime row-level filtering injects, so
    * the probe stays inside whole-stage codegen. Null keys are dropped
    * (equi-join semantics: null never matches).
    *
    * Use when the dimension is data-dependent (can't be a static
    * partition filter) but selective; for tiny dimensions prefer a
    * broadcast join outright. */
  def bloomPrune(large: DataFrame, largeKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // xxhash64 hashes by PHYSICAL type: int 5 and bigint 5 produce
    // different hashes, so mismatched key types would make every probe
    // miss and silently prune rows the real join (which coerces types)
    // would keep. Align both sides to the type the join's own BINARY
    // COMPARISON coercion picks (string-vs-bigint compares as DOUBLE,
    // not STRING — the "wider" type would hash join-equal values
    // apart); refuse key pairs the join itself couldn't compare.
    val largeT = large.schema(largeKey).dataType
    val smallT = small.schema(smallKey).dataType
    val commonT = GraftSqlShims.joinKeyCommonType(largeT, smallT).getOrElse(
      throw new IllegalArgumentException(
        s"bloomPrune: no common type for $largeKey:$largeT vs $smallKey:$smallT"))
    val bf = small.filter(col(smallKey).isNotNull)
      .select(xxhash64(col(smallKey).cast(commonT)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val probe = GraftSqlShims.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftSqlShims.expression(xxhash64(col(largeKey).cast(commonT)))))
    large.filter(col(largeKey).isNotNull && probe)
  }

  /** Inner join with the large side Bloom-pruned first: exactly equal
    * to `large.join(small, largeKey === smallKey)` (the join clears
    * the Bloom filter's false positives), but the large side's shuffle
    * carries only rows that can match. The honest scale contract: with
    * a selective dimension this cuts the dominant exchange by the
    * dimension's selectivity; with an unselective one it costs one
    * extra scan-side filter probe per row (~ns, codegen). */
  def bloomPrunedJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val pruned = bloomPrune(large, largeKey, small, smallKey,
      expectedItems, fpp)
    pruned.join(small, pruned(largeKey) === small(smallKey))
  }
}
