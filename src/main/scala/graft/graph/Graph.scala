package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the centrality layer a
  * training-data pipeline uses for importance-weighted selection
  * (rank documents by their similarity-graph centrality, rank
  * entities by interaction volume) on top of the kNN / co-occurrence
  * graphs the dedup and ANN operators already build. Connected
  * components live in [[graft.dedup.Dedup]]; this module adds
  * PageRank.
  *
  * Scale shape: one iteration = one equi-join of the rank vector with
  * the edge list on the source key plus one aggregation on the
  * destination key — the textbook distributed PR step. Both sides
  * hash-partition on node ids; nothing is ever collected to the
  * driver (the node count rides along as a 1-row cross join). Plans
  * grow linearly with the (small, fixed) iteration count.
  *
  * Determinism: per-edge contributions divide as doubles (IEEE ops
  * are deterministic), but their SUM is order-dependent under
  * parallelism — so each contribution quantizes by FLOOR to an
  * integer count of 1e-15 units and the aggregation sums BIGINTs
  * (exact, order-free; a long sum keeps the compact fast path the
  * DECIMAL(18,15) variant was chosen for — the 128-bit path measured
  * 26% slower at 10M edges), then one division returns to doubles.
  * floor is explicitly the SAME function in every engine, unlike a
  * double→decimal cast, which rounds HALF_UP in Spark but half-even
  * in DuckDB — a one-ULP cross-engine divergence observed in round 8.
  * Units stay exact: a contribution < 1 is < 1e15 units < 2^53, and
  * per-node incoming mass ≤ total mass ≈ 1 never overflows the sum.
  * Any engine replaying the same expression tree reproduces the ranks
  * bit-exactly at any parallelism — the same discipline as the money
  * sums and the IVF Lloyd replay.
  */
object Graph {

  /** PageRank with damping `d` over directed `edges` (`src`, `dst`
    * columns), `iters` fixed iterations from a uniform start. Returns
    * `(node, rank)` for every node appearing as a source or
    * destination. Multi-edges should be deduplicated by the caller if
    * unwanted (they weight the link). Dangling nodes (no out-edges)
    * contribute nothing — pass a symmetrized edge list for the
    * undirected semantics where mass is conserved. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    // every iteration consumes the edge list, the node set, and the
    // out-degrees — materialize them once (Checkpointing policy for
    // multi-consumer stages) or each iteration would re-derive them
    // from the raw tables: 3 iterations = 3 full input rescans
    val e = graft.util.Checkpointing.materialize(
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    val nodes = graft.util.Checkpointing.materialize(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    // node count as data, not a collect: a 1-row frame cross-joined
    // into the rank vector (broadcast — it is literally one row)
    val n = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg"))
    val init = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    (1 to iters).foldLeft(init) { (ranks, _) =>
      val contribs = ranks
        .join(e, ranks("node") === e("src"))
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          floor((col("rank") / col("__outdeg").cast("double"))
            * lit(1e15)).as("__u"))
        .groupBy(col("node"))
        .agg((sum(col("__u")).cast("double") / lit(1e15)).as("__in"))
      nodes.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / col("__n") +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
    }
  }
}
