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

  /** Per-node triangle count, degree, and local clustering
    * coefficient over an UNDIRECTED graph given as an edge DataFrame
    * (`src`, `dst` — direction, duplicates, and self-loops are
    * normalized away). Returns one row per node: (`node`, `degree`,
    * `triangles`, `lcc`) where `lcc` = 2·triangles / (degree·(degree−1))
    * (0.0 for degree < 2). The workhorse of similarity-graph
    * diagnostics: on a near-dup graph, high-LCC nodes sit inside
    * tight clone cliques (safe to collapse) while high-degree/low-LCC
    * nodes are template hubs stitching unrelated documents — exactly
    * the edges a dedup pass should NOT transitively merge.
    *
    * Scale shape (the standard degree-orientation bound): each
    * undirected edge is oriented from its LOWER (degree, id) endpoint
    * to the higher, so every node's oriented out-degree is at most
    * O(√m) and wedge generation — the only superlinear step — is
    * Σ C(outdeg, 2) = O(m^1.5) worst case, ~m·d̄ on bounded-degree
    * graphs, instead of Σ C(deg, 2) which a hot hub turns quadratic
    * (a 1M-degree hub: C(1M, 2) ≈ 5·10^11 unoriented wedges vs ~zero
    * oriented ones — the hub is the HIGH end of nearly every edge, so
    * wedges never center on it). Triangles close with one hash
    * equi-join of the wedge list against the oriented edge list on
    * BOTH endpoints; only (node, node) long pairs ever shuffle. The
    * canonical edge list and the degree table each materialize once
    * (three consumers: orientation ×2, final left join).
    *
    * Determinism: integer counts end-to-end; the single double
    * division for `lcc` (exact 2·t and d·(d−1) longs cast to double,
    * one IEEE divide) is bit-identical in any engine — the oracle
    * replays it in DuckDB over the same canonical a<b<c triangle set,
    * which counts the identical triangles regardless of orientation
    * key. */
  def triangleStats(edges: DataFrame): DataFrame = {
    // Edge-scale intermediates persist DISK_ONLY (+ eager count, the
    // persistEager discipline): a localCheckpoint/MEMORY_AND_DISK
    // cache would pin the m-row blocks in the unified memory pool and
    // starve the wedge join + count aggregations of execution memory
    // exactly when they need it most (the ×100 harness run OOM'd
    // there). Disk blocks cost one serialized write each and leave
    // the whole pool to the joins; node-scale frames (deg) stay on
    // the normal in-memory materialize policy. Routed through Dedup's
    // TRACKED persist registry so releaseCaches()/scoped frees the
    // disk blocks between queries like every other multi-consumer
    // intermediate — a raw persist here would accumulate across a
    // long-lived session with no release path.
    def diskEager(df: DataFrame): DataFrame =
      graft.dedup.Dedup.persistEager(df,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // canonical undirected edges: a < b, self-loops dropped, distinct
    val und = diskEager(
      edges.select(
        least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
        .filter(col("a") =!= col("b")).distinct())
    val deg = graft.util.Checkpointing.materialize(
      und.select(col("a").as("node"))
        .unionAll(und.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree")))
    // orient u→v by ascending (degree, id); carry the head's key so
    // the wedge step can order its two heads without re-joining deg
    val withDegs = und
      .join(deg.select(col("node").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("__db")), "b")
    val keyA = struct(col("__da").as("d"), col("a").as("n"))
    val keyB = struct(col("__db").as("d"), col("b").as("n"))
    // three consumers (both wedge sides + the closing-edge probe):
    // materialize once, on disk
    val oriented = diskEager(withDegs.select(
      when(keyA < keyB, col("a")).otherwise(col("b")).as("u"),
      when(keyA < keyB, col("b")).otherwise(col("a")).as("v"),
      when(keyA < keyB, keyB).otherwise(keyA).as("__kv")))
    // wedges (v, w) centered on u with key(v) < key(w): the closing
    // edge {v, w}, if present, is oriented v→w under the SAME key
    val o1 = oriented.select(col("u"), col("v"), col("__kv"))
    val o2 = oriented.select(col("u").as("__u2"), col("v").as("w"),
      col("__kv").as("__kw"))
    val tri = o1.join(o2, col("u") === col("__u2") &&
        col("__kv") < col("__kw"))
      .select(col("u"), col("v"), col("w"))
      .join(oriented.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"), "left_semi")
    val perNode = tri.select(col("u").as("node"))
      .unionAll(tri.select(col("v").as("node")))
      .unionAll(tri.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          (col("triangles") * 2).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }
}
