package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference PageRank with the operator's exact arithmetic: per-edge
    * contributions FLOOR-quantized to integer 1e-15 units (floor, not
    * a decimal cast — the same engine-neutral rounding rule the
    * operator and its DuckDB oracle share), summed exactly as longs,
    * one division back to doubles, damped in doubles. */
  private def localPR(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => math.floor(r(e._1) / out(e._1) * 1e15).toLong)
          .sum.toDouble / 1e15
      }
      r = nodes.map(nd => nd -> ((1.0 - d) / n + d * in.getOrElse(nd, 0.0)))
        .toMap
    }
    r
  }

  private val edges: Seq[(Long, Long)] = Seq(
    1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L, 4L -> 3L, 2L -> 1L,
    5L -> 1L, 5L -> 2L, 5L -> 3L) // 4 and 5 are dangling destinations/sources

  test("pageRank matches the quantized reference bit-for-bit") {
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = localPR(edges, 3, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(got(k) == v, s"node $k: ${got(k)} != $v")
  }

  test("pageRank is partitioning-invariant (decimal-summed contributions)") {
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRank(df, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(df.repartition(7), 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("pageRank conserves mass on a symmetrized graph; hubs rank higher") {
    val sym = (edges ++ edges.map(_.swap)).distinct
    val pr = Graph.pageRank(sym.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // node 3 has the most (undirected) neighbors; node 4 the fewest
    assert(pr(3L) > pr(4L))
  }

  /** Brute-force reference: canonical undirected edge set, triangles
    * by 3-way scan, lcc with the operator's exact arithmetic. */
  private def localTriangles(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] = {
    val und = edges.map { case (s, d) => (s min d, s max d) }
      .filter { case (a, b) => a != b }.distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    nbrs.map { case (n, nb) =>
      val tri = nb.toSeq.combinations(2)
        .count { case Seq(x, y) => nbrs(x).contains(y) }.toLong
      val d = nb.size.toLong
      val lcc = if (d >= 2) (tri * 2).toDouble / (d * (d - 1)).toDouble
        else 0.0
      n -> ((d, tri, lcc))
    }
  }

  test("triangleStats matches brute force; direction/dup/self-loop " +
      "normalization; a hub with no closures has lcc 0") {
    // two overlapping triangles (1,2,3) and (2,3,4), a pendant 5, a
    // star hub 6 with leaves that never interconnect, plus noise:
    // reversed duplicates and a self-loop
    val es: Seq[(Long, Long)] = Seq(
      1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 4L, 3L -> 4L, 4L -> 5L,
      6L -> 10L, 6L -> 11L, 6L -> 12L, 6L -> 13L,
      2L -> 1L, 3L -> 2L, 5L -> 5L) // dups + self-loop
    val got = Graph.triangleStats(es.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val want = localTriangles(es)
    assert(got == want, s"got:\n$got\nwant:\n$want")
    assert(got(1L) == ((2L, 1L, 1.0)))          // in exactly one triangle
    assert(got(2L)._2 == 2L && got(3L)._2 == 2L) // shared edge: two
    assert(got(6L) == ((4L, 0L, 0.0)))          // hub, zero closure
    assert(got(5L) == ((1L, 0L, 0.0)))          // pendant: degree 1
    // partitioning invariance (integer counts, one IEEE division)
    val rep = Graph.triangleStats(es.toDF("src", "dst").repartition(7))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rep == got)
  }

  test("PROPERTY: triangleStats equals brute force on random graphs " +
      "(dups, self-loops, hubs, direction noise included)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val edgeGen = for {
      n <- Gen.chooseNum(2, 18)              // node-id space
      m <- Gen.chooseNum(1, 60)              // raw edge count
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)     // self-loops possible
        b <- Gen.chooseNum(0L, n.toLong)     // dups/reverses likely
      } yield (a, b))
    } yield es
    val prop = Prop.forAll(edgeGen) { es =>
      val nonLoop = es.exists { case (a, b) => a != b }
      // an all-loop sample normalizes to an empty graph on both sides
      val got = Graph.triangleStats(es.toDF("src", "dst")).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val want = localTriangles(es)
      (!nonLoop || got.nonEmpty) && got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("triangleStats on a clique: every node closes all wedges") {
    val nodes = (1L to 6L)
    val es = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val got = Graph.triangleStats(es.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // K6: degree 5, C(5,2)=10 triangles per node, lcc exactly 1.0
    assert(got.size == 6 && got.values.forall(_ == ((5L, 10L, 1.0))))
  }
}
