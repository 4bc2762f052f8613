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
}
