package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CappedCollectFunctions.{capped_collect_list, capped_collect_with_rep}

class CappedCollectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("groups at or under the cap collect fully; over-cap groups null") {
    val df = (1 to 100).map(i => (if (i <= 90) "big" else "small", i.toLong))
      .toDF("g", "v").repartition(7) // force partial buffers + merges
    val out = df.groupBy("g")
      .agg(capped_collect_list(col("v"), 10).as("vs"))
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[Long](1)).map(_.sorted)).toMap
    assert(out("big").isEmpty)                  // 90 > cap → null
    assert(out("small").contains((91L to 100L))) // exactly at cap → kept
  }

  test("matches collect_list + size filter semantics (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val prop = forAll(Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0L, 30L)))) { xs =>
      val df = xs.toDF("g", "v").repartition(5)
      val cap = 8
      val capped = df.groupBy("g")
        .agg(capped_collect_list(col("v"), cap).as("vs"))
        .collect().map(r => r.getInt(0) ->
          Option(r.getSeq[Long](1)).map(_.sorted)).toMap
      val reference = df.groupBy("g")
        .agg(collect_list(col("v")).as("vs"))
        .collect().map { r =>
          val vs = r.getSeq[Long](1)
          r.getInt(0) -> (if (vs.length > cap) None else Some(vs.sorted))
        }.toMap
      capped == reference
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("null elements are skipped; struct payloads round-trip spill") {
    val df = Seq((1, Some(2L)), (1, None), (1, Some(3L)))
      .toDF("g", "v")
    val vs = df.groupBy("g")
      .agg(capped_collect_list(col("v"), 5).as("vs"))
      .head().getSeq[Long](1).sorted
    assert(vs == Seq(2L, 3L))
    // struct elements (the simhash/embedding payload shape) survive
    // the serialize/deserialize spill format
    val structs = Seq((1, 10L, 0.5), (1, 11L, 0.7)).toDF("g", "id", "x")
    val got = structs.groupBy("g")
      .agg(capped_collect_list(struct(col("id"), col("x")), 5).as("vs"))
      .select(explode(col("vs")).as("p"))
      .select(col("p.id"), col("p.x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((10L, 0.5), (11L, 0.7)))
  }

  test("with_rep: overflowed groups carry the min of EVERY element seen") {
    // 90 values into cap 10, shuffled across 7 partitions so the min
    // must survive partial-buffer merges AND the overflow flip in both
    // update() and merge(); the global min (3) is planted once
    val vals = scala.util.Random.shuffle((4L to 92L).toVector :+ 3L)
    val df = vals.map(("big", _)).toDF("g", "v").repartition(7)
    val row = df.groupBy("g")
      .agg(capped_collect_with_rep(col("v"), 10).as("cm"))
      .select(col("cm.items"), col("cm.rep")).head()
    assert(row.isNullAt(0))          // overflowed → items null
    assert(row.getLong(1) == 3L)     // rep = min over all 90, not the cap
  }

  test("with_rep: healthy groups keep items, rep stays null") {
    val df = Seq(("s", 5L), ("s", 2L)).toDF("g", "v")
    val row = df.groupBy("g")
      .agg(capped_collect_with_rep(col("v"), 10).as("cm"))
      .select(col("cm.items"), col("cm.rep")).head()
    assert(row.getSeq[Long](0).sorted == Seq(2L, 5L))
    assert(row.isNullAt(1))
  }

  test("with_rep: struct payload rep is the lexicographic min (matches " +
      "sort_array ordering)") {
    // the simhash/embedding element shape: struct(id, payload) — the
    // rep must order by the struct exactly as sort_array would, so
    // star pairs stay (a < b)-consistent with the combination path
    val df = (1 to 30).map(i => (1, 31L - i, i * 0.5))
      .toDF("g", "id", "x").repartition(4)
    val row = df.groupBy("g")
      .agg(capped_collect_with_rep(struct(col("id"), col("x")), 5).as("cm"))
      .select(col("cm.items"), col("cm.rep.id"), col("cm.rep.x")).head()
    assert(row.isNullAt(0))
    assert(row.getLong(1) == 1L && row.getDouble(2) == 15.0)
  }
}
