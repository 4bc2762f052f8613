package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.Lake

class LakeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frame(ingestOn: String, values: Seq[Int]) =
    values.toDF("v").withColumn("ingest_on", to_date(lit(ingestOn)))

  test("appendOrCreate: create on first write, append afterwards") {
    val tbl = "lake_append_t"
    Lake.appendOrCreate(spark, frame("2020-02-01", Seq(1, 2)), tbl)
    assert(spark.table(tbl).count() == 2)
    Lake.appendOrCreate(spark, frame("2020-03-01", Seq(3)), tbl)
    assert(spark.table(tbl).count() == 3)
    // partition layout: reading one ingest_on prunes to that partition
    assert(spark.table(tbl)
      .filter(col("ingest_on") === lit("2020-03-01").cast("date"))
      .count() == 1)
  }

  test("overwritePartitions is idempotent per window (rerun-safe)") {
    val tbl = "lake_idem_t"
    Lake.enableDynamicPartitionOverwrite(spark)
    Lake.overwritePartitions(spark, frame("2020-02-01", Seq(1, 2)), tbl)
    Lake.overwritePartitions(spark, frame("2020-03-01", Seq(3, 4, 5)), tbl)
    assert(spark.table(tbl).count() == 5)
    // rerun of the Feb window must replace, not duplicate, Feb only
    Lake.overwritePartitions(spark, frame("2020-02-01", Seq(9, 9)), tbl)
    assert(spark.table(tbl).count() == 5)
    assert(spark.table(tbl).filter(col("v") === 9).count() == 2)
    assert(spark.table(tbl)
      .filter(col("ingest_on") === lit("2020-03-01").cast("date"))
      .count() == 3)
  }

  test("writePartitionSketches: sketches accrue per partition, re-runs " +
      "replace not duplicate, and stored-sketch algebra answers " +
      "cross-partition questions exactly") {
    import graft.functions.KmvFunctions._
    val tbl = "lake_kmv_sketch_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def day(ingestOn: String, ids: Seq[Int]) = ids
      .toDF("id").withColumn("ingest_on", lit(ingestOn))
      .withColumn("hv", kmv_hash48(col("id")))
    // two daily loads, each landing its own sketch partition
    Lake.writePartitionSketches(spark, day("d1", 1 to 40), tbl, "hv", k = 8)
    Lake.writePartitionSketches(spark, day("d2", 21 to 60), tbl, "hv", k = 8)
    assert(spark.table(tbl).count() == 2)
    // re-running a day (the backfill case) must replace its one row
    Lake.writePartitionSketches(spark, day("d2", 21 to 60), tbl, "hv", k = 8)
    val stored = spark.table(tbl).orderBy("ingest_on").collect()
    assert(stored.length == 2)
    assert(stored.map(_.getAs[Long]("row_count")).toSeq == Seq(40L, 40L))
    // cross-partition estimate from the STORED sketches alone equals
    // the estimate computed over the raw union — the whole point
    val sk = spark.table(tbl)
      .select(col("ingest_on"), col("sketch"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val est = spark.range(1).select(
      kmv_estimate(kmv_union(typedLit(sk("d1")), typedLit(sk("d2")), 8),
        8).as("e")).head.getLong(0)
    val raw = day("d1", 1 to 40).unionByName(day("d2", 21 to 60))
      .agg(kmv_distinct(col("hv"), 8)).head.getLong(0)
    assert(est == raw,
      s"stored-sketch union estimate $est != raw-scan estimate $raw")
  }

  test("writePartitionSketches with sampleValueCol: the stored order " +
      "samples answer cross-partition quantiles exactly like a raw " +
      "union scan; re-runs replace") {
    import graft.functions.KmvFunctions._
    val tbl = "lake_kmv_sample_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def day(ingestOn: String, ids: Seq[Int]) = ids
      .toDF("id").withColumn("ingest_on", lit(ingestOn))
      .withColumn("hv", kmv_hash48(col("id")))
      .withColumn("v", (col("id") * 3).cast("double"))
    Lake.writePartitionSketches(spark, day("d1", 1 to 40), tbl, "hv",
      k = 8, sampleValueCol = Some("v"))
    Lake.writePartitionSketches(spark, day("d2", 41 to 90), tbl, "hv",
      k = 8, sampleValueCol = Some("v"))
    // backfill re-run replaces d2's single row
    Lake.writePartitionSketches(spark, day("d2", 41 to 90), tbl, "hv",
      k = 8, sampleValueCol = Some("v"))
    val t = spark.table(tbl)
    assert(t.count() == 2)
    // cross-partition median purely from the STORED samples: explode
    // both days' pair sets, re-aggregate, read the quantile — must
    // equal kmv_sample over the raw two-day union (lossless merge)
    val fromStored = t.select(explode(col("sample")).as("e"))
      .agg(kmv_sample(col("e.h"), col("e.v"), 8).as("g"))
      .select(kmv_sample_quantile(col("g"), 0.5)).head.getDouble(0)
    val fromRaw = day("d1", 1 to 40).unionByName(day("d2", 41 to 90))
      .agg(kmv_sample(col("hv"), col("v"), 8).as("g"))
      .select(kmv_sample_quantile(col("g"), 0.5)).head.getDouble(0)
    assert(fromStored == fromRaw,
      s"stored-sample quantile $fromStored != raw-scan $fromRaw")
    // and the sampled median is an actually-observed value
    assert(fromStored % 3.0 == 0.0 && fromStored >= 3.0 &&
      fromStored <= 270.0)
  }

  test("upsertByKey: latest version wins, untouched partitions intact") {
    val tbl = "lake_upsert_t"
    def kv(ingestOn: String, rows: Seq[(Long, String, Long)]) =
      rows.toDF("k", "payload", "version")
        .withColumn("ingest_on", to_date(lit(ingestOn)))
    // seed: two partitions
    Lake.upsertByKey(spark,
      kv("2020-02-01", Seq((1L, "a", 1L), (2L, "b", 1L)))
        .unionByName(kv("2020-03-01", Seq((3L, "c", 1L)))),
      tbl, Seq("k"), "version")
    assert(spark.table(tbl).count() == 3)
    // update k=1 (newer version), insert k=4, both in Feb; March untouched
    Lake.upsertByKey(spark,
      kv("2020-02-01", Seq((1L, "a2", 2L), (4L, "d", 1L))),
      tbl, Seq("k"), "version")
    val out = spark.table(tbl).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 2L -> "b", 3L -> "c", 4L -> "d"))
    // stale update (older version) must NOT win
    Lake.upsertByKey(spark,
      kv("2020-02-01", Seq((1L, "stale", 1L))), tbl, Seq("k"), "version")
    assert(spark.table(tbl).filter(col("k") === 1L)
      .head.getString(1) == "a2")
    assert(spark.table(tbl).count() == 4)
    // version TIE: the incoming update wins deterministically
    Lake.upsertByKey(spark,
      kv("2020-02-01", Seq((1L, "corrected", 2L))), tbl, Seq("k"), "version")
    assert(spark.table(tbl).filter(col("k") === 1L)
      .head.getString(1) == "corrected")
  }

  test("appendEvolved resolves case-variant columns, not as new ones") {
    val tbl = "lake_evolve_case_t"
    Lake.appendEvolved(spark,
      Seq((1, "web")).toDF("v", "channel")
        .withColumn("ingest_on", to_date(lit("2020-02-01"))), tbl)
    // second batch spells the column `Channel` — Spark resolution is
    // case-insensitive, so this must append, not ALTER TABLE
    Lake.appendEvolved(spark,
      Seq((2, "mobile")).toDF("v", "Channel")
        .withColumn("ingest_on", to_date(lit("2020-03-01"))), tbl)
    val out = spark.table(tbl)
    assert(out.count() == 2)
    assert(out.columns.count(_.equalsIgnoreCase("channel")) == 1)
    assert(out.filter(col("channel") === "mobile").count() == 1)
  }

  test("appendEvolved: new columns appear, history reads them as null") {
    val tbl = "lake_evolve_t"
    Lake.appendEvolved(spark, frame("2020-02-01", Seq(1, 2)), tbl)
    // second batch arrives with an extra column
    val evolved = Seq((3, "mobile")).toDF("v", "channel")
      .withColumn("ingest_on", to_date(lit("2020-03-01")))
    Lake.appendEvolved(spark, evolved, tbl)
    val out = spark.table(tbl)
    assert(out.columns.toSet == Set("v", "channel", "ingest_on"))
    assert(out.count() == 3)
    // history rows surface the evolved column as null
    assert(out.filter(col("channel").isNull).count() == 2)
    assert(out.filter(col("channel") === "mobile").count() == 1)
    // a third batch WITHOUT the evolved column still appends (nulls)
    Lake.appendEvolved(spark, frame("2020-04-01", Seq(9)), tbl)
    assert(spark.table(tbl).count() == 4)
    assert(spark.table(tbl).filter(col("channel").isNull).count() == 3)
  }

  test("appendEvolved widens column types metadata-only") {
    val tbl = "lake_widen_t"
    Lake.appendEvolved(spark, Seq((1, 1.5f)).toDF("v", "score")
      .withColumn("ingest_on", to_date(lit("2020-02-01"))), tbl)
    assert(spark.table(tbl).schema("v").dataType
      == org.apache.spark.sql.types.IntegerType)
    // second batch arrives wider: int→bigint, float→double
    Lake.appendEvolved(spark, Seq((2L, 2.5d)).toDF("v", "score")
      .withColumn("ingest_on", to_date(lit("2020-03-01"))), tbl)
    val sch = spark.table(tbl).schema
    assert(sch("v").dataType == org.apache.spark.sql.types.LongType)
    assert(sch("score").dataType == org.apache.spark.sql.types.DoubleType)
    // old int32/float parquet files read fine under the widened schema
    // (SPARK-40876) — both generations of rows come back correct
    val out = spark.table(tbl).orderBy("v")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 1.5), (2L, 2.5)))
    // a later NARROW batch up-casts into the widened table
    Lake.appendEvolved(spark, Seq((3, 3.5f)).toDF("v", "score")
      .withColumn("ingest_on", to_date(lit("2020-04-01"))), tbl)
    assert(spark.table(tbl).filter(col("v") === 3L).count() == 1)
    assert(spark.table(tbl).schema("v").dataType
      == org.apache.spark.sql.types.LongType)
    // incompatible drift still fails loudly
    intercept[IllegalArgumentException] {
      Lake.appendEvolved(spark, Seq(("oops", 1.0d)).toDF("v", "score")
        .withColumn("ingest_on", to_date(lit("2020-05-01"))), tbl)
    }
  }

  test("renameColumns rewrites the table under the new names") {
    val tbl = "lake_rename_t"
    Lake.appendEvolved(spark, Seq((1, "a"), (2, "b")).toDF("v", "tag")
      .withColumn("ingest_on", to_date(lit("2020-02-01"))), tbl)
    Lake.renameColumns(spark, tbl, Map("tag" -> "label"))
    val out = spark.table(tbl)
    assert(out.columns.toSet == Set("v", "label", "ingest_on"))
    assert(out.orderBy("v").collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
    // partition layout survives the rewrite
    assert(out.filter(col("ingest_on") === lit("2020-02-01").cast("date"))
      .count() == 2)
    // guard rails: partition column, unknown source, existing target
    intercept[IllegalArgumentException] {
      Lake.renameColumns(spark, tbl, Map("ingest_on" -> "d"))
    }
    intercept[IllegalArgumentException] {
      Lake.renameColumns(spark, tbl, Map("nope" -> "x"))
    }
    intercept[IllegalArgumentException] {
      Lake.renameColumns(spark, tbl, Map("label" -> "v"))
    }
  }

  test("landing JSON write is overwrite-idempotent and single-file") {
    val base = Files.createTempDirectory("landing").toString
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "n")
    Lake.writeLandingJson(df, base, "2020_02_01")
    Lake.writeLandingJson(df, base, "2020_02_01") // rerun overwrites
    val files = new java.io.File(s"$base/ingest_on=2020_02_01")
      .listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length == 1)
    assert(spark.read.json(s"$base/ingest_on=2020_02_01").count() == 2)
  }

  test("external-location table: query without load (Spectrum analog)") {
    // S6: the reference queries Iceberg in place via Redshift Spectrum
    // external schemas (serving/redshift.tf:9-21) — here: an external
    // parquet table over an existing directory, no data movement
    val dir = Files.createTempDirectory("external").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    Lake.registerExternalTable(spark, "ext_songs", dir)
    assert(spark.table("ext_songs").count() == 2)
    // the catalog marks an explicit-LOCATION table EXTERNAL — the
    // property that makes drop metadata-only
    assert(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst
        .TableIdentifier("ext_songs"))
      .tableType.name == "EXTERNAL")
    // registration is create-or-replace: re-pointing the name at a new
    // location is metadata-only and picks up the new files
    val dir2 = Files.createTempDirectory("external2").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir2)
    Lake.registerExternalTable(spark, "ext_songs", dir2)
    assert(spark.table("ext_songs").count() == 3)
    // external: dropping the table must not delete the data
    spark.sql("DROP TABLE ext_songs")
    assert(spark.read.parquet(dir).count() == 2)
    assert(spark.read.parquet(dir2).count() == 3)
  }

  test("registerExternalTable refuses to replace a MANAGED table and " +
      "rejects unsafe identifiers/locations") {
    val dir = Files.createTempDirectory("external3").toString
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    // a pre-existing MANAGED table: replacing it would DELETE its data
    // on drop — the register must refuse, not silently destroy
    spark.sql("DROP TABLE IF EXISTS ext_managed_clash")
    Seq((9L, "z")).toDF("k", "v")
      .write.format("parquet").saveAsTable("ext_managed_clash")
    val err = intercept[IllegalArgumentException] {
      Lake.registerExternalTable(spark, "ext_managed_clash", dir)
    }
    assert(err.getMessage.contains("MANAGED"))
    // the managed table and its data survived the refusal
    assert(spark.table("ext_managed_clash").count() == 1)
    spark.sql("DROP TABLE ext_managed_clash")
    // injection-shaped identifiers and quoted locations fail fast
    intercept[IllegalArgumentException] {
      Lake.registerExternalTable(spark, "t; DROP TABLE x", dir)
    }
    intercept[IllegalArgumentException] {
      Lake.registerExternalTable(spark, "ext_ok", "/tmp/o'brien")
    }
    // replacing an EXTERNAL table stays allowed (metadata-only)
    Lake.registerExternalTable(spark, "ext_replace_ok", dir)
    Lake.registerExternalTable(spark, "ext_replace_ok", dir)
    assert(spark.table("ext_replace_ok").count() == 1)
    spark.sql("DROP TABLE ext_replace_ok")
    // the guard is an ALLOWLIST (only EXTERNAL is re-pointable): a
    // persistent VIEW of the same name refuses instead of falling
    // through to a confusing DROP TABLE resolution ...
    spark.sql("DROP VIEW IF EXISTS ext_view_clash")
    spark.sql("CREATE VIEW ext_view_clash AS SELECT 1 AS one")
    val errView = intercept[IllegalArgumentException] {
      Lake.registerExternalTable(spark, "ext_view_clash", dir)
    }
    assert(errView.getMessage.contains("only EXTERNAL"), errView.getMessage)
    assert(spark.table("ext_view_clash").count() == 1)
    spark.sql("DROP VIEW ext_view_clash")
    // ... and so does a same-name TEMP view (tableExists sees it but
    // DESCRIBE EXTENDED reports no Type row — the empty-kind case)
    Seq((1L, "t")).toDF("k", "v").createOrReplaceTempView("ext_temp_clash")
    val errTemp = intercept[IllegalArgumentException] {
      Lake.registerExternalTable(spark, "ext_temp_clash", dir)
    }
    assert(errTemp.getMessage.contains("only EXTERNAL"), errTemp.getMessage)
    spark.catalog.dropTempView("ext_temp_clash")
  }

  test("landing CSV write with header round-trips") {
    val base = Files.createTempDirectory("landing-csv").toString
    val df = Seq(("a", "1"), ("b", "2")).toDF("k", "n")
    Lake.writeLandingCsv(df, base, "2020_02_01")
    val back = spark.read.option("header", "true")
      .csv(s"$base/ingest_on=2020_02_01")
    assert(back.columns.toSeq == Seq("k", "n"))
    assert(back.count() == 2)
  }

  test("analyze records row-count and column stats in the catalog") {
    val t = "analyze_target"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.mode("overwrite").format("parquet").saveAsTable(t)
    Lake.analyze(spark, t, Seq("id"))
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t))
    val stats = meta.stats
    assert(stats.nonEmpty, "no table stats recorded")
    assert(stats.get.rowCount.contains(BigInt(3)), stats.toString)
    val colStats = stats.get.colStats.get("id")
    assert(colStats.nonEmpty, s"no column stats for id: ${stats.get}")
    assert(colStats.get.distinctCount.contains(BigInt(3)), colStats.toString)
    // with CBO on, the logical plan carries the measured row count
    // (plan-level rowCount propagation is gated on spark.sql.cbo.enabled;
    // without it only sizeInBytes flows)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try assert(spark.table(t).queryExecution.optimizedPlan.stats
      .rowCount.contains(BigInt(3)))
    finally spark.conf.set("spark.sql.cbo.enabled", "false")
    // unknown columns and unknown tables fail loudly
    intercept[IllegalArgumentException] {
      Lake.analyze(spark, t, Seq("nope"))
    }
    intercept[Exception] { Lake.analyze(spark, "no_such_table") }
    spark.sql(s"DROP TABLE $t")
  }

  test("CBO stats flip an actual plan decision: filtered dim broadcasts") {
    // the executed proof that analyze() matters (round-5 verdict #6):
    // without CBO, a Filter's size estimate is its CHILD's size, so a
    // selective dim filter still looks too big to broadcast; with CBO
    // + column stats the 1-row estimate clears the threshold and the
    // join strategy CHANGES. AQE is off so the decision under test is
    // the static cost-based one, not a runtime re-plan.
    val dim = "cbo_dim"; val fact = "cbo_fact"
    (1L to 50000L).map(i => (i, s"name_$i")).toDF("id", "name")
      .repartition(1).write.mode("overwrite")
      .format("parquet").saveAsTable(dim)
    (1L to 50000L).map(i => (i % 1000, i)).toDF("id", "v")
      .repartition(1).write.mode("overwrite")
      .format("parquet").saveAsTable(fact)
    def planFor(): String =
      spark.table(fact)
        .join(spark.table(dim).filter(col("name") === "name_7"), "id")
        .queryExecution.executedPlan.toString
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.get(k))
    try {
      // threshold below the dim PARQUET size but far above a 1-row
      // estimate — the decision hinges entirely on the size estimate
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024).toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val without = planFor()
      assert(!without.contains("BroadcastHashJoin"),
        s"dim must NOT broadcast without stats:\n$without")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      Lake.analyze(spark, dim, Seq("id", "name"))
      Lake.analyze(spark, fact, Seq("id"))
      val withStats = planFor()
      assert(withStats.contains("BroadcastHashJoin"),
        s"dim must broadcast once CBO sees the filtered row count:\n$withStats")
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql(s"DROP TABLE $dim"); spark.sql(s"DROP TABLE $fact")
    }
  }
}
