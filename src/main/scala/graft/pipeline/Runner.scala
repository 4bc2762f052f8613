package graft.pipeline

import java.time.LocalDate

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

/** Minimal DAG runner — the engine-native replacement for the
  * reference's Airflow orchestration.
  *
  * Reference provenance: DAG fan-out/fan-in
  * dags/deftunes_api_pipeline.py:182-189, monthly schedule + catchup
  * :30-34, window params {{ds}}/{{next_ds}} :63-65, retries :13-20,
  * blocking DQ gate :120-149.
  *
  * Stages run in topological order; stages whose dependencies are all
  * satisfied run concurrently (Scala Futures — the fan-out of the two
  * API extracts). A failed stage (after retries) or a failed DQ gate
  * halts everything downstream of it, mirroring Airflow's
  * `wait_for_completion=True` quality gates.
  */
final case class RunWindow(start: LocalDate, endExclusive: LocalDate) {
  /** The reference's `ingest_date` = {{ next_ds }} (the window end). */
  def ingestDate: LocalDate = endExclusive
  /** The reference's api end_date = {{ macros.ds_add(next_ds, -1) }}. */
  def endInclusive: LocalDate = endExclusive.minusDays(1)
}

object RunWindow {
  /** Monthly windows covering [start, end) — the `0 0 1 * *` +
    * `catchup=True` backfill schedule as data, not a scheduler. */
  def monthly(start: LocalDate, endExclusive: LocalDate): Seq[RunWindow] =
    Iterator.iterate(start.withDayOfMonth(1))(_.plusMonths(1))
      .takeWhile(_.isBefore(endExclusive))
      .map(d => RunWindow(d, d.plusMonths(1)))
      .toSeq
}

sealed trait StageOutcome
case object StageOk extends StageOutcome
/** A data-quality gate that evaluated false — halts downstream stages
  * without being an exception (it is an expected, reportable verdict). */
final case class GateFailed(reason: String) extends StageOutcome

final case class Stage(name: String, deps: Seq[String] = Nil)(
    val run: RunWindow => StageOutcome)

final case class StageReport(stage: String, attempts: Int,
    outcome: Try[StageOutcome])

final case class PipelineResult(window: RunWindow, reports: Seq[StageReport]) {
  def succeeded: Boolean = reports.forall(_.outcome == Success(StageOk))
  def report(name: String): Option[StageReport] = reports.find(_.stage == name)
}

final class Pipeline(val name: String, stages: Seq[Stage],
    retries: Int = 1)(implicit ec: ExecutionContext) {
  require(stages.map(_.name).distinct.size == stages.size,
    s"duplicate stage names in pipeline $name")
  private val byName = stages.map(s => s.name -> s).toMap
  stages.foreach(s => s.deps.foreach(d => require(byName.contains(d),
    s"stage ${s.name} depends on unknown stage $d")))

  /** Run one window. Independent ready stages execute concurrently. */
  def run(window: RunWindow): PipelineResult = {
    val done = scala.collection.mutable.Map.empty[String, StageReport]
    var remaining = stages
    while (remaining.nonEmpty) {
      val ready = remaining.filter(_.deps.forall(d =>
        done.get(d).exists(_.outcome == Success(StageOk))))
      val blocked = remaining.filter(_.deps.exists(d =>
        done.get(d).exists(r => r.outcome != Success(StageOk))))
      if (ready.isEmpty) {
        // everything left is blocked by a failure upstream — mark skipped
        (remaining.toSet -- blocked.toSet).foreach { s =>
          done(s.name) = StageReport(s.name, 0,
            Failure(new IllegalStateException("skipped: upstream not satisfied")))
        }
        blocked.foreach { s =>
          done(s.name) = StageReport(s.name, 0,
            Failure(new IllegalStateException("skipped: upstream failed")))
        }
        remaining = Nil
      } else {
        val futures = ready.map(s => Future(runWithRetries(s, window)))
        Await.result(Future.sequence(futures), Duration.Inf)
          .foreach(r => done(r.stage) = r)
        remaining = remaining.filterNot(s => done.contains(s.name))
      }
    }
    PipelineResult(window, stages.map(s => done(s.name)))
  }

  /** Sequential backfill over many windows (`max_active_runs=1`).
    * With a `ledgerDir`, completed windows are recorded durably and a
    * restarted backfill SKIPS them — Airflow's persisted dag-run
    * history for `catchup=True` (deftunes_api_pipeline.py:30-34).
    * Without one, idempotent writes (K6) still make a full re-run
    * correct; the ledger just stops a 100-window backfill from
    * recomputing the 99 windows that already landed. Only windows
    * actually executed appear in the returned results. */
  def backfill(windows: Seq[RunWindow],
      ledgerDir: Option[String] = None): Seq[PipelineResult] =
    windows.flatMap { w =>
      if (ledgerDir.exists(d => RunLedger.isComplete(d, name, w))) None
      else {
        val result = run(w)
        if (result.succeeded)
          ledgerDir.foreach(d => RunLedger.markComplete(d, name, w))
        Some(result)
      }
    }

  private def runWithRetries(s: Stage, w: RunWindow): StageReport = {
    var attempt = 0
    var last: Try[StageOutcome] = Failure(new IllegalStateException("not run"))
    while (attempt <= retries &&
        (attempt == 0 || last.isFailure)) {
      attempt += 1
      last = Try(s.run(w))
      last match {
        case Success(GateFailed(_)) =>
          // a DQ verdict is final — do not retry a deterministic gate
          return StageReport(s.name, attempt,
            Failure(new IllegalStateException(
              s"quality gate failed: ${last.get}")))
        case _ => ()
      }
    }
    StageReport(s.name, attempt, last)
  }
}

/** Durable per-window completion markers for [[Pipeline.backfill]] —
  * one zero-byte-ish JSON file per (pipeline, window) under a ledger
  * directory, written ATOMICALLY (temp file + rename) only after every
  * stage of the window succeeded. A crashed backfill leaves no marker
  * for the in-flight window, so resume re-runs exactly the incomplete
  * suffix. Goes through the Hadoop FileSystem API, so the ledger can
  * live next to the lake (file://, hdfs://, s3a://...) — the moral
  * equivalent of Airflow's dag-run table, kept in the lake instead of
  * a metadata database. */
object RunLedger {
  private def fileSystem(dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())

  private def marker(dir: String, pipeline: String,
      w: RunWindow): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(dir,
      s"${pipeline}_${w.start}_${w.endExclusive}.done.json")

  def isComplete(dir: String, pipeline: String, w: RunWindow): Boolean =
    fileSystem(dir).exists(marker(dir, pipeline, w))

  def markComplete(dir: String, pipeline: String, w: RunWindow): Unit = {
    val fs = fileSystem(dir)
    val target = marker(dir, pipeline, w)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".${target.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      (s"""{"pipeline":"$pipeline","window_start":"${w.start}",""" +
        s""""window_end_exclusive":"${w.endExclusive}"}""" + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      // a concurrent writer winning the rename left the marker we
      // wanted anyway; anything else is a real failure
      require(fs.exists(target), s"could not commit ledger marker $target")
    }
  }

  /** Completed windows recorded for `pipeline`, for observability. */
  def completed(dir: String, pipeline: String): Seq[String] = {
    val fs = fileSystem(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(s"${pipeline}_") && n.endsWith(".done.json"))
      .sorted
  }
}
