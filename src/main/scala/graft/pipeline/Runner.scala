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

  /** Sequential backfill over many windows (`max_active_runs=1`). */
  def backfill(windows: Seq[RunWindow]): Seq[PipelineResult] =
    windows.map(run)

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
