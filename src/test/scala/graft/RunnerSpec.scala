package graft

import java.time.LocalDate
import java.util.concurrent.ConcurrentLinkedQueue

import scala.concurrent.ExecutionContext.Implicits.global
import scala.util.Success

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

class RunnerSpec extends AnyFunSuite {

  private val w = RunWindow(LocalDate.parse("2020-02-01"),
    LocalDate.parse("2020-03-01"))

  test("RunWindow monthly backfill covers the catchup range") {
    val ws = RunWindow.monthly(LocalDate.parse("2020-02-01"),
      LocalDate.parse("2020-05-01"))
    assert(ws.map(_.start.toString) ==
      Seq("2020-02-01", "2020-03-01", "2020-04-01"))
    assert(ws.head.ingestDate.toString == "2020-03-01")
    assert(ws.head.endInclusive.toString == "2020-02-29")
  }

  test("stages run in dependency order with fan-out") {
    val log = new ConcurrentLinkedQueue[String]()
    def stage(n: String, deps: String*) =
      Stage(n, deps)(_ => { log.add(n); StageOk })
    val p = new Pipeline("api", Seq(
      stage("start"),
      stage("users_extract", "start"), stage("sessions_extract", "start"),
      stage("transform", "users_extract", "sessions_extract"),
      stage("dq_users", "transform"), stage("dq_sessions", "transform"),
      stage("dbt", "dq_users", "dq_sessions")))
    val res = p.run(w)
    assert(res.succeeded)
    val order = log.toArray.map(_.toString).toSeq
    assert(order.indexOf("transform") > order.indexOf("users_extract"))
    assert(order.indexOf("transform") > order.indexOf("sessions_extract"))
    assert(order.indexOf("dbt") > order.indexOf("dq_users"))
  }

  test("a failed DQ gate halts downstream stages, not siblings") {
    val ran = new ConcurrentLinkedQueue[String]()
    val p = new Pipeline("gated", Seq(
      Stage("transform")(_ => { ran.add("transform"); StageOk }),
      Stage("dq", Seq("transform"))(_ => GateFailed("nulls found")),
      Stage("dbt", Seq("dq"))(_ => { ran.add("dbt"); StageOk }),
      Stage("side", Seq("transform"))(_ => { ran.add("side"); StageOk })))
    val res = p.run(w)
    assert(!res.succeeded)
    assert(!ran.contains("dbt"), "dbt must not run after failed gate")
    assert(ran.contains("side"), "unrelated sibling must still run")
  }

  test("retries: a flaky stage succeeds on attempt 2") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val p = new Pipeline("flaky", Seq(
      Stage("s")(_ =>
        if (attempts.incrementAndGet() < 2)
          throw new RuntimeException("transient")
        else StageOk)), retries = 1)
    val res = p.run(w)
    assert(res.succeeded)
    assert(res.report("s").get.attempts == 2)
  }

  test("gate failures are not retried (deterministic verdicts)") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val p = new Pipeline("gate-noretry", Seq(
      Stage("dq")(_ => { attempts.incrementAndGet(); GateFailed("bad") })),
      retries = 3)
    val res = p.run(w)
    assert(!res.succeeded)
    assert(attempts.get() == 1)
  }

  test("backfill runs windows sequentially") {
    val seen = new ConcurrentLinkedQueue[String]()
    val p = new Pipeline("bf", Seq(
      Stage("s")(win => { seen.add(win.start.toString); StageOk })))
    val results = p.backfill(RunWindow.monthly(
      LocalDate.parse("2020-02-01"), LocalDate.parse("2020-04-01")))
    assert(results.forall(_.succeeded))
    assert(seen.toArray.map(_.toString).toSeq ==
      Seq("2020-02-01", "2020-03-01"))
  }
}
