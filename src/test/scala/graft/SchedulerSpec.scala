package graft

import java.time.{Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Scheduler

/** E2 — cron-subset scheduling with deterministic virtual time. */
class SchedulerSpec extends AnyFunSuite {
  private val utc = ZoneId.of("UTC")
  private def t(s: String) = Instant.parse(s)

  test("next-fire matches the reference's three cron entries") {
    // daily 02:00 (cron-jobs.txt:12)
    val daily = Scheduler.parse("0 2 * * *")
    assert(daily.next(t("2026-08-12T01:00:00Z"), utc) == t("2026-08-12T02:00:00Z"))
    assert(daily.next(t("2026-08-12T02:00:00Z"), utc) == t("2026-08-13T02:00:00Z")) // strict
    // weekly Sunday 03:00 (cron-jobs.txt:15); 2026-08-12 is a Wednesday
    val weekly = Scheduler.parse("0 3 * * 0")
    assert(weekly.next(t("2026-08-12T01:00:00Z"), utc) == t("2026-08-16T03:00:00Z"))
    // monthly 1st 00:00 (log rotation entry)
    val monthly = Scheduler.parse("0 0 1 * *")
    assert(monthly.next(t("2026-08-12T01:00:00Z"), utc) == t("2026-09-01T00:00:00Z"))
  }

  test("monthly maintenance job fires on the 1st between the daily syncs") {
    val fired = scala.collection.mutable.ArrayBuffer[String]()
    var clock = t("2026-08-31T12:00:00Z") // Monday, day before month end
    val jobs = Scheduler.referenceJobs(
      runIncremental = () => fired += "inc",
      runFull = () => fired += "full",
      runMaintenance = Some(() => fired += "maint"))
    val loop = new Scheduler.Loop(jobs, utc,
      now = () => clock,
      sleep = ms => clock = clock.plusMillis(ms))
    loop.run(maxFires = 3)
    // Sep 1 00:00 maintenance, Sep 1 02:00 inc, Sep 2 02:00 inc
    assert(fired.toSeq == Seq("maint", "inc", "inc"), fired)
    assert(clock == t("2026-09-02T02:00:00Z"))
  }

  test("loop fires jobs in cron order under virtual time; failures re-arm") {
    val fired = scala.collection.mutable.ArrayBuffer[String]()
    var clock = t("2026-08-15T23:00:00Z") // Saturday evening
    val jobs = Scheduler.referenceJobs(
      runIncremental = () => { fired += "inc"; sys.error("transient sync failure") },
      runFull = () => fired += "full")
    val loop = new Scheduler.Loop(jobs, utc,
      now = () => clock,
      sleep = ms => clock = clock.plusMillis(ms),
      onError = (_, _) => ())
    loop.run(maxFires = 4)
    // Sun 02:00 inc, Sun 03:00 full, Mon 02:00 inc, Tue 02:00 inc —
    // the throwing incremental job keeps its schedule
    assert(fired.toSeq == Seq("inc", "full", "inc", "inc"))
    assert(clock == t("2026-08-18T02:00:00Z"))
    // no maintenance callback bound -> no maintenance job in the table:
    // the schedule reflects what actually runs
    assert(!jobs.exists(_.name == "monthly_maintenance"), jobs.map(_.name))
  }

  test("stop() halts the loop") {
    var clock = t("2026-08-12T00:00:00Z")
    var n = 0
    val loop = new Scheduler.Loop(
      Seq(Scheduler.Job("j", Scheduler.parse("0 2 * * *"), () => n += 1)),
      utc, now = () => clock, sleep = ms => clock = clock.plusMillis(ms))
    loop.stop()
    loop.run(maxFires = 10)
    assert(n == 0)
  }
}
