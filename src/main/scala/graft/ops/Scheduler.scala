package graft.ops

import java.time.{DayOfWeek, Instant, ZoneId, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** E2 — scheduling: the engine-side form of the reference's cron file
  * (`/root/reference/truenas/cron-jobs.txt`): daily 02:00 incremental
  * 2-week sync, weekly Sunday 03:00 full sync, monthly maintenance.
  *
  * A 5-field cron subset (minute hour day-of-month month day-of-week;
  * `*` or an integer per field — exactly the grammar the reference's
  * three entries use) with deterministic next-fire computation, plus a
  * loop driver with injectable clock/sleeper so schedules are unit-
  * testable without wall-clock waits. Production deployments can keep
  * external cron exactly like the reference — this exists so the engine
  * can also self-schedule (long-running driver, `Trigger`-style).
  */
object Scheduler {

  /** Parsed 5-field cron entry. `None` = `*`. */
  final case class Cron(
      minute: Option[Int], hour: Option[Int], dayOfMonth: Option[Int],
      month: Option[Int], dayOfWeek: Option[Int]) {

    private def ok(zdt: ZonedDateTime): Boolean =
      minute.forall(_ == zdt.getMinute) &&
        hour.forall(_ == zdt.getHour) &&
        dayOfMonth.forall(_ == zdt.getDayOfMonth) &&
        month.forall(_ == zdt.getMonthValue) &&
        // cron: 0 = Sunday; java.time: MONDAY=1..SUNDAY=7
        dayOfWeek.forall(d => (if (d == 0) DayOfWeek.SUNDAY
          else DayOfWeek.of(d)) == zdt.getDayOfWeek)

    /** First fire strictly after `after` (minute resolution, ≤400-day
      * scan horizon — any satisfiable single-value entry fires within a
      * year).
      */
    def next(after: Instant, zone: ZoneId): Instant = {
      var t = after.atZone(zone).truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      val limit = t.plusDays(400)
      while (!ok(t)) {
        t = t.plusMinutes(1)
        if (!t.isBefore(limit)) sys.error(s"cron entry never fires: $this")
      }
      t.toInstant
    }
  }

  /** Parse the 5 cron fields (`0 2 * * *`, `0 3 * * 0`, `0 0 1 * *`). */
  def parse(expr: String): Cron = {
    val f = expr.trim.split("\\s+")
    require(f.length == 5, s"cron needs 5 fields: '$expr'")
    def one(s: String): Option[Int] =
      if (s == "*") None else Some(s.toInt)
    Cron(one(f(0)), one(f(1)), one(f(2)), one(f(3)), one(f(4)))
  }

  final case class Job(name: String, cron: Cron, run: () => Unit)

  /** The reference's schedule, bound to the orchestrator: daily 02:00
    * incremental 2-week sync of every pipeline; Sunday 03:00 full
    * (fiscal-year) sync (`cron-jobs.txt:12,15`); plus the engine's own
    * monthly table maintenance (1st 00:00 — `Orchestrator.maintain`:
    * business-key-clustered compaction + retention vacuum per versioned
    * root), which a log-structured sink needs where the reference's
    * remote Dataverse tables did not. The maintenance slot exists only
    * when a callback is actually bound — a schedule must reflect what
    * runs, never carry a silently-do-nothing job.
    */
  def referenceJobs(runIncremental: () => Unit, runFull: () => Unit,
      runMaintenance: Option[() => Unit] = None): Seq[Job] = Seq(
    Job("daily_olap_sync", parse("0 2 * * *"), runIncremental),
    Job("weekly_full_sync", parse("0 3 * * 0"), runFull)) ++
    runMaintenance.map(m => Job("monthly_maintenance", parse("0 0 1 * *"), m))

  /** Minimal loop driver: fires each job at its next cron instant,
    * re-arms, repeats until `stop()`. Clock and sleeper are injectable
    * so tests advance virtual time; jobs that throw are logged and
    * re-armed (a failed sync must not kill the schedule — the
    * reference's cron semantics).
    */
  final class Loop(
      jobs: Seq[Job], zone: ZoneId = ZoneId.of("UTC"),
      now: () => Instant = () => Instant.now(),
      sleep: Long => Unit = Thread.sleep,
      onError: (String, Throwable) => Unit = (n, e) =>
        System.err.println(s"[scheduler] $n failed: ${e.getMessage}")) {

    @volatile private var running = true
    def stop(): Unit = running = false

    /** Run until `stop()` or (for tests) until `maxFires` jobs fired. */
    def run(maxFires: Int = Int.MaxValue): Unit = {
      var fired = 0
      var due: Seq[(Job, Instant)] = jobs.map(j => j -> j.cron.next(now(), zone))
      while (running && fired < maxFires && due.nonEmpty) {
        val (job, at) = due.minBy(_._2)
        val waitMs = java.time.Duration.between(now(), at).toMillis
        if (waitMs > 0) sleep(waitMs)
        if (running) {
          try job.run()
          catch { case e: Throwable => onError(job.name, e) }
          fired += 1
          due = due.map { case (j, t) =>
            if (j eq job) j -> j.cron.next(at, zone) else j -> t
          }
        }
      }
    }
  }
}
