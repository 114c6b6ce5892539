package graft

/** The bench artifact contract: one JSON line that ALWAYS parses and
  * fits the driver's ~2 KB output-tail capture — including worst cases
  * (every query failed with maximal error text) that round 4/6 showed
  * turn a transient environment problem into a lost round artifact.
  */
class BenchSpec extends SparkSpec {

  private def parse(line: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    val df = spark.read.json(Seq(line).toDS)
    assert(!df.columns.contains("_corrupt_record"), s"unparseable: $line")
    df.head()
  }

  private def names = (1 to 60).map(i => f"q$i%02d_some_operator_name")

  // the driver keeps the LAST 2000 chars of output: that window must
  // hold the "[info] " prefix, the line, and sbt's trailing
  // "[success] Total time: …" (~75 chars) — so every artifact must
  // render at or under 1915 bytes (BENCH_r08: 1923 survived by 3)
  private val TailBudget = 1915

  test("healthy artifact: parses, sums, stays under the tail cap") {
    val runs = names.map(n => n -> (Right(1.2345678): Either[String, Double]))
    val line = Bench.renderLine(runs, Seq("q03_some_operator_name"),
      (1.25, 3.96, 126220L, 121148L), 0.0, "/root/testdata/sf0.1")
    assert(line.length <= TailBudget, s"${line.length} bytes")
    assert(!line.contains("\n"))
    val row = parse(line)
    assert(row.getAs[String]("metric") == "total")
    // value is the sum of RAW times (then ms-rounded), not of the
    // per-query rounded renderings
    assert(math.abs(row.getAs[Double]("value") - 60 * 1.2345678) < 0.001)
    assert(row.getAs[Long]("failed") == 0)
    assert(row.getAs[Double]("sf") == 0.1)
  }

  test("mid-run load guard: loaded min re-runs under quiet, min published, contention-flagged instability cleared") {
    // quiet query: untouched, no clean run requested
    var calls = 0
    val quiet = Bench.requietPublish(Right(2.0), loadSeen = 0.4, loadBar = 1.0,
      wasUnstable = false, quietRun = () => { calls += 1; Some(Right(1.0)) })
    assert(quiet == (Right(2.0), false, false) && calls == 0)
    // loaded min + clean run faster: min published, counted
    val faster = Bench.requietPublish(Right(21.4), loadSeen = 2.8, loadBar = 1.0,
      wasUnstable = false, quietRun = () => Some(Right(5.6)))
    assert(faster == (Right(5.6), true, false))
    // loaded min + clean run slower: original min stands, still counted
    val slower = Bench.requietPublish(Right(2.0), loadSeen = 1.5, loadBar = 1.0,
      wasUnstable = false, quietRun = () => Some(Right(2.3)))
    assert(slower == (Right(2.0), true, false))
    // the r15 shape: >2x spread under load flagged `unstable`, the quiet
    // run confirms the min — flag adjudicated as external and cleared
    val adjudicated = Bench.requietPublish(Right(5.6), loadSeen = 2.8, loadBar = 1.0,
      wasUnstable = true, quietRun = () => Some(Right(5.9)))
    assert(adjudicated == (Right(5.6), true, true))
    // quiet run far from the min: genuine instability, flag stays
    val stillUnstable = Bench.requietPublish(Right(1.0), loadSeen = 2.8, loadBar = 1.0,
      wasUnstable = true, quietRun = () => Some(Right(4.0)))
    assert(stillUnstable == (Right(1.0), true, false))
    // clean run errored: the loaded timing beats an error, counted
    val errRun = Bench.requietPublish(Right(3.0), loadSeen = 2.0, loadBar = 1.0,
      wasUnstable = false, quietRun = () => Some(Left("boom")))
    assert(errRun == (Right(3.0), true, false))
    // machine never re-quieted / budget spent: loaded timing stands,
    // NOT counted (its raw runs + flags remain the evidence)
    val noQuiet = Bench.requietPublish(Right(3.0), loadSeen = 2.0, loadBar = 1.0,
      wasUnstable = true, quietRun = () => None)
    assert(noQuiet == (Right(3.0), false, false))
  }

  test("load-guard ERROR arm: a failure taken under load/steal gets one clean attempt") {
    // the BENCH_r16 failure mode: a steal burst pushed healthy d15
    // (3.7 s quiet) over the 120 s watchdog and the guard published the
    // phantom `failed=1` untouched — the worse distortion got the
    // weaker treatment. A clean success now REPLACES the error, counted
    // under `requiet`.
    val healed = Bench.requietPublish(Left("timeout>120s"), loadSeen = 9.9, loadBar = 1.0,
      wasUnstable = false, quietRun = () => Some(Right(3.7)))
    assert(healed == (Right(3.7), true, false))
    // an error-arm heal also clears a contention-induced unstable flag:
    // the clean run is the only trustworthy evidence and it says healthy
    val healedFlagged = Bench.requietPublish(Left("timeout>120s"), loadSeen = 4.0, loadBar = 1.0,
      wasUnstable = true, quietRun = () => Some(Right(2.0)))
    assert(healedFlagged == (Right(2.0), true, true))
    // the clean attempt failed too: the failure is CONFIRMED on quiet
    // hardware and publishes — counted, the budget was honestly spent
    val confirmed = Bench.requietPublish(Left("timeout>120s"), loadSeen = 9.9, loadBar = 1.0,
      wasUnstable = false, quietRun = () => Some(Left("timeout>120s")))
    assert(confirmed == (Left("timeout>120s"), true, false))
    // no clean run possible (budget spent / never re-quieted): the
    // failure stands uncounted, its load sample the evidence
    val noQuiet = Bench.requietPublish(Left("timeout>120s"), loadSeen = 9.9, loadBar = 1.0,
      wasUnstable = false, quietRun = () => None)
    assert(noQuiet == (Left("timeout>120s"), false, false))
    // a QUIET-machine failure is a real failure: no retry requested —
    // the error arm must not burn budget re-running genuine breakage
    var calls = 0
    val genuine = Bench.requietPublish(Left("AnalysisException: boom"), loadSeen = 0.3,
      loadBar = 1.0, wasUnstable = false, quietRun = () => { calls += 1; Some(Right(1.0)) })
    assert(genuine == (Left("AnalysisException: boom"), false, false) && calls == 0)
  }

  test("steal-aware watchdog: contended ticks don't consume the budget; the wall cap still kills") {
    // quiet tick: budget drains normally, no expiry mid-budget
    assert(Bench.watchdogTick(10000L, 0L, 2000L, load = 0.2, loadBar = 1.0,
      wallMs = 2000L, wallCapMs = 360000L) == (8000L, 0L, false))
    // contended tick: the clock PAUSES — budget untouched, pause recorded
    assert(Bench.watchdogTick(10000L, 0L, 2000L, load = 3.5, loadBar = 1.0,
      wallMs = 2000L, wallCapMs = 360000L) == (10000L, 2000L, false))
    // budget exhausted on a quiet tick: expire (a genuinely hung query)
    assert(Bench.watchdogTick(2000L, 4000L, 2000L, load = 0.1, loadBar = 1.0,
      wallMs = 8000L, wallCapMs = 360000L) == (0L, 4000L, true))
    // permanently contended machine: the wall cap expires the run even
    // with budget left — the pause is bounded, the artifact always lands
    assert(Bench.watchdogTick(10000L, 350000L, 2000L, load = 5.0, loadBar = 1.0,
      wallMs = 360000L, wallCapMs = 360000L) == (10000L, 352000L, true))
  }

  test("spread adjudication: a third run confirming the min clears the flag; a live spread keeps it") {
    // agreeing pair, no spread: no third run requested
    var calls = 0
    val agree = Bench.spreadPublish(2.0, 2.2, () => { calls += 1; Right(9.9) })
    assert(agree == (Right(2.0), false) && calls == 0)
    // sub-second wobble stays below the floor even at >2x
    val tiny = Bench.spreadPublish(0.3, 0.9, () => { calls += 1; Right(9.9) })
    assert(tiny == (Right(0.3), false) && calls == 0)
    // the d05 shape — lone cold first run, runs 2 and 3 agree at the
    // bottom: min published, NOT flagged (a reproduced steady-state
    // timing, the outlier absorbed one-time codegen/cache cost)
    val cold = Bench.spreadPublish(2.29, 1.09, () => Right(1.06))
    assert(cold == (Right(1.06), false))
    // live spread — third run lands away from the min: flag stands
    val live = Bench.spreadPublish(2.3, 1.0, () => Right(1.9))
    assert(live == (Right(1.0), true))
    // failed third run: failure published, flag stands
    val err = Bench.spreadPublish(2.3, 1.0, () => Left("boom"))
    assert(err == (Left("boom"), true))
  }

  test("convergence runs: a ramping min is chased to its floor, a steady one stops at one extra") {
    // the r19-driver d04 shape: runs still falling — both extra runs
    // spent, min of all published
    var seq = List(2.9, 1.4)
    val ramp = Bench.convergedMin(4.14, () => { val t = seq.head; seq = seq.tail; Right(t) })
    assert(ramp == 1.4, ramp.toString)
    // steady machine: first extra run lands inside the 15% band — stop,
    // exactly one extra run taken
    var calls = 0
    val steady = Bench.convergedMin(2.0, () => { calls += 1; Right(1.95) })
    assert(steady == 1.95 && calls == 1)
    // a slightly-slower extra run still stops the loop and never
    // degrades the published min
    val worse = Bench.convergedMin(2.0, () => Right(2.4))
    assert(worse == 2.0)
    // a failed extra run (or the caller's deadline sentinel) stops the
    // loop, published success intact
    val failed = Bench.convergedMin(3.0, () => Left("deadline"))
    assert(failed == 3.0)
  }

  test("requiet count and steal average ride the artifact and parse; absent when zero") {
    val runs = names.take(10).map(n => n -> (Right(2.5): Either[String, Double]))
    val line = Bench.renderLine(runs, Nil, (1.0, 2.0, 1L, 1L), 0.0, "sf0.1",
      requietCount = 3, stealCores = 2.37)
    val row = parse(line)
    assert(row.getAs[Long]("requiet") == 3, line)
    assert(math.abs(row.getAs[Double]("steal") - 2.4) < 0.01, line)
    val clean = Bench.renderLine(runs, Nil, (1.0, 2.0, 1L, 1L), 0.0, "sf0.1")
    assert(!clean.contains("requiet") && !clean.contains("steal"), clean)
  }

  test("the REAL suite's healthy line spells every slow timing; fast ones roll up") {
    // The registry outgrew full per-query maps (76 names alone overrun
    // the tail budget), so the scale-proof contract is: every SLOW
    // query — the ones a plan audit reads — keeps a spelled timing at
    // >= decisecond precision, the sub-threshold rest rolls up into
    // fast_n/fast_sec (nothing silently dropped: n + spelled = all),
    // the artifact parses, and unstable names survive a healthy run.
    // Timing mix approximates a real sf0.1 round (2/3 sub-second).
    val real = Queries.all.map(_.name)
    val runs = real.zipWithIndex.map { case (n, i) =>
      n -> (Right(if (i % 3 == 0) 2.345678 else 0.2123): Either[String, Double])
    }
    val slow = runs.collect { case (n, Right(t)) if t > 1 => n }
    val line = Bench.renderLine(runs, real.take(2),
      (1.25, 3.96, 126220L, 121148L), 0.0, "/root/testdata/sf0.1")
    assert(line.length <= TailBudget, s"${line.length} bytes for ${real.size} queries")
    val row = parse(line)
    assert(row.getAs[Long]("failed") == 0)
    val qs = row.getAs[org.apache.spark.sql.Row]("queries")
    slow.foreach(n => assert(math.abs(qs.getAs[Double](n) - 2.345678) < 0.06, n))
    assert(qs.schema.fieldNames.length + row.getAs[Long]("fast_n") == real.size,
      "spelled + rolled-up must cover every query")
    assert(math.abs(row.getAs[Double]("fast_sec") - (real.size - slow.size) * 0.2123) < 0.1)
    // headline total still sums ALL raw times, spelled or rolled
    assert(math.abs(row.getAs[Double]("value") -
      (slow.size * 2.345678 + (real.size - slow.size) * 0.2123)) < 0.001)
    assert(line.contains(s""""unstable":["${real.head}""""),
      "a healthy run keeps its unstable names once fast queries roll up")
  }

  test("unstable_detail: a flagged query's per-run [sec, guard] pairs ride the artifact; shed before names collapse") {
    // r17 verdict #6 + r18 verdict #1: a residual mark must be
    // adjudicable from the JSON line alone — and since r19 each raw run
    // carries its own guard sample, so a ramp ([3.2@0.2, 7.1@1.4,
    // 13.0@2.1] = rising co-tenant burst) is distinguishable from a
    // live regression ([2.1@0.1, 6.8@0.2] = quiet machine, real spread).
    val real = Queries.all.map(_.name)
    val runs = real.zipWithIndex.map { case (n, i) =>
      n -> (Right(if (i % 3 == 0) 2.345678 else 0.2123): Either[String, Double])
    }
    val flagged = real.head
    val line = Bench.renderLine(runs, Seq(flagged),
      (1.25, 3.96, 126220L, 121148L), 0.0, "/root/testdata/sf0.1",
      unstableRaw = Map(flagged -> Seq((6.30, 0.2), (2.21, 1.4), (3.14, 0.0)),
        "not_flagged" -> Seq((9.9, 9.9))))
    assert(line.length <= TailBudget, s"${line.length} bytes")
    val row = parse(line)
    val detail = row.getAs[org.apache.spark.sql.Row]("unstable_detail")
    // per-run [seconds, guard cores] pairs, 2-/1-decimal precision
    assert(detail.getSeq[scala.collection.Seq[Double]](detail.fieldIndex(flagged))
      .map(_.toSeq) == Seq(Seq(6.30, 0.2), Seq(2.21, 1.4), Seq(3.14, 0.0)), line)
    // raws for a query NOT in the flag list never render (evidence only
    // accompanies a standing mark)
    assert(detail.schema.fieldNames.toSeq == Seq(flagged), line)
    // back-compat: no raws provided -> no key at all
    assert(!Bench.renderLine(runs, Seq(flagged),
      (1.25, 3.96, 126220L, 121148L), 0.0, "sf0.1").contains("unstable_detail"))
    // catastrophic run: the clamp ladder sheds the detail BEFORE
    // unstable names collapse and long before error reasons — a
    // 63-failure artifact spends its budget on diagnosis, not raw runs
    val names63 = (1 to 63).map(i => f"q$i%02d_some_operator_name")
    val nasty = "org.apache.spark.SparkException: stage failure " + "y" * 200
    val failedRuns = names63.map(n => n -> (Left(nasty): Either[String, Double]))
    val clamped = Bench.renderLine(failedRuns, names63.take(5),
      (9.9, 9.9, 126220L, 121148L), 88.0, "/root/testdata/sf0.1",
      unstableRaw = names63.take(5).map(n => n -> Seq((1.0, 0.0), (9.0, 3.2), (9.1, 3.0))).toMap)
    assert(clamped.length <= TailBudget, s"${clamped.length} bytes")
    assert(!clamped.contains("unstable_detail"), clamped)
    val crow = parse(clamped)
    val spelled = crow.getAs[org.apache.spark.sql.Row]("errors")
      .schema.fieldNames.filter(_ != "_more")
    assert(spelled.length >= 4, s"error diagnosis lost to detail shedding: $clamped")
  }

  test("silent-loaded-min hole closed: unadjudicated loaded publishes are named with evidence") {
    // the decision itself (r18 verdict #1 — the e20 case: every run
    // consistently loaded, no spread, budget spent → previously
    // published silently)
    // quiet min: no mark
    assert(!Bench.minTakenLoaded(Right(0.3), Seq((0.3, 0.2), (0.31, 0.1)),
      loadSeen = 0.2, loadBar = 1.0, requieted = false))
    // THE e20 shape: all runs loaded, no quiet run ever adjudicated
    assert(Bench.minTakenLoaded(Right(6.1), Seq((6.1, 2.4), (6.3, 2.2)),
      loadSeen = 2.4, loadBar = 1.0, requieted = false))
    // loaded min but a quiet run landed within 2x — adjudicated, no mark
    // (the quiet run bounds the number; same 2x criterion requietPublish
    // uses to clear an unstable flag)
    assert(!Bench.minTakenLoaded(Right(3.0), Seq((3.0, 2.4), (5.5, 0.2)),
      loadSeen = 2.4, loadBar = 1.0, requieted = true))
    // loaded min and the only quiet run is FAR from it (>2x): the quiet
    // evidence contradicts the published min — mark stands
    assert(Bench.minTakenLoaded(Right(3.0), Seq((3.0, 2.4), (9.0, 0.2)),
      loadSeen = 2.4, loadBar = 1.0, requieted = true))
    // failure on a quiet machine: genuine breakage, not a loaded mark
    assert(!Bench.minTakenLoaded(Left("boom"), Nil, loadSeen = 0.2,
      loadBar = 1.0, requieted = false))
    // failure under load, unadjudicated: marked
    assert(Bench.minTakenLoaded(Left("timeout>120s"), Nil, loadSeen = 4.0,
      loadBar = 1.0, requieted = false))
    // failure under load but a clean attempt ran (confirm or heal): no mark
    assert(!Bench.minTakenLoaded(Left("timeout>120s"), Nil, loadSeen = 4.0,
      loadBar = 1.0, requieted = true))

    // the render: loaded names + their per-run evidence ride the line,
    // absent entirely when the list is empty
    val real = Queries.all.map(_.name)
    val runs = real.map(n => n -> (Right(0.2123): Either[String, Double]))
    val line = Bench.renderLine(runs, Nil, (1.0, 2.0, 1L, 1L), 0.0, "sf0.1",
      unstableRaw = Map(real.head -> Seq((6.1, 2.4), (6.3, 2.2))),
      loaded = Seq(real.head))
    assert(line.length <= TailBudget)
    val row = parse(line)
    assert(row.getSeq[String](row.fieldIndex("loaded")) == Seq(real.head), line)
    val detail = row.getAs[org.apache.spark.sql.Row]("unstable_detail")
    assert(detail.getSeq[scala.collection.Seq[Double]](detail.fieldIndex(real.head))
      .map(_.toSeq) == Seq(Seq(6.1, 2.4), Seq(6.3, 2.2)),
      "evidence must accompany a loaded mark even when not unstable")
    assert(!Bench.renderLine(runs, Nil, (1.0, 2.0, 1L, 1L), 0.0, "sf0.1")
      .contains("loaded"), "no loaded key on a clean run")
    // catastrophic clamp: loaded collapses to a count alongside
    // unstable_n, never silently dropped
    val names63 = (1 to 63).map(i => f"q$i%02d_some_operator_name")
    val nasty = "org.apache.spark.SparkException: stage failure " + "y" * 200
    val failedRuns = names63.map(n => n -> (Left(nasty): Either[String, Double]))
    val clamped = Bench.renderLine(failedRuns, names63.take(5),
      (9.9, 9.9, 126220L, 121148L), 88.0, "/root/testdata/sf0.1",
      loaded = names63.slice(5, 12))
    assert(clamped.length <= TailBudget)
    assert(parse(clamped).getAs[Long]("loaded_n") == 7, clamped)
  }

  test("cross-round drift tripwire: parse prior artifact, flag >2.5x movers, render the sibling file") {
    // parseQueryTimes round-trips renderLine's own output (spelled
    // timings recovered, -1 failure placeholders dropped, fast-rolled
    // queries absent)
    val runs: Seq[(String, Either[String, Double])] = Seq(
      "q01_slow" -> Right(5.4321), "q02_fast" -> Right(0.12),
      "q03_bad" -> Left("timeout>120s"), "q04_mid" -> Right(1.9876))
    val line = Bench.renderLine(runs, Nil, (1.0, 2.0, 1L, 1L), 0.0, "sf0.1")
    val parsed = Bench.parseQueryTimes(line)
    assert(math.abs(parsed("q01_slow") - 5.432) < 0.01, parsed.toString)
    assert(math.abs(parsed("q04_mid") - 1.988) < 0.01)
    assert(!parsed.contains("q03_bad"), "failure placeholders are not timings")
    // a 4-query line renders at full detail, so q02_fast is spelled here;
    // on a real-size line it rolls into fast_n and is simply absent —
    // the healthy-rung shape parseQueryTimes must handle:
    val rolled = """{"metric":"total","value":9.9,"unit":"sec","queries":""" +
      """{"q01_slow":5.4},"fast_n":3,"fast_sec":0.6,"errors":{},"failed":0,""" +
      """"unstable":[],"load":[1,1],"sf":0.1}"""
    assert(Bench.parseQueryTimes(rolled) == Map("q01_slow" -> 5.4))
    // garbage in, empty out — a truncated prior artifact must never
    // break the current round
    assert(Bench.parseQueryTimes("").isEmpty)
    assert(Bench.parseQueryTimes("""{"metric":"total","value":1}""").isEmpty)
    // the DRIVER'S wrapper form (r19 fix): BENCH_rNN.json carries the
    // artifact line as an escaped JSON string inside "tail" — the r19
    // baseline run silently skipped drift detection against BENCH_r18
    // because the escaped `\"queries\":{` never matched the raw marker
    val wrapped = """{"n": 18, "rc": 0, "tail": "[info] """ +
      line.replace("\\", "\\\\").replace("\"", "\\\"") + """\n"}"""
    val wparsed = Bench.parseQueryTimes(wrapped)
    assert(math.abs(wparsed("q01_slow") - 5.432) < 0.01, wparsed.toString)
    assert(!wparsed.contains("q03_bad"))
    // unescapeWrapper (ADVICE r19): \\ handled BEFORE \" — a backslash
    // in a query name or the tail must round-trip, not eat the next
    // quote; and it is the identity on a raw artifact line
    assert(Bench.unescapeWrapper("""pre \\ mid \" post""") == """pre \ mid " post""")
    assert(Bench.unescapeWrapper(line) eq line)
    val bsLine = """{"metric":"total","value":1.0,"unit":"sec","queries":""" +
      """{"q\\x":1.500},"errors":{},"failed":0,"unstable":[],"load":[1,1],"sf":0.1}"""
    val bsWrapped = """{"tail": "[info] """ +
      bsLine.replace("\\", "\\\\").replace("\"", "\\\"") + """\n"}"""
    assert(Bench.parseQueryTimes(bsWrapped) == Map("""q\\x""" -> 1.5),
      Bench.parseQueryTimes(bsWrapped).toString)

    // driftMovers: the r18 e-block shapes
    val prev = Map("q11_agg" -> 6.9, "e16_ddl" -> 3.1)
    val movers = Bench.driftMovers(prev, Seq(
      "q11_agg" -> 8.0,   // 1.16x: inside band, no flag
      "e16_ddl" -> 9.0,   // 2.9x: flagged
      "e20_default_fill" -> 6.1, // fast-rolled last round (prev<=0.3): flagged
      "e17_odata" -> 0.8, // sub-1s current: never flags (scheduler noise)
      "d01_exact" -> 0.2))
    assert(movers.map(m => (m._1, m._3)).toSet ==
      Set(("e16_ddl", 9.0), ("e20_default_fill", 6.1)), movers.toString)
    assert(movers.find(_._1 == "e20_default_fill").get._2 == 0.3,
      "fast-rolled prior stands in at the rollup threshold")
    // improvement never flags — that is the PRIOR round's contamination
    assert(Bench.driftMovers(Map("a" -> 9.0), Seq("a" -> 2.0)).isEmpty)

    // the sibling file parses and carries the guard evidence
    val drift = Bench.renderDrift("/root/repo/BENCH_r18.json",
      Seq(("e20_default_fill", 0.3, 6.1)),
      Map("e20_default_fill" -> Seq((6.1, 2.4), (6.3, 2.2))),
      loaded = Seq("e20_default_fill"), unstable = Nil)
    val drow = parse(drift)
    assert(drow.getAs[String]("prev") == "BENCH_r18.json")
    val mv = drow.getAs[org.apache.spark.sql.Row]("movers")
      .getAs[org.apache.spark.sql.Row]("e20_default_fill")
    assert(mv.getAs[Double]("cur") == 6.1 && mv.getAs[Boolean]("loaded"), drift)
    assert(mv.getSeq[scala.collection.Seq[Double]](mv.fieldIndex("runs"))
      .map(_.toSeq) == Seq(Seq(6.1, 2.4), Seq(6.3, 2.2)), drift)
    // drift count rides the artifact line; absent when zero
    val flaggedLine = Bench.renderLine(runs, Nil, (1.0, 2.0, 1L, 1L), 0.0, "sf0.1",
      driftCount = 2)
    assert(parse(flaggedLine).getAs[Long]("drift") == 2)
    assert(!line.contains("drift"))
  }

  test("worst case: 60 failures with hostile text still parse under the cap") {
    val nasty = "java.lang.RuntimeException: \"quoted\"\\backslash\n" + "x" * 300
    val runs = names.map(n => n -> (Left(nasty): Either[String, Double]))
    val line = Bench.renderLine(runs, Nil, (9.9, 9.9, 1L, 1L), 88.0, "/weird dir/no-sf")
    assert(line.length <= TailBudget, s"${line.length} bytes — would truncate the artifact")
    val row = parse(line)
    assert(row.getAs[Long]("failed") == 60)
    // error detail self-clamps (≤8 spelled out, fewer if the line would
    // blow the cap) and the remainder is counted — nothing silently lost
    val errs = row.getAs[org.apache.spark.sql.Row]("errors")
    val spelled = errs.schema.fieldNames.count(_ != "_more")
    assert(spelled <= 8)
    assert(spelled + errs.getAs[Long]("_more") == 60)
    // non-sf dir is quoted, not dropped
    assert(row.getAs[String]("sf") == "/weird dir/no-sf")
    assert(row.getAs[Long]("wait") == 88L)
  }

  test("catastrophic run: 63 failures still spell >=4 error reasons under the cap") {
    // the round-7 regression: a full-suite failure rendered
    // `"errors":{"_more":14}` — zero diagnosis. The shedding ladder must
    // sacrifice the unstable array / load detail / error-text length
    // before error COUNT, with a floor of 4 named failures.
    val names63 = (1 to 63).map(i => f"q$i%02d_some_operator_name")
    val nasty = "org.apache.spark.SparkException: Job aborted due to stage failure: " + "y" * 200
    val runs = names63.map(n => n -> (Left(nasty): Either[String, Double]))
    val line = Bench.renderLine(runs,
      names63.take(5), (9.9, 9.9, 126220L, 121148L), 88.0, "/root/testdata/sf0.1")
    assert(line.length <= TailBudget, s"${line.length} bytes — would truncate the artifact")
    val row = parse(line)
    assert(row.getAs[Long]("failed") == 63)
    val errs = row.getAs[org.apache.spark.sql.Row]("errors")
    val spelled = errs.schema.fieldNames.filter(_ != "_more")
    assert(spelled.length >= 4,
      s"only ${spelled.length} error entries survived the clamp: $line")
    // each surviving entry still carries non-empty reason text
    spelled.foreach(k => assert(errs.getAs[String](k).nonEmpty))
    assert(spelled.length + errs.getAs[Long]("_more") == 63)
  }

  test("round-7 shape: 49 ok + 14 failed + 10 unstable still names >=4 failures") {
    val names63 = (1 to 63).map(i => f"q$i%02d_some_operator_name")
    val runs: Seq[(String, Either[String, Double])] = names63.zipWithIndex.map {
      case (n, i) if i < 14 => n -> Left("SchemaColumnConvertNotSupportedException: column ts " + "z" * 100)
      case (n, _) => n -> Right(7.6543210)
    }
    val line = Bench.renderLine(runs, names63.slice(20, 30),
      (4.5, 4.4, 126220L, 121148L), 0.0, "/root/testdata/sf0.1")
    assert(line.length <= TailBudget, s"${line.length} bytes")
    val row = parse(line)
    assert(row.getAs[Long]("failed") == 14)
    val errs = row.getAs[org.apache.spark.sql.Row]("errors")
    val spelled = errs.schema.fieldNames.filter(_ != "_more")
    assert(spelled.length >= 4, s"only ${spelled.length} reasons: $line")
    spelled.foreach(k => assert(errs.getAs[String](k).nonEmpty))
    // successful timings survive whatever sheds, at >=0.1s precision
    val qs = row.getAs[org.apache.spark.sql.Row]("queries")
    assert(math.abs(qs.getAs[Double]("q63_some_operator_name") - 7.654) < 0.06)
  }

  test("mixed run: failures are -1 in queries, successes keep timings") {
    val runs: Seq[(String, Either[String, Double])] = Seq(
      "a_ok" -> Right(2.5), "b_bad" -> Left("timeout>120s"), "c_ok" -> Right(0.001))
    val row = parse(Bench.renderLine(runs, Nil, (0, 0, 0L, 0L), 0.0, "sf0.01"))
    val qs = row.getAs[org.apache.spark.sql.Row]("queries")
    assert(qs.getAs[Double]("a_ok") == 2.5)
    assert(qs.getAs[Long]("b_bad") == -1)
    assert(row.getAs[Long]("failed") == 1)
    assert(row.getAs[org.apache.spark.sql.Row]("errors").getAs[String]("b_bad") == "timeout>120s")
  }
}
