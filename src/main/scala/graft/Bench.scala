package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Benchmark main: runs every judged query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with total + per-query seconds, plus per-query
  * executor TASK time and in-task GC time ("task"/"gc" maps).
  *
  * The task-time column exists because wall time on a shared host
  * carries a ±2× noise band (BENCH_NOTES.md round-7 characterization):
  * the SUM of executor task run time is what the PLAN costs, and its
  * minimum across decorrelated runs is the only statistic that moves
  * on a genuine plan regression — round-over-round deltas are
  * adjudicated from this committed column, not ad-hoc reruns.
  *
  * Execution is forced through the `noop` sink rather than `.count()`:
  * count() lets Catalyst prune every non-output column and skip
  * result-row materialization, which would under-measure projection-
  * and sort-heavy queries.
  *
  * == Protocol (revised round 13) ==
  * The round-12 suite (833 queries × [1 warm + 2 timed executions +
  * 4 listener drains]) no longer fit the driver's wall-clock window
  * (BENCH_r12.json: rc 124, killed mid-suite). The fixed cost is cut
  * without giving up the decorrelated-min discipline:
  *
  *  - Warm-up is FOLDED into the first timed run: every execution is
  *    timed, so each query pays exactly 2 executions, BACK TO BACK —
  *    run 1 cold (planning + codegen + operator-pinned cache builds),
  *    run 2 warm with those caches still live, then the caches are
  *    released. The reported number is the MIN of the two; it comes
  *    from the warm run, which matches what the old protocol's timed
  *    runs measured (they always followed an untimed warm-up), so
  *    round-over-round per-query comparability is preserved. (A
  *    suite-wide two-pass variant was tried first and rejected by its
  *    own record: releasing caches between passes made BOTH timed runs
  *    pay the cache builds, inflating every pin-heavy operator —
  *    x206 recorded 7.4s wall against a 2.9s isolated reality.)
  *  - ONE listener drain per timed execution (after it), not two: the
  *    previous execution's post-drain already guarantees a quiet bus at
  *    the next reset, because no untimed execution happens in between
  *    any more.
  *  - Host-stall decorrelation is reserved for the TOP-10 tail (by min
  *    wall, among those > 2s; was 20 before the r14 p2b pass existed):
  *    those re-run once more at suite end, minutes after their first
  *    runs, and the min is kept. For the sub-second bulk, back-to-back
  *    min-of-2 clips the common stall shapes and the task column
  *    adjudicates the rest.
  *  - A cumulative-elapsed line is logged per timing
  *    ("[bench] t=123.4s p1 x206_ppjoin wall=9.71"), so any future
  *    kill is attributable to a specific query from the driver tail.
  *  - A DEADLINE (SPARK_GRAFT_BENCH_DEADLINE_SEC, default 2400s of
  *    Bench-main elapsed — the driver window minus sbt/compile/session
  *    slack) degrades the suite instead of letting the harness kill it:
  *    on breach, remaining pass-2 timings are skipped (their pass-1
  *    cold numbers stand) and pass 3 is dropped. The record is ALWAYS
  *    written and printed; it carries a GLOBAL "degraded" flag plus
  *    "degraded_n" and "degraded_from" — the degraded set is an
  *    alphabetic suffix of the catalog, so count + first name identify
  *    exactly which entries are one-sample cold numbers. A degraded
  *    record must never be cited as a round's closing number
  *    (BENCH_NOTES protocol).
  *
  * == Round-14 revisions ==
  *  - Queries whose WARM wall exceeds 2s get a SECOND warm execution
  *    (p2b) back to back, so their reported number is min-of-2-warm
  *    again (the r12 discipline). Round 13's single-warm-sample
  *    protocol upper-biased the heavy tail on a noisy host and
  *    produced unadjudicable movers. The warm-wall gate keeps the tail
  *    at ~60 genuinely-heavy queries (a cold-wall gate caught 151 —
  *    planning + codegen — and blew the window); p2b also stops past
  *    85% of the deadline so the alphabetic suffix never degrades to
  *    cold-only just to buy third samples.
  *  - After the full record line (~68KB — it can never fit the
  *    driver's ~2KB stdout-tail capture), a second TINY line is printed
  *    last: totals + top-10-by-wall queries + a pointer to the full
  *    record file. The driver tail always ends with parseable JSON.
  */
object Bench {
  private case class Timing(wall: Double, task: Double, gc: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "2400").toDouble
    val mainT0 = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - mainT0) / 1e9
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new LongAdder; val gcMs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { taskMs.add(m.executorRunTime); gcMs.add(m.jvmGCTime) }
      }
    })
    // listener events post asynchronously and the bus-drain API is
    // private[spark]: wait until the adders hold still for TWO
    // consecutive 25ms windows — a single dispatch stall or GC pause
    // longer than one window cannot fake quiescence, it would have to
    // straddle both checks exactly. Runs OUTSIDE the timed span, so
    // wall numbers are unaffected. Hard cap: if a query leaves a job
    // posting task-end events continuously (or the bus wedges), give up
    // after ~5s rather than hang the suite — the affected query's
    // task/gc numbers may then be slightly incomplete (logged, not
    // fatal).
    def drainListener(): Unit = {
      var prev = taskMs.sum + gcMs.sum
      var quietRuns = 0
      var waitedMs = 0
      while (quietRuns < 2 && waitedMs < 5000) {
        Thread.sleep(25)
        waitedMs += 25
        val cur = taskMs.sum + gcMs.sum
        quietRuns = if (cur == prev) quietRuns + 1 else 0
        prev = cur
      }
      if (quietRuns < 2)
        System.err.println(
          "[bench] listener drain capped at 5s; task/gc for the " +
            "preceding query may be incomplete")
    }
    // Warm the JVM + register views once so per-query numbers measure the
    // queries, not session bring-up (first action pays codegen warm-up).
    Tables.registerAll(spark, sfDir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    drainListener() // quiet bus before the first reset

    // One timed execution: reset adders (bus is quiet — the previous
    // timing's post-drain guarantees it), run through the noop sink,
    // drain, record. `release` controls whether operator-pinned caches
    // are dropped afterwards: run 1 of a query keeps them (run 2 must
    // measure the warm plan, like the old protocol's timed runs did);
    // the query's LAST run releases them so nothing accumulates across
    // the suite (cross-query cache build-up turns into storage-pool
    // pressure + GC stalls that land on unrelated queries).
    def timedOnce(name: String, pass: String,
                  fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                  release: Boolean)
        : Timing = {
      try {
        taskMs.reset(); gcMs.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        drainListener()
        System.err.println(
          f"[bench] t=${elapsed()}%.1fs $pass $name wall=$wall%.3f")
        Timing(wall, taskMs.sum / 1e3, gcMs.sum / 1e3)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Timing(-1.0, -1.0, -1.0)
      } finally {
        if (release) graft.ext.CacheRegistry.clearAll()
      }
    }
    // min wall across runs (what a user feels) and, independently, the
    // min-task run's (task, gc) (what the plan costs — the adjudicable
    // column): a wall spike and a task spike rarely coincide, so the
    // two minima may come from different runs by design
    def merge(a: Timing, b: Timing): Timing = {
      if (a.wall < 0) b
      else if (b.wall < 0) a
      else {
        val (t, g) = if (b.task >= 0 && (a.task < 0 || b.task < a.task))
          (b.task, b.gc) else (a.task, a.gc)
        Timing(math.min(a.wall, b.wall), t, g)
      }
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // Per query, back to back: run 1 cold (keeps its caches), run 2
    // warm (releases them); per-query value = min of the two. On
    // deadline breach remaining queries get ONE cold run each
    // (flagged "degraded":true) — a one-sample cold number beats a
    // missing record.
    var degraded = false
    val degradedQs = scala.collection.mutable.ArrayBuffer[String]()
    val p12 = names.map { case (n, fn) =>
      if (elapsed() > deadlineSec) {
        if (!degraded) System.err.println(
          f"[bench] deadline ${deadlineSec}%.0fs hit at t=${elapsed()}%.1fs" +
            " — remaining queries get one cold run each")
        degraded = true
        degradedQs += n
        n -> timedOnce(n, "p1", fn, release = true)
      } else {
        val a = timedOnce(n, "p1", fn, release = false)
        // round-14: the heavy tail gets TWO warm samples (min-of-2-warm,
        // the r12 discipline) — one warm sample is upper-biased on a
        // noisy host and round 13's unadjudicated movers all sat in
        // this tail. Tail membership is decided on the WARM wall (the
        // first cut gated on the COLD p1 wall, which carries planning +
        // codegen — it tripled the tail to 151 queries and blew the
        // window). The extra sample also stops past 85% of the
        // deadline: finishing every query's p1+p2 beats a third sample
        // — a degraded cold-only suffix costs more than the bias.
        val b = timedOnce(n, "p2", fn, release = false)
        val t0 = merge(a, b)
        if (b.wall > 2.0 && elapsed() <= 0.85 * deadlineSec) {
          n -> merge(t0, timedOnce(n, "p2b", fn, release = true))
        } else {
          graft.ext.CacheRegistry.clearAll()
          n -> t0
        }
      }
    }.toMap
    // decorrelated third look, capped at the TOP-10 tail (was 20 —
    // the r14 p2b pass already gives every >2s-warm query a second
    // back-to-back warm sample, so p3's remaining job is only the
    // minutes-later DECORRELATED look at the very top): the host shows
    // transient multi-second stall windows (same query: ~1s in
    // isolation, 10-40s mid-suite, a DIFFERENT query each run); a
    // back-to-back pair can land inside one, a re-run minutes later
    // cannot. Each p3 timing re-checks the deadline so this pass can
    // never push a near-deadline run past the driver's window.
    val slow = p12.toSeq.filter(_._2.wall > 2.0)
      .sortBy(-_._2.wall).take(10).map(_._1).toSet
    val p3 =
      if (degraded || elapsed() > deadlineSec) Map.empty[String, Timing]
      else names.filter(q => slow.contains(q._1))
        .flatMap { case (n, fn) =>
          if (elapsed() > deadlineSec) None
          else Some(n -> timedOnce(n, "p3", fn, release = true))
        }
        .toMap
    val results = p12.map { case (name, t) =>
      name -> merge(t, p3.getOrElse(name, Timing(-1, -1, -1)))
    }
    def jmap(f: Timing => Double): String = results
      .map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val qs = jmap(_.wall)
    val total = results.map(_._2.wall).sum
    val totalTask = results.map(_._2.task).filter(_ > 0).sum
    // per-query degraded attribution (the global flag alone cannot say
    // which entries are one-sample cold numbers): count + first name —
    // the degraded set is always an alphabetic suffix of the catalog,
    // so (n, from) identifies it exactly without a 100-name list
    val degradedInfo =
      s""""degraded":$degraded,"degraded_n":${degradedQs.size}""" +
        degradedQs.headOption.map(n => s""","degraded_from":"$n"""")
          .getOrElse("")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""task":${jmap(_.task)},"gc":${jmap(_.gc)},""" +
        s""""task_total":$totalTask,$degradedInfo,"sf":"$sfDir"}"""
    // The full record is ~68KB (three per-query maps over 900+ queries)
    // and can structurally never fit the driver's ~2KB stdout-tail
    // capture — so a second, tiny, total-only line (top-10-by-wall
    // queries only) is printed LAST; whatever tail size the driver
    // keeps, it ends with parseable JSON. The full record remains the
    // adjudication source (bench_out.json).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val top10 = results.toSeq.sortBy(-_._2.wall).take(10)
      .map { case (k, v) => "\"" + k + "\":" + v.wall }
      .mkString("{", ",", "}")
    val tinyJson =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},""" +
        s""""task_total":$totalTask,$degradedInfo,"sf":"$sfDir",""" +
        s""""queries":$top10,"full_record":"$outPath"}"""
    // Round 1 the driver failed to parse this line out of interleaved sbt/
    // log4j stdout ("parsed": null). Belt and braces now: (a) persist the
    // JSON to a file (SPARK_GRAFT_BENCH_OUT, default bench_out.json in the
    // repo cwd), (b) print it AFTER spark.stop() so no executor/log output
    // can interleave, framed by blank lines, and flush.
    // Written ATOMICALLY (temp file + rename) so a killed or crashing
    // run can never leave a half-written record: bench_out.json either
    // holds a complete run or the previous one. The committed file is
    // the single source of truth for the closing number — any recorded
    // total must be read FROM it, never transcribed from the console
    // (round-3/4 drift: cited totals disagreed with the tree's file).
    try {
      val target = java.nio.file.Paths.get(outPath)
      val dir = Option(target.toAbsolutePath.getParent)
        .getOrElse(java.nio.file.Paths.get("."))
      val tmp = java.nio.file.Files.createTempFile(dir, ".bench_out", ".tmp")
      java.nio.file.Files.write(tmp, (json + "\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    System.out.println()
    System.out.println(json)
    System.out.println(tinyJson)
    System.out.flush()
  }
}
