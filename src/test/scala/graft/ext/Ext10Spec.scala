package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 operator invariants: hand-computed fixtures and degenerate
  * branches for the four profiling operators judged as x320–x323. */
class Ext10Spec extends SparkSpec {

  // ---- classBalance --------------------------------------------------

  test("classBalance: hand-computed effective classes and imbalance") {
    import spark.implicits._
    // labels a*4, b*2, c*2: n=8, sumsq=24 -> eff = 8*8*1000 div 24 = 2666
    // imbalance = 4*1000 div 2 = 2000
    val df = Seq("a", "a", "a", "a", "b", "b", "c", "c").toDF("label")
    val r = Profile.classBalance(df).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((8L, 3L, 2666L, 4L, 2L, 2000L)),
      r.toString)
  }

  test("classBalance: perfectly balanced set has eff_classes_milli == n_classes * 1000") {
    import spark.implicits._
    val df = (0 until 60).map(i => s"c${i % 5}").toDF("label")
    val r = Profile.classBalance(df).collect().head
    assert(r.getLong(2) == 5000L && r.getLong(5) == 1000L, r.toString)
  }

  // ---- vocabDivergence -----------------------------------------------

  test("vocabDivergence: hand-computed whole-bit surprise on a two-source fixture") {
    import spark.implicits._
    // s1 = "a a b" (a:2 b:1), s2 = "a"; corpus a:3 b:1, n_tot=4
    // flog2: 4->2, 3->1, 2->1, 1->0
    // s1 cross = 2*(2-1) + 1*(2-0) = 4, self = 2*(1-1) + 1*(1-0) = 1
    // s2 cross = 1*(2-1) = 1, self = 1*(0-0) = 0
    val docs = Seq((1L, "a a b", "s1"), (2L, "a", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextStats.vocabDivergence(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(("s1", 3L, 4L, 1L, 3L, 1000L),
      ("s2", 1L, 1L, 0L, 1L, 1000L)), out.toString)
  }

  test("vocabDivergence: a single-source corpus has zero divergence") {
    import spark.implicits._
    val docs = Seq((1L, "x y z x", "only"), (2L, "y q", "only"))
      .toDF("doc_id", "text", "source")
    val r = TextStats.vocabDivergence(docs).collect().head
    // n_s == n_tot and c == cc per word -> cross_bits == self_bits
    assert(r.getLong(2) == r.getLong(3) && r.getLong(4) == 0L, r.toString)
  }

  // ---- dispersionIndex -----------------------------------------------

  test("dispersionIndex: steady group scores 0, bursty group hand-computed") {
    import spark.implicits._
    // A: 2 events each on days 0 and 1 -> variance 0 over the 2-day
    // span. B: 3 events on day 0 only -> (2*9-9)*1000 div (2*3) = 1500
    val df = Seq(
      ("A", "2024-01-01 00:00:00"), ("A", "2024-01-01 05:00:00"),
      ("A", "2024-01-02 00:00:00"), ("A", "2024-01-02 05:00:00"),
      ("B", "2024-01-01 01:00:00"), ("B", "2024-01-01 02:00:00"),
      ("B", "2024-01-01 03:00:00"))
      .toDF("event_type", "ts0")
      .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
    val out = TimeSeries.dispersionIndex(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(("A", 2L, 2L, 4L, 0L), ("B", 2L, 1L, 3L, 1500L)),
      out.toString)
  }

  // ---- interArrival --------------------------------------------------

  test("interArrival: hand-computed gaps, discrete median/p90 semantics") {
    import spark.implicits._
    // user 1 type t at 0s/10s/30s -> gaps {10, 20}: med = 10
    // (smallest value with cume_dist >= 0.5), p90 = 20, max = 20.
    // user 2 contributes one event -> no gap. NULL user dropped.
    val base = 1700000000L
    val df = Seq(
      (1L, Option(1L), base), (2L, Option(1L), base + 10),
      (3L, Option(1L), base + 30), (4L, Option(2L), base + 99),
      (5L, Option.empty[Long], base + 7))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"),
        lit("t").as("event_type"))
    val out = TimeSeries.interArrival(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(("t", 2L, 10L, 20L, 20L)), out.toString)
  }

  // ---- tCloseness ----------------------------------------------------

  test("tCloseness: hand-computed ordered EMD on a two-class fixture") {
    import spark.implicits._
    // global: v=1 x2, v=2 x2, v=3 x1 (n=5, m=3)
    // class A = {1,1,2}: steps |2*5-2*3| + |3*5-4*3| + 0 = 7
    //   -> 7e6 div (3*5*2) = 233333
    // class B = {2,3}:   steps |0-2*2| + |1*5-4*2| + 0 = 7
    //   -> 7e6 div (2*5*2) = 350000
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("grp", "v")
    val out = Privacy.tCloseness(df, "grp", col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("A", 3L, 233333L), ("B", 2L, 350000L)), out.toString)
  }

  test("tCloseness: a class matching the global distribution scores 0") {
    import spark.implicits._
    // both classes identically distributed -> EMD 0 for each
    val df = (0 until 40).map(i => (if (i % 2 == 0) "p" else "q",
      (i / 2 % 4).toLong)).toDF("grp", "v")
    Privacy.tCloseness(df, "grp", col("v")).collect()
      .foreach(r => assert(r.getLong(2) == 0L, r.toString))
  }

  // ---- contributionBounds --------------------------------------------

  test("contributionBounds: discrete p99 clamp and exact excess") {
    import spark.implicits._
    // users 1..100 contribute i rows each: p99 = 99 (smallest value
    // with cume_dist >= .99), excess = (100-99) = 1, n_rows = 5050
    val df = (1 to 100).flatMap(i => Seq.fill(i)(("X", i.toLong)))
      .toDF("cell", "user")
    val r = Privacy.contributionBounds(df, "cell", "user").collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      (("X", 5050L, 100L, 100L, 99L, 1L, 198L)), r.toString)
  }

  // ---- autocorrDaily -------------------------------------------------

  test("autocorrDaily: hand-computed lags with an unmaterialized zero day; constant series yields NULL") {
    import spark.implicits._
    // group B: 1 event on day 0, 2 events on day 2 (day 1 silent);
    // group A: 2 events on each of days 0,1,2 -> zero variance -> NULL
    val mk = (g: String, day: Int, n: Int) =>
      Seq.fill(n)((g, s"2024-01-0${day + 1} 12:00:00"))
    val df = (mk("A", 0, 2) ++ mk("A", 1, 2) ++ mk("A", 2, 2) ++
      mk("B", 0, 1) ++ mk("B", 2, 2))
      .toDF("event_type", "ts0")
      .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
    val out = TimeSeries.autocorrDaily(df, maxLag = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))))
      .toSeq
    // B lag1: num = 9*0 - 3*3*(1+2) + 2*9 = -9, den = 9*5 - 3*9 = 18
    //   -> -9000 div 18 = -500
    // B lag2: num = 9*2 - 27 + 9 = 0 -> 0
    assert(out == Seq(("A", 1L, 2L, null), ("A", 2L, 1L, null),
      ("B", 1L, 2L, java.lang.Long.valueOf(-500L)),
      ("B", 2L, 1L, java.lang.Long.valueOf(0L))), out.toString)
  }

  // ---- charClassProfile ----------------------------------------------

  test("charClassProfile: hand-counted classes") {
    import spark.implicits._
    val docs = Seq((1L, "Ab1 c", "s")).toDF("doc_id", "text", "source")
    val r = TextStats.charClassProfile(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((1L, 5L, 400000L, 200000L, 200000L, 200000L, 0L)), r.toString)
  }

  // ---- kCoreTrajectory -----------------------------------------------

  test("kCoreTrajectory: a path graph cascades one layer per round at k=2") {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Graph.kCoreTrajectory(edges, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // round 1 peels the endpoints a,e; round 2 peels b,d leaving c
    // with no surviving arc; round 3 stays empty (converged)
    assert(out == Seq((1L, 3L, 4L), (2L, 0L, 0L), (3L, 0L, 0L)),
      out.toString)
  }

  test("kCoreTrajectory: one-orientation input symmetrized internally") {
    import spark.implicits._
    // canonical lo<hi edges only — internal union+distinct must give
    // the same trajectory as the pre-symmetrized list above
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val out = Graph.kCoreTrajectory(edges, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 4L), (2L, 0L, 0L), (3L, 0L, 0L)),
      out.toString)
  }

  // ---- zipfAudit -----------------------------------------------------

  test("zipfAudit: power-of-two ranks, deterministic ties, whole-bit drops") {
    import spark.implicits._
    // freqs: a:8 b:4 c:4 d:2 e:1 -> ranks a1 b2 c3 d4 e5 (tie b<c)
    val docs = Seq((1L, ("a " * 8) + ("b " * 4) + ("c " * 4) + "d d e"))
      .toDF("doc_id", "text")
    val out = TextStats.zipfAudit(docs, maxDoubling = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4))))
      .toSeq
    assert(out == Seq(
      (1L, "a", 8L, 3L, null),
      (2L, "b", 4L, 2L, java.lang.Long.valueOf(1L)),
      (4L, "d", 2L, 1L, java.lang.Long.valueOf(1L))), out.toString)
  }

  // ---- boundaryOverlap -----------------------------------------------

  test("boundaryOverlap: tail-head gram pairs found; self and short docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t"),   // tail "r s t"
      (2L, "r s t x y"),   // head "r s t" -> pair (1, 2)
      (3L, "m m m m"),     // head == own tail -> self excluded
      (4L, "a b")          // < 3 tokens -> dropped
    ).toDF("doc_id", "text")
    val out = Dedup.boundaryOverlap(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 2L, "r s t")), out.toString)
  }

  // ---- trimmedMean ---------------------------------------------------

  test("trimmedMean: hand-computed band overlap, ties straddling the cut") {
    import spark.implicits._
    // g1: 1..10, trim 10% -> t=1, keep 2..9: sum 44, mean_x100 550
    // g2: {1,1,1,2,3}, trim 20% -> t=1, kept multiset {1,1,2}:
    //   sum 4, mean_x100 = 400 div 3 = 133
    val df = ((1 to 10).map(v => ("g1", v.toLong)) ++
      Seq(("g2", 1L), ("g2", 1L), ("g2", 1L), ("g2", 2L), ("g2", 3L)))
      .toDF("grp", "v")
    val t10 = Profile.trimmedMean(df.where(col("grp") === "g1"), "grp",
      col("v"), 10).collect().head
    assert((t10.getLong(1), t10.getLong(2), t10.getLong(3),
      t10.getLong(4)) == ((10L, 8L, 44L, 550L)), t10.toString)
    val t20 = Profile.trimmedMean(df.where(col("grp") === "g2"), "grp",
      col("v"), 20).collect().head
    assert((t20.getLong(1), t20.getLong(2), t20.getLong(3),
      t20.getLong(4)) == ((5L, 3L, 4L, 133L)), t20.toString)
  }

  // ---- hourEntropy ---------------------------------------------------

  test("hourEntropy: spike scores 0 bits, uniform 4 hours scores exactly 2 bits") {
    import spark.implicits._
    val mk = (g: String, h: Int) => (g, f"2024-01-01 $h%02d:30:00")
    val df = (Seq.fill(5)(mk("spike", 9)) ++
      (1 to 4).map(h => mk("flat", h)))
      .toDF("event_type", "ts0")
      .select(col("event_type"), col("ts0").cast("timestamp").as("ts"))
    val out = TimeSeries.hourEntropy(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(("flat", 4L, 2000L, 1L, 250000L),
      ("spike", 5L, 0L, 9L, 1000000L)), out.toString)
  }

  // ---- oovCurve ------------------------------------------------------

  test("oovCurve: exact OOV mass at power-of-two vocab sizes") {
    import spark.implicits._
    // freqs a:8 b:4 c:4 d:2 e:1, total 19
    val docs = Seq((1L, ("a " * 8) + ("b " * 4) + ("c " * 4) + "d d e"))
      .toDF("doc_id", "text")
    val out = TextStats.oovCurve(docs, maxDoubling = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq((1L, 8L, 11L, 578947L), (2L, 12L, 7L, 368421L),
      (4L, 18L, 1L, 52631L)), out.toString)
  }

  // ---- dupByLengthDecile ---------------------------------------------

  test("dupByLengthDecile: dup mass lands in the right rank-free deciles") {
    import spark.implicits._
    // 12 docs: length 10 and 20 are exact-dup pairs, 30..100 unique
    val texts = Seq("x" * 10, "x" * 10, "y" * 20, "y" * 20) ++
      (3 to 10).map(i => (("z" + i.toString) * (i * 10)).take(i * 10))
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val out = Curation.dupByLengthDecile(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // len 10: cum_before 0 -> decile 0 (2 dup docs); len 20:
    // cum_before 2 -> decile 1 (2 dup docs); singles spread beyond
    assert(out.take(2) == Seq((0L, 2L, 2L, 1000000L),
      (1L, 2L, 2L, 1000000L)), out.toString)
    assert(out.drop(2).forall(r => r._3 == 0L && r._4 == 0L), out.toString)
    assert(out.map(_._2).sum == 12L, out.toString)
  }

  // ---- kmvDistinct ---------------------------------------------------

  test("kmvDistinct: exact branch under k; estimator matches a brute-force k-th hash") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    // group small: 3 distinct keys < k=4 -> est == exact, err 0
    // group big: 100 keys, k=4 -> est = 3 * 2^32 div v4
    val df = ((1 to 3).map(i => ("small", i.toLong)) ++
      (1 to 100).map(i => ("big", i.toLong))).toDF("grp", "key")
    val out = Profile.kmvDistinct(df, "grp", "key", 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val small = out("small")
    assert(small == ((3L, 3L, 0L, 3L, 0L)), small.toString)
    val v4 = (1 to 100).map(i => md5hex(i.toString)).sorted.apply(3)
    val vk = java.lang.Long.parseLong(v4.take(8), 16)
    val est = 3L * 4294967296L / vk
    val big = out("big")
    assert(big == ((100L, 4L, vk, est,
      math.abs(est - 100L) * 1000000L / 100L)), big.toString)
  }

  // ---- rangeBoundaries -----------------------------------------------

  test("rangeBoundaries: uniform 1..80 splits into four exact quarters") {
    import spark.implicits._
    val df = (1 to 80).map(_.toLong).toDF("x")
    val out = graft.ext.Layout.rangeBoundaries(df, col("x"), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq((0L, 1L, 20L, 20L, 1000L), (1L, 21L, 40L, 20L, 1000L),
      (2L, 41L, 60L, 20L, 1000L), (3L, 61L, 80L, 20L, 1000L)),
      out.toString)
  }

  test("rangeBoundaries: a hot value overloads exactly one partition and the census shows it") {
    import spark.implicits._
    // 60 copies of value 5 + 1..20 -> the cut values collapse around 5
    val df = (Seq.fill(60)(5L) ++ (1L to 20L)).toDF("x")
    val out = graft.ext.Layout.rangeBoundaries(df, col("x"), 4).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(out.map(_._2).sum == 80L, out.toString)
    assert(out.exists(_._3 > 2000L), s"no overloaded partition: $out")
  }

  // ---- coverageFloorSample -------------------------------------------

  test("coverageFloorSample: every cell represented, target met, deterministic") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      (i.toLong, s"s${i % 3}", if (i % 7 == 0) "rare" else "en")
    }.toDF("doc_id", "source", "lang")
    def run() = Sampling.coverageFloorSample(docs, 2, 20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    val out = run()
    assert(out.length == 20, out.length.toString)
    val cells = docs.select("source", "lang").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val covered = out.map(p => (p._2, p._3)).toSet
    assert(cells == covered, s"missing cells: ${cells -- covered}")
    // each cell contributes at least min(2, |cell|) floor picks
    val floorPerCell = out.filter(_._4 == "floor")
      .groupBy(p => (p._2, p._3)).view.mapValues(_.size).toMap
    assert(floorPerCell.values.forall(_ <= 2) &&
      cells.forall(c => floorPerCell.getOrElse(c, 0) >= 1), out.toString)
    assert(run() == out) // pure function of the corpus
  }

  // ---- nearDupTransitivity -------------------------------------------

  test("nearDupTransitivity: agrees with a brute-force wedge count on real docs") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.simhashNearDups60(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = (pairs.toSeq ++ pairs.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val wedges = adj.toSeq.flatMap { case (_, ns) =>
      for (b <- ns; c <- ns if b < c) yield (b, c)
    }
    val nClosed = wedges.count(w => pairs.contains(w))
    val r = Dedup.nearDupTransitivity(docs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((pairs.size.toLong, wedges.size.toLong, nClosed.toLong)), r.toString)
    graft.ext.CacheRegistry.clearAll()
  }

  // ---- asofNearest ---------------------------------------------------

  test("asofNearest: direction choice, past-tie, and no-match drop") {
    import spark.implicits._
    val left = Seq((1L, 1L, 90L), (2L, 1L, 150L), (3L, 1L, 160L),
      (4L, 1L, 210L), (5L, 2L, 500L)).toDF("id", "k", "t")
    val right = Seq((1L, 100L, "r100"), (1L, 200L, "r200"))
      .toDF("k", "t", "p")
    val out = AsofJoin.asofNearest(left, right,
        col("k"), col("k"), col("t"), col("t"),
        Seq(col("id")), col("p"))
      .select(col("l.id"), col("asof"), col("dir"), col("delta_us"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, "r100", "f", 10L),  // nothing in the past
      (2L, "r100", "b", 50L),  // exact tie -> past wins
      (3L, "r200", "f", 40L),  // future strictly nearer
      (4L, "r200", "b", 10L)), // nothing in the future; key 2 dropped
      out.toString)
  }

  test("interArrival: gaps are per (type, user) — cross-user deltas never appear") {
    import spark.implicits._
    val base = 1700000000L
    // two users interleaved in time: user gaps are 100s each; the
    // interleaved cross-user deltas (50s) must not leak in
    val df = Seq((1L, 1L, base), (2L, 2L, base + 50),
      (3L, 1L, base + 100), (4L, 2L, base + 150))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"), lit("t").as("event_type"))
    val out = TimeSeries.interArrival(df).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4))).toSeq
    assert(out == Seq((2L, 100L, 100L)), out.toString)
  }

  // ---- HilbertKeyNd --------------------------------------------------

  test("hilbertKeyNd: 3-D bijective on the 8^3 grid and consecutive positions are grid neighbors") {
    import spark.implicits._
    val cells = (for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (x, y, z)).toDF("x", "y", "z")
    val keyed = cells.select(col("x"), col("y"), col("z"),
        Layout.hilbertKeyNd(cells,
          Seq(col("x"), col("y"), col("z")), 3).as("d"))
      .orderBy("d").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(keyed.map(_._4).toSeq == (0L until 512L).toSeq,
      "keys must be a bijection onto 0..511")
    keyed.sliding(2).foreach { case Array((x1, y1, z1, _), (x2, y2, z2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"curve jump at ($x1,$y1,$z1)->($x2,$y2,$z2)")
    }
  }

  test("hilbertKeyNd: 4-D bijective on the 4^4 grid with unit steps") {
    import spark.implicits._
    val cells = (for (a <- 0 until 4; b <- 0 until 4; c <- 0 until 4;
                      d <- 0 until 4) yield (a, b, c, d))
      .toDF("a", "b", "c", "d")
    val keyed = cells.select(col("a"), col("b"), col("c"), col("d"),
        Layout.hilbertKeyNd(cells,
          Seq(col("a"), col("b"), col("c"), col("d")), 2).as("h"))
      .orderBy("h").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))
    assert(keyed.map(_._5).toSeq == (0L until 256L).toSeq,
      "keys must be a bijection onto 0..255")
    keyed.sliding(2).foreach { case Array(p, q) =>
      val step = math.abs(p._1 - q._1) + math.abs(p._2 - q._2) +
        math.abs(p._3 - q._3) + math.abs(p._4 - q._4)
      assert(step == 1, s"curve jump at $p->$q")
    }
  }

  test("hilbertKeyNd: codegen path equals the reference walk on random wide points") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // d=3 x bits=20 exercises the 60-bit key range far past int
    val pts = (0 until 120).map { _ =>
      (rnd.nextLong(1L << 20), rnd.nextLong(1L << 20),
        rnd.nextLong(1L << 20))
    }
    val df = pts.toDF("x", "y", "z")
    val viaPlan = df.select(
        Layout.hilbertKeyNd(df, Seq(col("x"), col("y"), col("z")), 20)
          .as("h"))
      .collect().map(_.getLong(0)).toSeq
    val viaWalk = pts.map { case (x, y, z) =>
      graft.functions.HilbertKeyNd.walk(Array(x, y, z), 20)
    }
    assert(viaPlan == viaWalk)
  }

  test("hilbertKeyNd: SQL surface rejects a non-foldable / non-integral bits argument with a named error") {
    import spark.implicits._
    graft.functions.HilbertKeyNd.register(spark)
    val df = Seq((1L, 2L)).toDF("x", "y")
    df.createOrReplaceTempView("hk_bad_bits")
    // non-foldable bits: a column reference
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert_key_nd(x, y, x) FROM hk_bad_bits").collect()
    }
    assert(e1.getMessage.contains("hilbert_key_nd"), e1.getMessage)
    assert(e1.getMessage.contains("foldable"), e1.getMessage)
    // foldable but non-integral bits: a string literal
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert_key_nd(x, y, 'eight') FROM hk_bad_bits")
        .collect()
    }
    assert(e2.getMessage.contains("hilbert_key_nd"), e2.getMessage)
    // a TYPE error, not a (misleading) non-foldable diagnostic: the
    // literal IS foldable, its type is wrong
    assert(!e2.getMessage.contains("foldable"), e2.getMessage)
    assert(e2.getMessage.contains("STRING"), e2.getMessage)
    // the good path still resolves through the same builder
    val ok = spark.sql("SELECT hilbert_key_nd(x, y, 3) AS h FROM hk_bad_bits")
      .collect().head.getLong(0)
    assert(ok == graft.functions.HilbertKeyNd.walk(Array(1L, 2L), 3))
  }

  // ---- contaminationMatrixPruned -------------------------------------

  test("contaminationMatrixPruned: at minSources = |sources| each dropped shingle contributed exactly +1 to n_shared, n_a, n_b") {
    import spark.implicits._
    // three sources; "u1 u2 u3" (and its shifted twin) appear in all
    // three; other shingles scatter. minSources = 3 drops exactly the
    // universal shingles, and the exact matrix must be recoverable by
    // adding n_dropped to n_shared/n_a/n_b of every cell.
    val docs = Seq(
      (1L, "a", "u1 u2 u3 u4 ax ay az"),
      (2L, "b", "u1 u2 u3 u4 bx by bz"),
      (3L, "c", "u1 u2 u3 u4 cx cy ax"),
      (4L, "a", "ax ay az aw av"),
      (5L, "b", "bx by ax ay az")).toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r).toMap
    val exact = rows(Curation.contaminationMatrix(docs))
    val pruned = rows(Curation.contaminationMatrixPruned(docs, 3))
    // the pruned tier keeps EVERY pair cell (the exact tier omits
    // never-overlapping pairs, which cannot happen here)
    assert(exact.keySet.subsetOf(pruned.keySet), s"${pruned.keySet}")
    val nd = pruned.values.head.getLong(6)
    // "u1 u2 u3" and "u2 u3 u4" are in all three sources
    assert(nd == 2L, s"n_dropped = $nd")
    exact.foreach { case (k, e) =>
      val p = pruned(k)
      assert(e.getLong(2) == p.getLong(2) + nd, s"n_a at $k") // n_a
      assert(e.getLong(3) == p.getLong(3) + nd, s"n_b at $k") // n_b
      assert(e.getLong(4) == p.getLong(4) + nd, s"n_shared at $k")
    }
    graft.ext.CacheRegistry.clearAll()
  }

  test("contaminationMatrixPruned: a shingle in only two sources survives a minSources=3 prune") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "p q r s"), (2L, "b", "p q r t"), (3L, "c", "zz yy xx"))
      .toDF("doc_id", "source", "text")
    val out = Curation.contaminationMatrixPruned(docs, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4),
        r.getLong(6))).toSeq
    // "p q r" shared by a and b only -> kept; nothing dropped; the
    // non-overlapping pairs keep their cells with n_shared = 0
    assert(out == Seq(("a", "b", 1L, 0L), ("a", "c", 0L, 0L),
      ("b", "c", 0L, 0L)), out.toString)
    graft.ext.CacheRegistry.clearAll()
  }

  test("zonemapAuditHilbert: the third clustering column pays — 3-D prunes z where 2-D cannot") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val out = Layout.zonemapAuditHilbert(li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val Seq(nat, h2, h3) =
      Seq("1_natural", "2_hilbert2d", "3_hilbert3d").map(out)
    assert(nat._1 == h2._1 && h2._1 == h3._1, "same file count")
    // 2-D never prunes z (unclustered): it scans essentially all files
    assert(h3._4 < h2._4, s"3-D must beat 2-D on the z predicate: $out")
    // and 2-D beats natural on x/y, 3-D still prunes x/y
    assert(h2._2 < nat._2 && h3._2 < nat._2, s"x pruning: $out")
    assert(h3._5 <= h2._5, s"conjunction: $out")
  }
}
