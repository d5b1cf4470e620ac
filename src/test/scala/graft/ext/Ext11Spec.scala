package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 batch-2 operator invariants: hand-computed fixtures for the
  * five operators judged as x343–x347. All fixture embedding values are
  * exact binary fractions (0, 0.25, 0.5, 0.75, 1.0) so the ×10000
  * quantization is float-exact. */
class Ext11Spec extends SparkSpec {

  // ---- silhouette (x343) ---------------------------------------------

  test("silhouette: two tight separated clusters score high, hand-computed milli") {
    import spark.implicits._
    val emb = Seq(
      (1L, "A", Seq(0.0, 0.0)), (2L, "A", Seq(0.0, 0.25)),
      (3L, "B", Seq(1.0, 1.0)), (4L, "B", Seq(1.0, 0.75)))
      .toDF("vec_id", "label", "embedding")
    // q: A (0,0),(0,2500); B (10000,10000),(10000,7500)
    // centA (0,1250)  centB (10000,8750)
    // vec1: a=1250²=1562500  b=10000²+8750²=176562500
    //   s = 175000000000 div 176562500 = 991
    // vec2: a=1562500  b=1e8+6250²=139062500 -> s=988
    // avg per label = 1979 div 2 = 989, symmetric for B
    val out = Similarity.silhouette(emb).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("A", 2L, 989L, 0L), ("B", 2L, 989L, 0L)),
      out.mkString(","))
  }

  test("silhouette: a mislabeled vector scores exactly -1000 and is counted") {
    import spark.implicits._
    val emb = Seq(
      (1L, "A", Seq(0.0, 0.0)), (2L, "A", Seq(0.0, 0.0)),
      (3L, "A", Seq(1.0, 1.0)), // sits ON B's centroid
      (4L, "B", Seq(1.0, 1.0)), (5L, "B", Seq(1.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    // centA = (3333,3333) (10000 div 3), centB = (10000,10000)
    // vec3: a=(10000-3333)²*2=88897778, b=0 -> s = -1000
    // vec1/2: a=3333²*2=22217778, b=2e8 -> s=177782222000 div 2e8=888
    // avgA = (888+888-1000) div 3 = 258, n_negative=1; B: s=1000 each
    val out = Similarity.silhouette(emb).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("A", 3L, 258L, 1L), ("B", 2L, 1000L, 0L)),
      out.mkString(","))
  }

  // ---- dimUtilization (x347) -----------------------------------------

  test("dimUtilization: hand-computed moments; dead dims carry zero share") {
    import spark.implicits._
    val emb = Seq((1L, Seq(0.0, 0.0, 0.25)), (2L, Seq(0.5, 0.0, 0.25)))
      .toDF("vec_id", "embedding")
    // q: dim1 {0,5000} mean 2500 var (2*25e6-25e6) div 4 = 6250000
    // dim2 all-zero, dim3 constant 2500 -> var 0; total var = 6250000
    val out = Similarity.dimUtilization(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 2500L, 6250000L, 1000000L, 1000000L),
      (2L, 0L, 0L, 0L, 1000000L),
      (3L, 2500L, 0L, 0L, 1000000L)), out.mkString(","))
  }

  // ---- compactionCandidates (x344) -----------------------------------

  test("compactionCandidates: zone-map boundary equality counts as overlap") {
    import spark.implicits._
    // write order (ok asc) cuts 2-row files with value spans
    // f0=[1,10] f1=[10,20] f2=[30,40]: f0~f1 touch at 10 (lo<=hi
    // counts), f2 disjoint
    val li = Seq((1L, 1L, 1L), (2L, 1L, 10L), (3L, 1L, 10L),
      (4L, 1L, 20L), (5L, 1L, 30L), (6L, 1L, 40L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey")
    val out = Layout.compactionCandidates(li, rowsPerFile = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 10L, 1L), (1L, 10L, 20L, 1L),
      (2L, 30L, 40L, 0L)), out.mkString(","))
  }

  test("compactionCandidates: fully interleaved files all overlap each other") {
    import spark.implicits._
    // spans [1,100],[2,101],[3,102] -> every file overlaps both others
    val li = Seq((1L, 1L, 1L), (2L, 1L, 100L), (3L, 1L, 2L),
      (4L, 1L, 101L), (5L, 1L, 3L), (6L, 1L, 102L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey")
    val out = Layout.compactionCandidates(li, rowsPerFile = 2, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L), (1L, 2L)),
      "k cap keeps the two worst (ties broken by file id): " +
        out.mkString(","))
  }

  // ---- theilSenTrend (x345) ------------------------------------------

  test("theilSenTrend: one burst day drags OLS but not the pairwise median") {
    import spark.implicits._
    // daily counts d=0..3 -> y=1,2,3,100
    // slopes (micro): 1e6,1e6,33e6,1e6,49e6,97e6 -> disc median 1e6
    // OLS: (4*308-6*106)*1e6 div (4*14-36) = 596e6 div 20 = 29800000
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 3, 3 -> 100).flatMap {
      case (d, n) => Seq.fill(n)(d)
    }
    val ev = rows.toDF("d").select(
      date_add(lit("1997-03-01").cast("date"), col("d"))
        .cast("timestamp").as("ts"))
    val r = TimeSeries.theilSenTrend(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 6L, 1000000L, 29800000L)), r.toString)
  }

  test("theilSenTrend: an exact linear series agrees with OLS") {
    import spark.implicits._
    val rows = Seq(0 -> 1, 1 -> 3, 2 -> 5).flatMap {
      case (d, n) => Seq.fill(n)(d)
    }
    val ev = rows.toDF("d").select(
      date_add(lit("1997-03-01").cast("date"), col("d"))
        .cast("timestamp").as("ts"))
    val r = TimeSeries.theilSenTrend(ev).collect().head
    assert(r.getLong(2) == 2000000L && r.getLong(3) == 2000000L,
      r.toString)
  }

  // ---- hazardCurve (x346) --------------------------------------------

  test("hazardCurve: hand-computed at-risk suffix sums and ppm hazards") {
    import spark.implicits._
    val day = 86400L
    val base = 1700000000L
    // lifespans: u1 -> 0, u2 -> 1, u3 -> 1, u4 -> 3
    val ev = Seq(
      (1L, base), (1L, base + 3600),
      (2L, base), (2L, base + day),
      (3L, base + day), (3L, base + 2 * day),
      (4L, base), (4L, base + 3 * day))
      .toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
    val out = TimeSeries.hazardCurve(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 4L, 250000L), (1L, 2L, 3L, 666666L),
      (3L, 1L, 1L, 1000000L)), out.mkString(","))
  }

  // ---- psiDrift (x348) -----------------------------------------------

  test("psiDrift: mirrored two-source mix, hand-computed whole-bit terms") {
    import spark.implicits._
    val docs = (Seq.fill(3)(("A", "en")) ++ Seq(("A", "fr")) ++
      Seq(("B", "en")) ++ Seq.fill(3)(("B", "fr")))
      .toDF("source", "lang")
    // A/en: a=4 b=2 ta=tb=6 -> dp=333333, lr=flog2(24)-flog2(12)=1
    // A/fr mirrors with both signs flipped -> psi_A = 666666
    val out = Profile.psiDrift(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("A", 4L, 666666L), ("B", 4L, 666666L)),
      out.mkString(","))
  }

  test("psiDrift: identical mixes score exactly zero") {
    import spark.implicits._
    val docs = Seq(("A", "en"), ("A", "en"), ("A", "fr"), ("A", "fr"),
      ("B", "en"), ("B", "en"), ("B", "fr"), ("B", "fr"))
      .toDF("source", "lang")
    val out = Profile.psiDrift(docs).collect().map(_.getLong(2))
    assert(out.toSeq == Seq(0L, 0L), out.mkString(","))
  }

  // ---- mannWhitney (x349) ----------------------------------------------

  test("mannWhitney: complete separation hits rbc ±1e6") {
    import spark.implicits._
    val ev = Seq(("X", 0.1), ("X", 0.2), ("Y", 1.0), ("Y", 1.1))
      .toDF("event_type", "value")
    // midrank2 by q: 2,4,6,8 -> U2_X = 6-6 = 0, U2_Y = 14-6 = 8
    val out = Profile.mannWhitney(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("X", 2L, 2L, 0L, -1000000L),
      ("Y", 2L, 2L, 8L, 1000000L)), out.mkString(","))
  }

  test("mannWhitney: an all-tied bin midranks to rbc = 0") {
    import spark.implicits._
    val ev = Seq(("X", 0.1), ("X", 0.1), ("Y", 0.1))
      .toDF("event_type", "value")
    // one bin g=3: midrank2 = 4; U2_X = 8-6 = 2 = n_a*n_b -> rbc 0
    val out = Profile.mannWhitney(ev).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("X", 2L, 0L), ("Y", 2L, 0L)),
      out.mkString(","))
  }

  // ---- degreeAssortativity (x350) --------------------------------------

  test("degreeAssortativity: a star is exactly -1e6, a cycle is NULL") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r1 = Graph.degreeAssortativity(star).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ==
      ((4L, 6L, -1000000L)), r1.toString)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r2 = Graph.degreeAssortativity(cycle).collect().head
    assert(r2.isNullAt(2), "degree-regular graph must yield NULL r")
  }

  // ---- readability (x351) ----------------------------------------------

  test("readability: hand-counted words/sentences/vowel groups and flesch") {
    import spark.implicits._
    val docs = Seq(("en", "Hello world. It is good.")).toDF("lang", "text")
    // W=5 S=2 Y=6: flesch = 206835 - 2537 - 101520 = 102778
    val r = TextStats.readability(docs).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((1L, 5L, 2L, 6L, 2500L, 1200L, 102778L)), r.toString)
  }

  test("readability: a doc with no terminal punctuation floors at one sentence") {
    import spark.implicits._
    val docs = Seq(("en", "no punctuation here")).toDF("lang", "text")
    val r = TextStats.readability(docs).collect().head
    assert(r.getLong(3) == 1L, r.toString)
  }

  // ---- scd2Intervals (x352) ----------------------------------------------

  test("scd2Intervals: runs collapse, valid_to chains, equal-ts ties break on event_id") {
    import spark.implicits._
    val base = 1700000000L
    val ev = Seq(
      (1L, 1L, "A", base), (2L, 1L, "A", base + 10),
      (3L, 1L, "B", base + 20), (4L, 1L, "A", base + 30),
      (5L, 2L, "B", base),
      (6L, 3L, "C", base), (7L, 3L, "D", base))
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val out = TimeSeries.scd2Intervals(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, "A", base, base + 20, 2L),
      (1L, 2L, "B", base + 20, base + 30, 1L),
      (1L, 3L, "A", base + 30, -1L, 1L),
      (2L, 1L, "B", base, -1L, 1L),
      (3L, 1L, "C", base, base, 1L),
      (3L, 2L, "D", base, -1L, 1L)), out.mkString(","))
  }

  // ---- chiSquareIndependence (x353) ---------------------------------------

  test("chiSquareIndependence: independent grid scores 0, perfect association scores N") {
    import spark.implicits._
    val ind = Seq(("en", "s1"), ("en", "s1"), ("en", "s2"), ("en", "s2"),
      ("fr", "s1"), ("fr", "s1"), ("fr", "s2"), ("fr", "s2"))
      .toDF("lang", "source")
    val r1 = Profile.chiSquareIndependence(ind).collect().head
    assert((r1.getLong(0), r1.getLong(3), r1.getLong(4)) ==
      ((8L, 1L, 0L)), r1.toString)
    // diagonal-only: every cell contributes 1e6 incl. the zero cells
    val dep = Seq(("en", "s1"), ("en", "s1"), ("fr", "s2"), ("fr", "s2"))
      .toDF("lang", "source")
    val r2 = Profile.chiSquareIndependence(dep).collect().head
    assert((r2.getLong(0), r2.getLong(3), r2.getLong(4)) ==
      ((4L, 1L, 4000000L)), r2.toString)
  }

  // ---- mutualInformation (x354) -----------------------------------------

  test("mutualInformation: diagonal grid carries exactly one bit per row, independent grid zero") {
    import spark.implicits._
    val diag = Seq(("en", "s1"), ("en", "s1"), ("fr", "s2"), ("fr", "s2"))
      .toDF("lang", "source")
    val r1 = Profile.mutualInformation(diag).collect().head
    // each cell: 2·(flog2(8)-flog2(4)) = 2 -> mi 4; H(row)=H(col)=4
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getLong(4), r1.getLong(5)) ==
      ((4L, 4L, 4L, 4L, 1000000L, 1000000L)), r1.toString)
    val ind = Seq(("en", "s1"), ("en", "s2"), ("fr", "s1"), ("fr", "s2"))
      .toDF("lang", "source")
    val r2 = Profile.mutualInformation(ind).collect().head
    assert(r2.getLong(1) == 0L && r2.getLong(4) == 0L, r2.toString)
  }

  // ---- calibrationBins (x355) ---------------------------------------------

  test("calibrationBins: two-point score lands in bins 0 and 9, hand-computed ECE") {
    import spark.implicits._
    val ev = Seq(("view", 0.0), ("view", 0.0), ("view", 0.0),
      ("purchase", 0.0), ("purchase", 1.0), ("purchase", 1.0))
      .toDF("event_type", "value")
    // bin0: n=4 mean 0 rate 250000 gap 250000; bin9: n=2 mean 1e6
    // rate 1e6 gap 0; ece = 1000000 div 6 = 166666
    val out = Experiment.calibrationBins(ev,
        col("event_type") === "purchase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((0L, 4L, 0L, 250000L, 250000L, 166666L),
      (9L, 2L, 1000000L, 1000000L, 0L, 166666L)), out.mkString(","))
  }

  // ---- diffInDiff (x356) ----------------------------------------------------

  test("diffInDiff: hand-computed 2x2 cell means and estimate") {
    import spark.implicits._
    val ev = Seq(
      (2L, 0L, 1.0), (2L, 100L, 3.0),  // treated: 1000 -> 3000
      (1L, 0L, 1.0), (1L, 100L, 2.0))  // control: 1000 -> 2000
      .toDF("user_id", "sec", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("value"))
    val r = Experiment.diffInDiff(ev, col("user_id") % 2 === 0,
      col("ts") >= timestamp_seconds(lit(50L))).collect().head
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8)) == ((1000L, 3000L, 1000L, 2000L, 1000L)),
      r.toString)
  }

  // ---- cuped (x357) -----------------------------------------------------------

  test("cuped: hand-computed theta and adjusted difference; pre-only users dropped") {
    import spark.implicits._
    val ev = Seq(
      (2L, 0L, 1.0), (2L, 100L, 3.0),   // treated x=1000 y=3000
      (4L, 0L, 3.0), (4L, 100L, 4.0),   // treated x=3000 y=4000
      (1L, 0L, 1.0), (1L, 100L, 2.0),   // control x=1000 y=2000
      (3L, 0L, 2.0), (3L, 100L, 3.0),   // control x=2000 y=3000
      (6L, 0L, 9.0))                    // treated, pre only: dropped
      .toDF("user_id", "sec", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("value"))
    // theta = 8e6*1e6 div 11e6 = 727272; raw 1e6; x_diff 5e5
    // adj = 1e6 - 727272*5e5 div 1e6 = 636364
    val r = Experiment.cuped(ev, col("user_id") % 2 === 0,
      col("ts") >= timestamp_seconds(lit(50L))).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 2L, 727272L, 1000000L, 636364L)),
      r.toString)
  }

  // ---- eventTrigrams (x358) -----------------------------------------------------

  test("eventTrigrams: deterministic A-B-C cycle is exactly memoryless (lift 1000)") {
    import spark.implicits._
    val types = Seq("A", "B", "C", "A", "B", "C")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (i.toLong + 1, 1L, t, 1700000000L + i * 10) }
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val out = TimeSeries.eventTrigrams(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("A", "B", "C", 2L, 1000000L, 1000000L, 1000L),
      ("B", "C", "A", 1L, 1000000L, 1000000L, 1000L),
      ("C", "A", "B", 1L, 1000000L, 1000000L, 1000L)),
      out.mkString(","))
  }

  // ---- qqDrift (x359) --------------------------------------------------------------

  test("qqDrift: two shifted groups, hand-computed type-1 deciles vs the pooled corpus") {
    import spark.implicits._
    val ev = ((1 to 9).map(k => ("X", k * 0.5)) ++
      (11 to 19).map(k => ("Y", k * 0.5)))
      .toDF("event_type", "value")
    val out = Profile.qqDrift(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val corpus = Seq(10L, 20L, 30L, 40L, 45L, 60L, 70L, 80L, 90L)
    val expX = (1 to 9).map(k =>
      ("X", k.toLong, k * 5L, corpus(k - 1), k * 5L - corpus(k - 1)))
    val expY = (1 to 9).map(k =>
      ("Y", k.toLong, 50L + k * 5L, corpus(k - 1),
        50L + k * 5L - corpus(k - 1)))
    assert(out.toSeq == (expX ++ expY), out.mkString(","))
  }

  // ---- jackknifeRatio (x361) --------------------------------------------

  test("jackknifeRatio: three-day fixture, hand-computed replicates and variance") {
    import spark.implicits._
    val day = 86400L
    val ev = Seq(
      (0L, "purchase", 1.0), (0L, "view", 0.5),
      (1L, "purchase", 2.0), (1L, "view", 0.5),
      (2L, "purchase", 3.0), (2L, "view", 0.5))
      .toDF("dnum", "event_type", "value")
      .select(timestamp_seconds(col("dnum") * day + 100).as("ts"),
        col("event_type"), col("value"))
    // S=6000 N=6 D=3; theta=1e9; theta_i = 1.25e9, 1e9, 0.75e9
    // jk_var = 2*(3*3.125e18 - 9e18) div 9 = 83333333333333333
    val r = Experiment.jackknifeRatio(ev,
      col("event_type") === "purchase").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 1000000000L, 1000000000L, 83333333333333333L)), r.toString)
  }

  // ---- srmTrajectory (x362) -----------------------------------------------

  test("srmTrajectory: a daily imbalance that cancels cumulatively") {
    import spark.implicits._
    val day = 86400L
    val ev = Seq(
      (2L, 1L), (4L, 1L), (6L, 1L), (1L, 1L),   // day1: 3 T, 1 C
      (2L, 2L), (1L, 2L), (3L, 2L), (5L, 2L))   // day2: 1 T, 3 C
      .toDF("user_id", "dnum")
      .select(col("user_id"),
        timestamp_seconds(col("dnum") * day + 100).as("ts"))
    val out = Experiment.srmTrajectory(ev, col("user_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 1000000L, 3L, 1L, 1000000L),
      (2L, 1L, 3L, 1000000L, 4L, 4L, 0L)), out.mkString(","))
  }

  // ---- localClustering (x363) -----------------------------------------------

  test("localClustering: triangle corners score by degree, pendant node excluded") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.localClustering(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 1000000L),
      (2L, 2L, 1L, 1000000L), (3L, 3L, 1L, 333333L)), out.mkString(","))
  }

  // ---- int8QuantAudit (x364) ---------------------------------------------------

  test("int8QuantAudit: hand-computed scale, residues (incl. a negative), and NSR") {
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0)), (2L, Seq(0.5)), (3L, Seq(-0.25)))
      .toDF("vec_id", "embedding")
    // q: 10000, 5000, -2500; scale = 10126 div 127 = 79
    // r: 46, 23, -51 -> se 5246, mse 1748; sq 131.25e6 -> nsr 39
    val r = Similarity.int8QuantAudit(emb).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((1L, 79L, 10000L, 1748L, 43750000L, 39L)), r.toString)
  }

  // ---- postStratifiedEffect (x365) ---------------------------------------

  test("postStratifiedEffect: strata split by pre-count bits; one-armed stratum excluded from ATE") {
    import spark.implicits._
    val cut = 1700000000L
    def ev(u: Long, pre: Int, postVal: Double) =
      (1 to pre).map(i => (u, cut - 100 - i, 0.5)) :+
        ((u, cut + 100, postVal))
    val rows = ev(2L, 1, 3.0) ++ ev(4L, 2, 4.0) ++ ev(1L, 1, 2.0) ++
      ev(3L, 2, 3.0) ++ ev(5L, 0, 1.0) ++ ev(6L, 8, 9.0)
    val df = rows.toDF("user_id", "sec", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("value"))
    // stratum 0 {0,1 pre}: T u2 y3000 / C u1,u5 -> diff 1.5e6
    // stratum 1 {2-3}: T u4 / C u3 -> diff 1e6; stratum 3: T only
    // ATE = (3*1.5e6 + 2*1e6) div 5 = 1300000
    val out = Experiment.postStratifiedEffect(df,
        col("user_id") % 2 === 0, col("ts") >= timestamp_seconds(lit(cut)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq((0L, 1L, 2L, 1500000L, 1300000L),
      (1L, 1L, 1L, 1000000L, 1300000L),
      (3L, 1L, 0L, -1L, 1300000L)), out.mkString(","))
  }

  // ---- termBurstiness (x366) -------------------------------------------------

  test("termBurstiness: repeated term bursts, ubiquitous term does not") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "a b"), (3L, "b"))
      .toDF("doc_id", "text")
    val out = TextStats.termBurstiness(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("a", 4L, 2L, 2000L, 666666L),
      ("b", 3L, 3L, 1000L, 1000000L)), out.mkString(","))
  }

  // ---- markovEntropy (x367) ------------------------------------------------------

  test("markovEntropy: a deterministic alternation has zero conditional entropy") {
    import spark.implicits._
    val types = Seq("A", "B", "A", "B", "A")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (i.toLong + 1, 1L, t, 1700000000L + i * 10) }
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))
    val r = TimeSeries.markovEntropy(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 4L, 0L, 0L)), r.toString)
  }

  // ---- centroidConfusion (x368) -----------------------------------------------------

  test("centroidConfusion: the mislabeled vector lands in the off-diagonal cell") {
    import spark.implicits._
    val emb = Seq(
      (1L, "A", Seq(0.0, 0.0)), (2L, "A", Seq(0.0, 0.0)),
      (3L, "A", Seq(1.0, 1.0)), // on B's centroid
      (4L, "B", Seq(1.0, 1.0)), (5L, "B", Seq(1.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidConfusion(emb).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("A", "A", 2L, 666666L),
      ("A", "B", 1L, 333333L), ("B", "B", 2L, 1000000L)),
      out.mkString(","))
  }

  // ---- sortednessAudit (x369) -----------------------------------------------------------

  test("sortednessAudit: intra and boundary inversions counted separately, hand-built chunks") {
    import spark.implicits._
    val vs = Seq(1L, 3L, 2L, 4L, 2L, 5L, 6L, 1L)
    val li = vs.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, 1L, v) }
      .toDF("l_orderkey", "l_linenumber", "l_partkey")
    // chunks of 4: [1,3,2,4][2,5,6,1]: intra 3>2 and 6>1; boundary
    // 4>2 -> sorted_ppm = 4e6 div 7 = 571428
    val r = Layout.sortednessAudit(li, rowsPerFile = 4).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((8L, 2L, 2L, 1L, 571428L)), r.toString)
  }

  // ---- termCooccurrence (x370) --------------------------------------------

  test("termCooccurrence: hand-computed pair counts and independence lift") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "c"))
      .toDF("doc_id", "text")
    // df: a3 b2 c2, N=4; (a,b)=2 lift 8000 div 6 = 1333
    // (a,c)=1 lift 4000 div 6 = 666; (b,c) unobserved, absent
    val out = TextStats.termCooccurrence(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(("a", "b", 2L, 3L, 2L, 1333L),
      ("a", "c", 1L, 3L, 2L, 666L)), out.mkString(","))
  }

  // ---- tailIndexCurve (x371) -------------------------------------------------

  test("tailIndexCurve: geometric fixture doubles per level until the tail is exhausted") {
    import spark.implicits._
    val vals = Seq.fill(1)(8.0) ++ Seq.fill(2)(3.0) ++
      Seq.fill(4)(1.0) ++ Seq.fill(8)(0.5)
    val df = vals.toDF("value")
    val out = Profile.tailIndexCurve(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    val exp = Seq(
      (1L, 4000L, 1L, -1L), (2L, 2000L, 3L, 3000L),
      (3L, 1000L, 3L, 1000L), (4L, 500L, 7L, 2333L),
      (5L, 250L, 15L, 2142L), (6L, 125L, 15L, 1000L),
      (7L, 62L, 15L, 1000L), (8L, 31L, 15L, 1000L),
      (9L, 15L, 15L, 1000L), (10L, 7L, 15L, 1000L))
    assert(out.toSeq == exp, out.mkString(","))
  }

  // ---- partitionCompleteness (x372) ---------------------------------------------

  test("partitionCompleteness: the half-written day scores against its neighbors' median") {
    import spark.implicits._
    val day = 86400L
    val rows = Seq(1 -> 4, 2 -> 4, 3 -> 1, 4 -> 4, 5 -> 4).flatMap {
      case (d, n) => Seq.fill(n)(d.toLong)
    }
    val ev = rows.toDF("dnum")
      .select(timestamp_seconds(col("dnum") * day + 100).as("ts"))
    val out = TimeSeries.partitionCompleteness(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 4L, 1000000L), (2L, 4L, 4L, 1000000L),
      (3L, 1L, 4L, 250000L), (4L, 4L, 4L, 1000000L),
      (5L, 4L, 4L, 1000000L)), out.mkString(","))
  }

  // ---- richClub (x373) ---------------------------------------------------------------

  test("richClub: a clique with a pendant keeps full density once the pendant is cut") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("src", "dst")
    // deg: 1->4, 2/3/4->3, 5->1; k=1 and k=2 keep the 4-clique
    // (12 directed arcs, phi exactly 1e6); k>=4 leaves <2 nodes
    val out = Graph.richClub(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 4L, 12L, 1000000L),
      (2L, 4L, 12L, 1000000L)), out.mkString(","))
  }

  // ---- sortKeyChooser (x374) ------------------------------------------------

  test("sortKeyChooser: the diagonal prunes where the matching sort exists, interleave defeats it") {
    import spark.implicits._
    // ok 1..8; pk interleaved so the ok-sort cannot prune pk; sk
    // constant (never prunable); qty copies ok
    val pk = Seq(1L, 8L, 2L, 7L, 3L, 6L, 4L, 5L)
    val li = (1 to 8).map(i => (i.toLong, pk(i - 1), 5L, i.toLong))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val out = Layout.sortKeyChooser(li, rowsPerFile = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    def rows(sk: String, v: Seq[Long]) =
      Seq("l_orderkey", "l_partkey", "l_quantity", "l_suppkey")
        .zip(v).map { case (p, n) => (sk, p, n) }
    val exp = rows("l_orderkey", Seq(2L, 4L, 2L, 4L)) ++
      rows("l_partkey", Seq(2L, 2L, 2L, 4L)) ++
      rows("l_quantity", Seq(2L, 4L, 2L, 4L)) ++
      rows("l_suppkey", Seq(2L, 4L, 2L, 4L))
    assert(out.toSeq == exp, out.mkString(","))
  }

  // ---- stratifiedMi (x375) ------------------------------------------------------

  test("stratifiedMi: per-band MI separates the diagonal band from the independent band") {
    import spark.implicits._
    val docs = (Seq(("en", "s1"), ("en", "s1"), ("fr", "s2"),
        ("fr", "s2")).map { case (l, s) => (l, s, 2L) } ++
      Seq(("en", "s1"), ("en", "s2"), ("fr", "s1"), ("fr", "s2"))
        .map { case (l, s) => (l, s, 4L) })
      .toDF("lang", "source", "n_chars")
    val out = Profile.stratifiedMi(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 4L, 4L), (2L, 4L, 0L)),
      out.mkString(","))
  }

  // ---- effectiveSampleSize (x377) --------------------------------------------

  test("effectiveSampleSize: skewed sources truncate to 2 effective rows, balanced keep all") {
    import spark.implicits._
    val skew = Seq("A", "A", "A", "B").toDF("source")
    // w_A=666666 w_B=2000000: sw=3999998, sww=5333330666668 -> ess 2
    val r1 = Sampling.effectiveSampleSize(skew).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getLong(4)) == ((4L, 2L, 2000000L, 2L, 500000L)), r1.toString)
    val bal = Seq("A", "A", "B", "B").toDF("source")
    val r2 = Sampling.effectiveSampleSize(bal).collect().head
    assert(r2.getLong(3) == 4L && r2.getLong(4) == 1000000L, r2.toString)
  }

  // ---- shingleSaturation (x378) --------------------------------------------------

  test("shingleSaturation: hand-counted shingles; short docs drop out per k") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "c")).toDF("doc_id", "text")
    val out = TextStats.shingleSaturation(docs, maxK = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, 3L, 600000L), (2L, 3L, 2L, 666666L),
      (3L, 2L, 2L, 1000000L), (4L, 1L, 1L, 1000000L)),
      out.mkString(","))
  }

  // ---- seasonalNaiveBacktest (x379) ----------------------------------------

  test("seasonalNaiveBacktest: weekly-cycled series — seasonal naive exact, persistence pays") {
    import spark.implicits._
    val day = 86400L
    val counts = Seq(10, 20, 10, 20, 10, 20, 10, 10, 20)
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(i.toLong + 1)
    }
    val ev = rows.toDF("dnum")
      .select(timestamp_seconds(col("dnum") * day + 100).as("ts"))
    // scored d8,d9: persistence errs 10 on d9 (mae 5000, mape 250000);
    // the weekly reference is exact on both
    val r = TimeSeries.seasonalNaiveBacktest(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 5000L, 250000L, 0L, 0L)), r.toString)
  }

  // ---- changepointLocate (x380) --------------------------------------------------

  test("changepointLocate: a clean level shift is found at its last low day") {
    import spark.implicits._
    val day = 86400L
    val rows = Seq(10, 10, 10, 20, 20, 20).zipWithIndex.flatMap {
      case (n, i) => Seq.fill(n)(i.toLong + 1)
    }
    val ev = rows.toDF("dnum")
      .select(timestamp_seconds(col("dnum") * day + 100).as("ts"))
    // split s=3: |30*6 - 90*3| = 90 beats 30/60/60/30 elsewhere
    val r = TimeSeries.changepointLocate(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 6L, 10000L, 20000L, 90L)), r.toString)
  }

  // ---- chao1Richness (x381) ------------------------------------------------------

  test("chao1Richness: hand-computed singleton/doubleton estimate and coverage") {
    import spark.implicits._
    val docs = Seq((1L, "a a b b b c d")).toDF("doc_id", "text")
    // N=7 V=4 n1=2 n2=1: chao1 = 4 + 4 div 2 = 6; bc = 4 + 2 div 4 = 4
    // coverage = 1e6 - 2e6 div 7 = 714286
    val r = TextStats.chao1Richness(docs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((7L, 4L, 2L, 1L, 6L, 4L, 714286L)), r.toString)
  }

  // ---- hubnessAudit (x382) --------------------------------------------------------

  test("hubnessAudit: the hub collects occurrences, the anti-hub lands in the zero bucket") {
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0)), (2L, Seq(0.9)), (3L, Seq(0.8)),
      (4L, Seq(-1.0))).toDF("vec_id", "embedding")
    // k=1 nearest by dot: 1->2, 2->1, 3->1, 4->3
    // occ: v1=2 v2=1 v3=1 v4=0 -> hist (0,1),(1,2),(2,1)
    val out = Similarity.hubnessAudit(emb, k = 1, step = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L), (1L, 2L), (2L, 1L)),
      out.mkString(","))
  }

  // ---- lorenzCurve (x384) -----------------------------------------------------------

  test("lorenzCurve: the exact cut shares with the single heavy user owning the head") {
    import spark.implicits._
    val ev = Seq((1L, 1.0), (2L, 0.5), (3L, 0.25), (4L, 0.125))
      .toDF("user_id", "value")
    // totals milli: 1000, 500, 250, 125 (V=1875, U=4)
    // cuts: p<=25 -> k=1 (share 533333); p=50 -> k=2 (share 800000)
    val out = Profile.lorenzCurve(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val head = (1L, 1000L, 533333L)
    assert(out.toSeq == Seq(
      (1L, head._1, head._2, head._3), (2L, head._1, head._2, head._3),
      (5L, head._1, head._2, head._3),
      (10L, head._1, head._2, head._3),
      (25L, head._1, head._2, head._3),
      (50L, 2L, 1500L, 800000L)), out.mkString(","))
  }

  // ---- edgeStrength (x385) -----------------------------------------------------------

  test("edgeStrength: the inseparable pair outranks the popular pair") {
    import spark.implicits._
    val pairs = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L), (5L, 2L), (5L, 3L),
      (6L, 4L), (6L, 5L), (7L, 4L), (7L, 5L)).toDF("b", "i")
    // (4,5): w=2, n=2/2 -> 1e6; (1,2)/(1,3): w=2, n=4·3 -> 333333;
    // (2,3) w=1 dropped by minShared
    val out = Graph.edgeStrength(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((4L, 5L, 2L, 2L, 2L, 1000000L),
      (1L, 2L, 2L, 4L, 3L, 333333L), (1L, 3L, 2L, 4L, 3L, 333333L)),
      out.mkString(","))
  }

  // ---- twoNnRatio (x386) ------------------------------------------------------------------

  test("twoNnRatio: duplicates count as degenerate; hand-computed median and p90") {
    import spark.implicits._
    val emb = Seq((1L, Seq(0.0)), (4L, Seq(0.0)), (2L, Seq(0.25)),
      (3L, Seq(0.75))).toDF("vec_id", "embedding")
    // v1/v4 have d1=0 (degenerate); v2 r=1000 (two equidistant
    // firsts), v3 r = 56.25e6*1000 div 25e6 = 2250
    val r = Similarity.twoNnRatio(emb, step = 1).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 1000L, 2250L)), r.toString)
  }

  // ---- dailyCoMovement (x387) -------------------------------------------------------

  test("dailyCoMovement: lockstep +1e6, mirrored -1e6, constant series NULL") {
    import spark.implicits._
    val day = 86400L
    val counts = Seq(("A", 1, 1), ("A", 2, 2), ("A", 3, 3),
      ("B", 1, 2), ("B", 2, 4), ("B", 3, 6),
      ("C", 1, 3), ("C", 2, 2), ("C", 3, 1),
      ("D", 1, 2), ("D", 2, 2), ("D", 3, 2))
    val ev = counts.flatMap { case (t, d, n) =>
      Seq.fill(n)((t, d.toLong)) }
      .toDF("event_type", "dnum")
      .select(col("event_type"),
        timestamp_seconds(col("dnum") * day + 100).as("ts"))
    val out = TimeSeries.dailyCoMovement(ev).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    assert(out.toSeq == Seq(
      ("A", "B", 1000000L), ("A", "C", -1000000L), ("A", "D", 0L),
      ("B", "C", -1000000L), ("B", "D", 0L), ("C", "D", 0L)),
      out.mkString(","))
  }

  // ---- shipLag (x388) ---------------------------------------------------------------

  test("shipLag: histogram-folded median/p90 and late rate per priority") {
    import spark.implicits._
    val orders = Seq((1L, "1-URGENT", "1995-01-01"),
      (2L, "2-HIGH", "1995-01-01"))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq((1L, "1995-01-06"), (1L, "1995-01-11"),
      (1L, "1995-02-10"), (2L, "1995-01-01"))
      .toDF("l_orderkey", "l_shipdate")
    // urgent lags {5,10,40}: median 10, p90 40, late 1/3 = 333333
    val out = TimeSeries.shipLag(li, orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("1-URGENT", 3L, 10L, 40L, 333333L),
      ("2-HIGH", 1L, 0L, 0L, 0L)), out.mkString(","))
  }
}
