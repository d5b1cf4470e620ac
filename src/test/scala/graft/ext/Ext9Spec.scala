package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 operator invariants: the structural properties the sf0.01
  * oracle gate can't see (degenerate branches, contracts, and the
  * codegen-vs-interpreted agreement of the native Hilbert walk). */
class Ext9Spec extends SparkSpec {

  // ---- truncationDupes ----------------------------------------------

  test("truncationDupes: prefixes flagged with the right witness; equals and non-prefixes not") {
    import spark.implicits._
    // "ab" < "abc" < "abcd": ab is a prefix (witness = owner of abc,
    // its smallest strict extension); abc is a prefix of abcd; abcd is
    // maximal. "xy" has no extension. Exact duplicate "ab" (id 10)
    // must ALSO be flagged (both copies are truncations of abc), with
    // the same witness. "b" (shorter than prefixLen) exercises the
    // broadcast short-text path: extension "bq" exists.
    val docs = Seq(
      1L -> "ab", 10L -> "ab", 2L -> "abc", 3L -> "abcd",
      4L -> "xy", 5L -> "b", 6L -> "bq").toDF("doc_id", "text")
    val out = Dedup.truncationDupes(docs, prefixLen = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 2L), (2L, 3L, 3L), (5L, 1L, 6L),
      (10L, 2L, 2L)), out.toString)
  }

  test("truncationDupes: bucketed path agrees with a brute-force all-pairs check on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(90210)
    val base = (0 until 120).map { i =>
      (i.toLong, (0 until (rnd.nextInt(12) + 1))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val docs = base.toDF("doc_id", "text")
    val got = Dedup.truncationDupes(docs, prefixLen = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // brute force: doc flagged iff some OTHER distinct text strictly
    // extends it; witness = min owner of the smallest such extension
    val owner = base.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._1).min }
    val want = base.flatMap { case (id, t) =>
      val exts = owner.keys.filter(u => u != t && u.startsWith(t))
      if (exts.isEmpty) None
      else Some((id, owner(exts.min)))
    }.toSet
    assert(got == want, s"got ${got.size} want ${want.size}")
  }

  // ---- madOutliers ---------------------------------------------------

  test("madOutliers: hand-computed medians and the MAD=0 degenerate group") {
    import spark.implicits._
    // group g: cents 100,200,300,400,1000 -> med=300 (disc, ceil(2.5)=3rd),
    // d = 200,100,0,100,700 -> mad=100; outliers: d>300 -> only 700
    // group h: all equal -> mad=0, any deviation flags; here one dev 50
    val df = Seq(("g", 1.00), ("g", 2.00), ("g", 3.00), ("g", 4.00),
      ("g", 10.00), ("h", 5.00), ("h", 5.00), ("h", 5.00), ("h", 5.50))
      .toDF("grp", "v")
    val out = Profile.madOutliers(df, "grp", col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(("g", 5L, 300L, 100L, 1L, 700L),
      ("h", 4L, 500L, 0L, 1L, 50L)), out.toString)
  }

  // ---- conformalCoverage --------------------------------------------

  test("conformalCoverage: the calibration invariant holds — at least ceil(0.9 n_cal) calibration points sit at or under the threshold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 500).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", rnd.nextDouble() * 100))
      .toDF("id", "grp", "v")
    val out = Profile.conformalCoverage(df, "grp", col("v"), col("id"))
    val cal = df.where(col("id") % 2 === 0)
      .select(col("grp"), floor(col("v") * 100).cast("bigint").as("c"))
    out.collect().foreach { r =>
      val (grp, nCal, thr) = (r.getString(0), r.getLong(1), r.getLong(3))
      val under = cal.where(col("grp") === grp && col("c") <= thr).count()
      assert(under >= (9L * nCal + 9) / 10,
        s"$grp: $under of $nCal under thr $thr")
      // and coverage on the held-out half is sane (ppm in range)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
    }
  }

  // ---- retrievalMrr --------------------------------------------------

  test("retrievalMrr: rank-free formula equals the explicit sorted rank on a hand fixture") {
    import spark.implicits._
    // 2-dim embeddings; query 0 (label 1): neighbors ranked by dot with
    // (1,0): v3 (0.9,.0) dot=.9 label 2; v1 (0.8,0) dot=.8 label 1;
    // first same-label at rank 2 -> rr 500000
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.8f, 0.0f), 1),
      (3L, Array(0.9f, 0.0f), 2),
      (4L, Array(0.1f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.retrievalMrr(emb, 100).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)) ==
      ((0L, 1, 2L, 500000L)), r.toString)
  }

  test("retrievalMrr: agrees with the window-rank formulation on real embeddings") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val got = Similarity.retrievalMrr(emb, 7).orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // reference: full sort per query
    val q = emb.where(col("vec_id") % 7 === 0)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qe"))
    val scored = q.join(emb, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        Similarity.dotQ(col("qe"), col("embedding")).as("dot_q"))
      .withColumn("rn", row_number().over(Window.partitionBy("qid")
        .orderBy(col("dot_q").desc, col("vec_id"))))
    val want = scored.where(col("label") === col("qlabel"))
      .groupBy("qid").agg(min(col("rn").cast("bigint")).as("first_rank"))
      .orderBy("qid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  // ---- HilbertKey ----------------------------------------------------

  test("hilbertKey: bijective on the 16x16 grid and consecutive positions are grid neighbors") {
    import spark.implicits._
    val cells = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
    val keyed = cells.select(col("x"), col("y"),
        Layout.hilbertKey(cells, col("x"), col("y"), 4).as("d"))
      .orderBy("d").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(keyed.map(_._3).toSeq == (0L until 256L).toSeq,
      "keys must be a bijection onto 0..255")
    keyed.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump at ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbertKey: codegen path equals interpreted eval on random points") {
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val (x, y) = (rnd.nextInt(256), rnd.nextInt(256))
      val e = graft.functions.HilbertKey(
        org.apache.spark.sql.catalyst.expressions.Literal(x.toLong),
        org.apache.spark.sql.catalyst.expressions.Literal(y.toLong), 8)
      val interpreted = e.eval(null).asInstanceOf[Long]
      // the spec's DataFrame paths run through codegen; spot-check one
      import spark.implicits._
      val df = Seq((x.toLong, y.toLong)).toDF("a", "b")
      val viaPlan = df.select(
        Layout.hilbertKey(df, col("a"), col("b"), 8)).head().getLong(0)
      assert(interpreted == viaPlan, s"($x,$y)")
    }
  }

  test("hilbertKey: locality beats zorder on average curve-neighbor distance") {
    import spark.implicits._
    val cells = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    def avgJump(keyed: Seq[(Int, Int)]): Double =
      keyed.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) }.sum.toDouble /
        (keyed.size - 1)
    val hil = cells.select(col("x"), col("y"),
        Layout.hilbertKey(cells, col("x"), col("y"), 5).as("d"))
      .orderBy("d").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val zor = cells.select(col("x"), col("y"),
        Layout.zorderKey(col("x"), col("y"), 5).as("d"))
      .orderBy("d").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(avgJump(hil) == 1.0, "hilbert is perfectly local")
    assert(avgJump(zor) > avgJump(hil), s"zorder avg ${avgJump(zor)}")
  }

  // ---- epochWaterfill ------------------------------------------------

  test("epochWaterfill: budget conserved exactly, caps respected, water level flat across uncapped sources") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("b", 100L), ("c", 1000L), ("d", 10000L))
      .flatMap { case (s, n) => Seq((s, n)) }.toDF("src", "w")
    // total 11110; budget = 2x total = 22220; caps 3x native
    val out = Sampling.epochWaterfill(df, "src", col("w"), 3, 2L, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val alloc = out.map(_._4)
    assert(alloc.sum == 22220L, out.toString)
    out.foreach { case (_, _, cap, a) => assert(a <= cap) }
    // a,b,c cap out (30+300+3000 <= bud and level above their caps);
    // d takes the rest
    assert(out.map(o => o._1 -> o._4).toMap ==
      Map("a" -> 30L, "b" -> 300L, "c" -> 3000L, "d" -> 18890L))
  }

  test("epochWaterfill: over-budget degenerates to all-capped underspend") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("b", 20L)).toDF("src", "w")
    // budget = 10x total = 300 > sum(cap) = 90: everyone capped
    val out = Sampling.epochWaterfill(df, "src", col("w"), 3, 10L, 1L)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("a", 30L, 3000L), ("b", 60L, 3000L)))
  }

  // ---- gapFillInterp -------------------------------------------------

  test("gapFillInterp: interior gaps ramp linearly with truncating integer division") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def t(d: Int) = new java.sql.Timestamp(
      ts0.getTime + d.toLong * 24 * 3600 * 1000)
    // k=a: day0 v=1.00, day3 v=2.00 -> day1 133, day2 166 (trunc)
    // k=b: day0 v=5.00, day2 v=1.00 -> day1 = 500 + (-400)*1 div 2 = 300
    val ev = Seq(("a", t(0), 1.00, 1L), ("a", t(3), 2.00, 2L),
      ("b", t(0), 5.00, 3L), ("b", t(2), 1.00, 4L))
      .toDF("k", "ts", "v", "id")
    val out = TimeSeries.gapFillInterp(ev, "k", "ts", "v", "id")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("a", 100L, 0), ("a", 133L, 1), ("a", 166L, 1), ("a", 200L, 0),
      ("b", 500L, 0), ("b", 300L, 1), ("b", 100L, 0)), out.toSeq.toString)
  }

  test("gapFillInterp: observed days pass through bit-exactly and spine covers the span") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, dir, "events")
      .withColumn("k2", concat_ws("|", col("user_id"), col("event_type")))
    val out = TimeSeries.gapFillInterp(ev, "k2", "ts", "value", "event_id")
    val observed = ev.groupBy(col("k2"), to_date(col("ts")).as("day"))
      .agg(expr("max_by(CAST(floor(value*100) AS BIGINT), event_id)")
        .as("v"))
    val joined = out.join(observed, Seq("k2", "day"))
    assert(joined.where(col("cents_filled") =!= col("v")).count() == 0)
    assert(out.where(col("is_interp") === 1 && col("cents_filled").isNull)
      .count() == 0, "every interior gap must fill")
  }

  // ---- paretoFrontier ------------------------------------------------

  test("paretoFrontier: exactly the non-dominated points, with witnesses and point counts") {
    import spark.implicits._
    val pts = Seq((1L, 1, 10), (2L, 2, 8), (3L, 2, 8), (4L, 3, 5),
      (5L, 2, 7), (6L, 3, 9), (7L, 1, 9)).toDF("id", "a", "b")
    // dominance: (3,9) dominates (2,8),(2,7),(1,9),(3,5); frontier =
    // (1,10) and (3,9)
    val out = Curation.paretoFrontier(pts, "id", col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq((1L, 10L, 1L, 1L), (3L, 9L, 6L, 1L)), out.toString)
  }

  test("paretoFrontier: no output point is dominated and every input is dominated-or-on-frontier (random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val out = Curation.paretoFrontier(pts.toDF("id", "a", "b"), "id",
      col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    def dominated(p: (Long, Long), q: (Long, Long)): Boolean =
      q._1 >= p._1 && q._2 >= p._2 && q != p
    out.foreach(p => assert(!pts.map(x => (x._2, x._3))
      .exists(q => dominated(p, q)), s"$p dominated"))
    pts.map(x => (x._2, x._3)).foreach { p =>
      assert(out.contains(p) || out.exists(q => dominated(p, q)),
        s"$p neither on frontier nor dominated")
    }
  }

  // ---- segmentDupes --------------------------------------------------

  test("segmentDupes: cross-doc chunks flagged, intra-doc repeats and partial chunks not") {
    import spark.implicits._
    val docs = Seq(
      1L -> "a b c d e f",     // chunks "a b c", "d e f"
      2L -> "a b c x y z",     // shares "a b c" with doc 1
      3L -> "p q r",           // unique chunk
      4L -> "x y",             // no full chunk -> absent from output
      5L -> "m n o m n o"      // SAME-doc repeat only -> not a dup
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDupes(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq((1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L), (5L, 2L, 0L, 0L)), out.toString)
  }

  test("segmentDupes: agrees with brute force on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(311311)
    val base = (0 until 80).map { i =>
      (i.toLong, (0 until (rnd.nextInt(10) + 1))
        .map(_ => ('a' + rnd.nextInt(3)).toChar.toString).mkString(" "))
    }
    val got = Dedup.segmentDupes(base.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val chunks = base.map { case (id, t) =>
      id -> t.split(" ").grouped(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
    }
    val docsOf = chunks.flatMap { case (id, cs) => cs.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).distinct.size }
    val want = chunks.filter(_._2.nonEmpty).map { case (id, cs) =>
      (id, cs.size.toLong, cs.count(c => docsOf(c) >= 2).toLong)
    }.toSet
    assert(got == want)
  }

  // ---- repetitionAudit -----------------------------------------------

  test("repetitionAudit: hand-computed ratios incl. the single-word degenerate") {
    import spark.implicits._
    val docs = Seq(1L -> "a a a b", 2L -> "z").toDF("doc_id", "text")
    val out = Ext9SpecHelpers.rowsAsLongSeq(
      TextStats.repetitionAudit(docs))
    // doc 1: 4 words 2 types -> dup 500000; top "a" 3/4 -> 750000;
    // bigrams "a a","a a","a b": 3 tokens 2 types -> dup 333333
    assert(out == Seq(
      Seq(1L, 4L, 2L, 500000L, 750000L, 3L, 333333L),
      Seq(2L, 1L, 1L, 0L, 1000000L, 0L, 0L)), out.toString)
  }

  // ---- cohenKappa ----------------------------------------------------

  test("cohenKappa: matches an independent in-test computation at sf0.001") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val got = Profile.cohenKappa(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val raw = ev.select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong,
        r.getLong(2)))
    def bucket(c: Long): Int =
      if (c < 2000) 0 else if (c < 6000) 1 else 2
    val want = raw.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val ab = xs.map { case (_, c, e) =>
        (bucket(c), bucket(c + (e * 37) % 1000 - 500)) }
      val n = ab.size.toLong
      val agree = ab.count(p => p._1 == p._2).toLong
      val prod = (0 to 2).map(k => ab.count(_._1 == k).toLong *
        ab.count(_._2 == k).toLong).sum
      val po = agree * 1000000L / n
      val pe = prod * 1000000L / (n * n)
      val kappa = if (pe >= 1000000L) 1000000L
        else (po - pe) * 1000000L / (1000000L - pe)
      (t, n, po, pe, kappa)
    }
    assert(got == want, s"got $got want $want")
    // the noisy-copy construction must keep the numerator positive
    got.foreach(r => assert(r._3 > r._4, s"po<=pe in $r"))
  }

  test("cohenKappa: perfect-agreement degenerate pins kappa at 1e6") {
    import spark.implicits._
    import java.sql.Timestamp
    // cents=100, noise=(0*37)%1000-500=-500 -> both raters bucket 0;
    // one class only -> pe = 1e6 -> kappa defined as 1e6
    val ev = Seq((0L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "t",
      1.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Profile.cohenKappa(ev).collect()
    assert(out.length == 1 && out(0).getLong(4) == 1000000L)
  }

  // ---- precisionAtK --------------------------------------------------

  test("precisionAtK: equals the sort-based formulation on a random labeled set") {
    import spark.implicits._
    val rnd = new scala.util.Random(314314)
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f), i % 4)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.precisionAtK(emb, 7, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    def dot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * 10000).toLong *
          math.floor(y.toDouble * 10000).toLong }.sum
    val want = vecs.filter(_._1 % 7 == 0).map { case (qid, qe, ql) =>
      val top = vecs.filter(_._1 != qid)
        .map(v => (dot(qe, v._2), v._1, v._3))
        .sortBy { case (d, id, _) => (-d, id) }.take(5)
      qid -> top.count(_._3 == ql).toLong
    }.toMap
    assert(got == want, s"got $got want $want")
  }

  // ---- noveltyCurve --------------------------------------------------

  test("noveltyCurve: verbatim repeat contributes zero novelty; first bucket of fresh content is fully novel") {
    import spark.implicits._
    val docs = Seq(
      0L -> "a b c d",   // shingles "a b c","b c d" both novel
      1L -> "a b c d",   // exact repeat: 0 novel
      2L -> "p q r s",   // fresh: 2 novel
      3L -> "p q r s t"  // 3 shingles, only "r s t" novel
    ).toDF("doc_id", "text")
    val out = Curation.noveltyCurve(docs, bucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq((0L, 2L, 4L, 2L, 500000L),
      (1L, 2L, 5L, 3L, 600000L)), out.toString)
  }

  // ---- wassersteinDrift ----------------------------------------------

  test("wassersteinDrift: hand-computed transport cost and zero self-drift") {
    import spark.implicits._
    def docsOf(rows: Seq[(String, Long)]) =
      rows.zipWithIndex.map { case ((s, n), i) =>
        (i.toLong, "x", "en", s, n) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // src0 {1,1,3} vs srcA {2,2,4}: optimal transport = 2*1 + 1*1 = 3
    // over 3 mass units -> W1 = 1.0 -> micro = 1000000, scaled = 9
    val out = Profile.wassersteinDrift(docsOf(Seq(
      ("src0", 1L), ("src0", 1L), ("src0", 3L),
      ("srcA", 2L), ("srcA", 2L), ("srcA", 4L)))).collect()
    assert(out.length == 1)
    assert((out(0).getString(0), out(0).getLong(1), out(0).getLong(2),
      out(0).getLong(3), out(0).getLong(4)) == ("srcA", 3L, 3L, 9L, 1000000L))
    // identical distribution -> zero drift
    val self = Profile.wassersteinDrift(docsOf(Seq(
      ("src0", 5L), ("src0", 9L), ("srcB", 5L), ("srcB", 9L)))).collect()
    assert(self.length == 1 && self(0).getLong(3) == 0L
      && self(0).getLong(4) == 0L)
  }

  // ---- contaminationMatrix -------------------------------------------

  test("contaminationMatrix: only overlapping pairs emitted, exact jaccard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "en", "sA", 7L),
      (2L, "b c d e", "en", "sB", 7L),
      (3L, "x y z w", "en", "sC", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.contaminationMatrix(docs).collect()
    // sA {abc,bcd} sB {bcd,cde}: shared 1, union 3 -> 333333; sC disjoint
    assert(out.length == 1)
    assert((out(0).getString(0), out(0).getString(1), out(0).getLong(2),
      out(0).getLong(3), out(0).getLong(4), out(0).getLong(5)) ==
      ("sA", "sB", 2L, 2L, 1L, 333333L))
  }

  // ---- lengthBalanceWeights ------------------------------------------

  test("lengthBalanceWeights: uniform buckets get weight 1e6; weighted mass conserved within truncation") {
    import spark.implicits._
    val docs = Seq(10L, 20L, 60L, 70L).zipWithIndex
      .map { case (n, i) => (i.toLong, "x", "en", "s", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Sampling.lengthBalanceWeights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq((0L, 2L, 500000L, 1000000L),
      (1L, 2L, 500000L, 1000000L)), out.toString)
    // skewed corpus: sum(n_docs * weight_ppm) within B*1e3 of N*1e6
    val docs2 = (0 until 30).map(i =>
        (i.toLong, "x", "en", "s", if (i < 27) 10L else 160L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Sampling.lengthBalanceWeights(docs2).collect()
    val mass = rows.map(r => r.getLong(1) * r.getLong(3)).sum
    assert(math.abs(mass - 30L * 1000000L) <= rows.length * 30L,
      mass.toString)
  }

  // ---- hilbertRewrite ------------------------------------------------

  test("hilbertRewrite: identical content to the Z-order rewrite (layout changes, data does not)") {
    val dir = "/root/testdata/sf0.001"
    val h = graft.io.Warehouse.hilbertRewrite(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val z = graft.io.Warehouse.zorderRewrite(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(h == z && h.nonEmpty)
  }
}

/** Row flattening helper for fixed-width Long rows (first col id). */
object Ext9SpecHelpers {
  def rowsAsLongSeq(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i => r.getLong(i)))
}
