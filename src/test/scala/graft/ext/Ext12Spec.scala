package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 operator invariants: hand-computed fixtures for the
  * operators judged as x393–x396. */
class Ext12Spec extends SparkSpec {

  // ---- ngramDecontaminate (x393) ---------------------------------------

  test("ngramDecontaminate: exact n-gram sharing flags, count and witness") {
    import spark.implicits._
    // n=3 windows for a hand-checkable fixture. eval doc 10: "a b c d"
    // -> 3-grams {abc, bcd}; eval doc 11: "x y z" -> {xyz}.
    val eval0 = Seq((10L, "a b c d"), (11L, "x y z"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "p q a b c d r"),   // shares abc AND bcd -> n_shared=2, ev 10
      (2L, "p q x y z"),       // shares xyz -> n_shared=1, ev 11
      (3L, "a b x y c d"),     // no shared 3-gram
      (4L, "a b")              // too short for any window
    ).toDF("doc_id", "text")
    val out = Curation.ngramDecontaminate(train, eval0, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 10L), (2L, 1L, 11L)), out.mkString(","))
  }

  test("ngramDecontaminate: a window shared with SEVERAL eval docs counts once, witness is min") {
    import spark.implicits._
    val eval0 = Seq((20L, "a b c"), (21L, "z a b c"))
      .toDF("doc_id", "text")
    val train = Seq((1L, "q a b c q")).toDF("doc_id", "text")
    val out = Curation.ngramDecontaminate(train, eval0, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // "a b c" appears in both eval docs: n_shared counts the WINDOW once,
    // the witness is the smaller eval id
    assert(out == Seq((1L, 1L, 20L)), out.mkString(","))
  }

  // ---- correlationMatrix (x394) ------------------------------------------

  test("correlationMatrix: hand-computed signed r2 milli for perfect, anti and zero correlation") {
    import spark.implicits._
    // x = 1..4; y = 2x (r=+1); z = -x (r=-1); w = (1,-1,1,-1) vs x:
    // cov(x,w) = 4*(1-1+3-4... compute: sum xw = 1*1+2*(-1)+3*1+4*(-1) = -2
    // sx=10 sw=0 -> cov = 4*(-2) - 10*0 = -8; va(x)=4*30-100=20;
    // vb(w)=4*4-0=16 -> r2 = 64*1000 div 320 = 200, sign=-1 -> -200
    val df = Seq((1L, 2L, -1L, 1L), (2L, 4L, -2L, -1L),
      (3L, 6L, -3L, 1L), (4L, 8L, -4L, -1L)).toDF("x", "y", "z", "w")
    val out = Profile.correlationMatrix(df, Seq(
      "w" -> col("w"), "x" -> col("x"), "y" -> col("y"),
      "z" -> col("z"))).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))))
      .toMap
    assert(out(("x", "y")) == 1000L)   // perfect positive
    assert(out(("x", "z")) == -1000L)  // perfect negative
    assert(out(("w", "x")) == -200L)   // hand-computed partial
    assert(out(("y", "z")) == -1000L)
  }

  test("correlationMatrix: zero-variance column reports NULL, not overflow or div0") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "k")
    val out = Profile.correlationMatrix(df,
      Seq("k" -> col("k"), "x" -> col("x"))).collect()
    assert(out.length == 1 && out.head.isNullAt(3), out.mkString(","))
  }

  test("correlationMatrix: the documented exactness guard returns NULL past the cov bound") {
    import spark.implicits._
    // two copies of a 4e17-scale pair: cov exceeds the 3.1e17 guard
    val big = 400000000000000000L
    val df = Seq((big, big), (-big, -big), (big, big), (-big, -big))
      .toDF("x", "y")
    val out = Profile.correlationMatrix(df,
      Seq("x" -> col("x"), "y" -> col("y"))).collect()
    assert(out.length == 1 && out.head.isNullAt(3),
      "guard must NULL rather than overflow: " + out.mkString(","))
  }

  // ---- encodingDamage (x395) ----------------------------------------------

  test("encodingDamage: each damage class counted, clean docs zero") {
    import spark.implicits._
    val docs = Seq(
      ("a", "clean text here"),
      ("a", "bad � and Ã© mojibake"),
      ("b", "one &amp; two &#42; three &#99; four"),
      ("b", "ctrl\u0001char\u001F here"),
      ("b", "tabs\tand\nnewlines are fine")
    ).toDF("source", "text")
    val out = TextStats.encodingDamage(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // a: 2 docs, 1 replacement, 1 mojibake, damaged 1/2 = 500000 ppm
    // b: 3 docs, entities: &amp; &#42; &#99; = 3 in doc 1; ctrl: 2 in
    //    doc 2; tab/newline NOT counted -> damaged 2/3 = 666666 ppm
    assert(out == Seq(
      ("a", 2L, 1L, 1L, 0L, 0L, 500000L),
      ("b", 3L, 0L, 0L, 3L, 2L, 666666L)), out.mkString(","))
  }

  // ---- harmonicCentralityBounded (x396) ------------------------------------

  test("harmonicCentralityBounded: path graph distances counted once at their shortest hop") {
    import spark.implicits._
    // path a-b-c-d-e, probe a: n1={b}, n2={c}, n3={d} (e is 4 hops, out
    // of band); probe c: n1={b,d}, n2={a,e}, n3={} — one orientation
    // only, the operator symmetrizes
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val probes = Seq("a", "c", "zz").toDF("node") // zz: isolated, dropped
    val out = Graph.harmonicCentralityBounded(edges, probes).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      ("a", 1L, 1L, 1L, 1833L),
      ("c", 2L, 2L, 0L, 3000L)), out.mkString(","))
  }

  test("harmonicCentralityBounded: cycle revisit does not double-count (anti-join vs visited)") {
    import spark.implicits._
    // triangle a-b-c: from a, b and c are BOTH at distance 1 (c via the
    // direct edge), distance-2 set is empty (everything already seen)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val probes = Seq("a").toDF("node")
    val out = Graph.harmonicCentralityBounded(edges, probes).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(("a", 2L, 0L, 0L, 2000L)), out.mkString(","))
  }

  // ---- quantileEffects (x400) -----------------------------------------------

  test("quantileEffects: type-1 deciles per arm, gap per decile") {
    import spark.implicits._
    // treated (even user) cents 1..10, control (odd) cents 11..20:
    // decile k -> q_t = k, q_c = 10 + k, qte = -10 everywhere
    val rows = (1 to 10).map(i => (2L, i / 100.0)) ++
      (1 to 10).map(i => (3L, (10 + i) / 100.0))
    val events = rows.toDF("user_id", "value")
    val out = Experiment.quantileEffects(events,
        col("user_id") % 2 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == (1 to 9).map(k => (k.toLong, k.toLong, 10L + k, -10L)),
      out.mkString(","))
  }

  // ---- pixelHistogramAudit (x398) ------------------------------------------

  test("pixelHistogramAudit: real bytes counted — n_chars=1 gives the 16-byte 2x2 image, all values distinct") {
    import spark.implicits._
    // n_chars=1 -> w=2, h=2, rowSize=((3*2+3) div 4)*4=8, px=16:
    // bytes 0..15 -> 16 distinct values, modal 0 with count 1
    val docs = Seq((7L, 1L)).toDF("doc_id", "n_chars")
    val out = Multimodal.pixelHistogramAudit(
        Multimodal.withBmpPayload(docs)).collect()
      .map(r => (0 to 5).map(r.getLong).toList).toSeq
    assert(out == Seq(List(7L, 16L, 16L, 0L, 1L, 62500L)), out.toString)
  }

  test("pixelHistogramAudit: a wrapped-cycle image has modal count px div 256 (+1 under remainder)") {
    import spark.implicits._
    // n_chars=300 -> w=300%64+1=45, h=300%37+1=5,
    // rowSize=((135+3) div 4)*4=136, px=680: full=2, rem=168 ->
    // modal 0 count 3, distinct 256, ppm=3*1e6 div 680=4411
    val docs = Seq((9L, 300L)).toDF("doc_id", "n_chars")
    val out = Multimodal.pixelHistogramAudit(
        Multimodal.withBmpPayload(docs)).collect()
      .map(r => (0 to 5).map(r.getLong).toList).toSeq
    assert(out == Seq(List(9L, 680L, 256L, 0L, 3L, 4411L)), out.toString)
  }

  // ---- suffixDupes (x399) ---------------------------------------------------

  test("suffixDupes: strict suffixes flagged with the reversed-space witness; prefixes are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"),   // contains the suffix "world" (doc 3)
      (2L, "cruel world"),   // also ends in "world"
      (3L, "world"),         // strict suffix of 1 AND 2
      (4L, "worldly news"),  // doc 3 is a PREFIX of this, not a suffix
      (5L, "o world")        // suffix of nothing; itself contains "world"
    ).toDF("doc_id", "text")
    val out = Dedup.suffixDupes(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // reversed space: "dlrow"(3) extends to "dlrow leurc"(2) <
    // "dlrow o"(5) < "dlrow olleh"(1) -> witness 2; "dlrow o"(5) is a
    // strict prefix of "dlrow olleh" only ("o world" IS a suffix of
    // "hello world") -> witness 1; doc 4 extends doc 3 as a PREFIX
    // ("worldly...") and must not flag it
    assert(out == Seq((3L, 5L, 2L), (5L, 7L, 1L)), out.mkString(","))
  }

  // ---- randomized brute-force cross-checks ----------------------------------
  // Small seeded corpora, the operator vs an independent in-memory
  // reference implementation — catches the boundary cases hand
  // fixtures miss (window edges, tie-breaks, short texts).

  private val tokenPool =
    Vector("a", "b", "c", "d", "e", "f", "g", "h")

  test("ngramDecontaminate == brute force on seeded random corpora") {
    import spark.implicits._
    val n = 3
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def doc() = Seq.fill(1 + rnd.nextInt(8))(
        tokenPool(rnd.nextInt(tokenPool.size))).mkString(" ")
      val train = (1L to 30L).map(i => (i, doc()))
      val eval0 = (101L to 110L).map(i => (i, doc()))
      def windows(t: String): Set[String] =
        t.split(" ").toSeq.sliding(n).filter(_.size == n)
          .map(_.mkString(" ")).toSet
      val evalW = eval0.map { case (id, t) => id -> windows(t) }
      val expected = train.flatMap { case (id, t) =>
        val w = windows(t)
        val sharedWin = w.filter(g => evalW.exists(_._2.contains(g)))
        if (sharedWin.isEmpty) None
        else Some((id,
          sharedWin.size.toLong,
          evalW.filter(e => e._2.intersect(w).nonEmpty).map(_._1).min))
      }.sortBy(_._1)
      val out = Curation.ngramDecontaminate(
          train.toDF("doc_id", "text"), eval0.toDF("doc_id", "text"), n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(out == expected, s"seed $seed:\n$out\nvs\n$expected")
    }
  }

  test("suffixDupes == brute force on seeded random corpora") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      def doc() = Seq.fill(1 + rnd.nextInt(6))(
        tokenPool(rnd.nextInt(3))).mkString("") // tiny alphabet: collisions
      val docs = (1L to 40L).map(i => (i, doc()))
      val owners = docs.groupBy(_._2).map { case (t, ds) =>
        t -> ds.map(_._1).min }
      val expected = docs.flatMap { case (id, t) =>
        val exts = owners.keys.filter(u => u != t && u.endsWith(t))
        if (exts.isEmpty) None
        else {
          val best = exts.minBy(_.reverse)
          Some((id, t.length.toLong, owners(best)))
        }
      }.sortBy(_._1)
      val out = Dedup.suffixDupes(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(out == expected, s"seed $seed:\n$out\nvs\n$expected")
    }
  }

  test("correlationMatrix == BigInt brute force on seeded random columns") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(200 + seed)
      val rows = Seq.fill(25)((rnd.nextLong(2000) - 1000,
        rnd.nextLong(2000) - 1000, rnd.nextLong(5)))
      def r2(xs: Seq[Long], ys: Seq[Long]): Option[Long] = {
        val m = BigInt(xs.size)
        val sx = BigInt(xs.sum); val sy = BigInt(ys.sum)
        val sxx = xs.map(v => BigInt(v) * v).sum
        val syy = ys.map(v => BigInt(v) * v).sum
        val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
        val cov = m * sxy - sx * sy
        val va = m * sxx - sx * sx; val vb = m * syy - sy * sy
        if (va == 0 || vb == 0) None
        else Some((cov.sign * (cov * cov * 1000 / (va * vb))).toLong)
      }
      val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
      val expected = Map(
        ("x", "y") -> r2(xs, ys), ("x", "z") -> r2(xs, zs),
        ("y", "z") -> r2(ys, zs))
      val out = Profile.correlationMatrix(rows.toDF("x", "y", "z"),
          Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
        .collect().map(r => ((r.getString(0), r.getString(1)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      assert(out == expected, s"seed $seed:\n$out\nvs\n$expected")
    }
  }
}
