package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 hardening invariants (ADVICE r11): crafted-input guards
  * that must fail LOUDLY instead of dividing by zero or colliding on
  * generated aliases. */
class Ext13Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ---- pixelHistogramAudit pixelOff guard ---------------------------------

  test("pixelHistogramAudit: crafted pixelOff at/past the payload end fails loudly, not div0") {
    import spark.implicits._
    // hand-built header: valid magic + fileSize, pixelOff == length
    val len = 64
    val bad = new Array[Byte](len)
    bad(0) = 'B'.toByte; bad(1) = 'M'.toByte
    val buf = java.nio.ByteBuffer.wrap(bad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(2, len)   // fileSize: consistent
    buf.putInt(10, len)  // pixelOff: one past the last byte -> px = 0
    val docs = Seq((1L, bad)).toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.pixelHistogramAudit(docs).collect()
    }
    assert(e.getMessage.contains("pixel offset"), e.getMessage)
  }

  // ---- correlationMatrix name validation -----------------------------------

  test("correlationMatrix: duplicate column names are rejected, not silently collided") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.correlationMatrix(df,
        Seq("x" -> col("a"), "x" -> col("b")))
    }
    assert(e.getMessage.contains("distinct"), e.getMessage)
  }

  test("correlationMatrix: a non-identifier name is rejected up front with a clear message") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.correlationMatrix(df,
        Seq("a" -> col("a"), "b-1" -> col("b")))
    }
    assert(e.getMessage.contains("identifier"), e.getMessage)
  }

  // ---- in-row simhash parity (x406 streaming front door) ------------------

  test("inRowSimhash: integer-identical to Dedup.simhash on the corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val inRow = docs
      .withColumn("t", TextStats.tokensCol(col("text")))
      .where(size(col("t")) > 0) // exploded form drops tokenless docs
      .select(col("doc_id"),
        graft.streaming.Streaming.inRowSimhash("t").as("simhash"))
    val exploded = Dedup.simhash(docs)
    assert(inRow.orderBy("doc_id").collect().toSeq ==
      exploded.orderBy("doc_id").collect().toSeq)
  }

  // ---- Fellegi-Sunter record linkage (x405) --------------------------------

  test("fellegiSunter: scores equal a driver-side brute-force replay") {
    import spark.implicits._
    val clean = Seq(
      (1L, "alpha beta", "B1", 10L), (2L, "gamma delta", "B1", 10L),
      (3L, "epsilon zeta", "B2", 20L), (4L, "eta theta", "B2", 20L),
      (5L, "iota kappa", "B1", 30L)
    ).toDF("id", "name", "brand", "size")
    // one corrupted name (id 2), one corrupted size (id 4)
    val dirty = Seq(
      (1L, "alpha beta", "B1", 10L), (2L, "gamma", "B1", 10L),
      (3L, "epsilon zeta", "B2", 20L), (4L, "eta theta", "B2", 21L),
      (5L, "iota kappa", "B1", 30L)
    ).toDF("id", "name", "brand", "size")
    val got = Entity.fellegiSunter(clean, dirty, "id",
      Seq("name", "brand", "size"),
      Seq(Seq("brand", "size"), Seq("brand", "name"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // brute-force replay in plain Scala
    val cRows = Seq((1L, "alpha beta", "B1", 10L), (2L, "gamma delta", "B1", 10L),
      (3L, "epsilon zeta", "B2", 20L), (4L, "eta theta", "B2", 20L),
      (5L, "iota kappa", "B1", 30L))
    val dRows = Seq((1L, "alpha beta", "B1", 10L), (2L, "gamma", "B1", 10L),
      (3L, "epsilon zeta", "B2", 20L), (4L, "eta theta", "B2", 21L),
      (5L, "iota kappa", "B1", 30L))
    def uPpm[A](vals: Seq[A]): Long = {
      val n = vals.size.toLong
      val s2 = vals.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      math.max(s2 * 1000000L / (n * n), 1L)
    }
    def wa(u: Long): Long = java.lang.Long.toBinaryString(1000000L / u).length - 1L
    val w = Seq(uPpm(cRows.map(_._2)), uPpm(cRows.map(_._3)), uPpm(cRows.map(_._4))).map(wa)
    val expected = (for {
      c <- cRows; d <- dRows
      if (c._3 == d._3 && c._4 == d._4) || (c._3 == d._3 && c._2 == d._2)
    } yield {
      val ag = Seq(c._2 == d._2, c._3 == d._3, c._4 == d._4)
      (c._1, d._1, ag.count(identity).toLong,
        ag.zip(w).map { case (a, wt) => if (a) wt else -4L }.sum)
    }).toSet
    assert(got == expected, s"got ${got.toSeq.sorted}\nexp ${expected.toSeq.sorted}")
  }

  test("fellegiSunter: block purging drops saturated blocks per pass, keeps the rest") {
    import spark.implicits._
    val clean = Seq(
      (1L, "alpha beta", "B1", 10L), (2L, "gamma delta", "B1", 10L),
      (3L, "epsilon zeta", "B2", 20L), (4L, "eta theta", "B2", 20L),
      (5L, "iota kappa", "B1", 30L)
    ).toDF("id", "name", "brand", "size")
    val dirty = Seq(
      (1L, "alpha beta", "B1", 10L), (2L, "gamma", "B1", 10L),
      (3L, "epsilon zeta", "B2", 20L), (4L, "eta theta", "B2", 21L),
      (5L, "iota kappa", "B1", 30L)
    ).toDF("id", "name", "brand", "size")
    // cap 1: the (brand, size) pass keeps only its singleton block
    // (B1, 30) -> pair (5,5); the (brand, name) pass has all-singleton
    // blocks (names unique) and keeps every exact-name pair. A pair
    // survives if ANY pass keeps it.
    val got = Entity.fellegiSunter(clean, dirty, "id",
        Seq("name", "brand", "size"),
        Seq(Seq("brand", "size"), Seq("brand", "name")), maxBlockRows = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (3L, 3L), (4L, 4L), (5L, 5L)), got)
  }

  test("fellegiSunter: a derived (non-scored) blocking key admits candidates, never weight") {
    import spark.implicits._
    // id 2's name loses its last token: no scored-field pass can block
    // it together with its clean twin, but a derived first-token key
    // (corruption-tolerant — equal whether or not the suffix was
    // dropped) can. Scoring must still use ONLY the scored fields.
    val clean = Seq(
      (1L, "alpha beta", "B1", 10L), (2L, "gamma delta", "B2", 20L)
    ).toDF("id", "name", "brand", "size")
    val dirty = Seq(
      (1L, "alpha beta", "B1", 10L), (2L, "gamma", "B2", 21L)
    ).toDF("id", "name", "brand", "size")
    def withHead(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("head", regexp_extract(col("name"), "^(\\S+)", 1))
    val got = Entity.fellegiSunter(withHead(clean), withHead(dirty), "id",
        Seq("name", "brand", "size"),
        Seq(Seq("brand", "name"), Seq("brand", "head")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (2,2) agrees on brand only (n_agree 1): reachable ONLY via the
    // derived head pass; (1,1) full agreement via either pass
    assert(got == Set((1L, 1L, 3L), (2L, 2L, 1L)), got)
    // a blocking key absent from a frame still fails loudly
    intercept[IllegalArgumentException] {
      Entity.fellegiSunter(clean, dirty, "id",
        Seq("name", "brand", "size"), Seq(Seq("brand", "nope")))
    }
  }


  // ---- Neyman allocation (x407) --------------------------------------------

  test("neymanAllocation: exact isqrt and seats match a driver-side replay") {
    import spark.implicits._
    // two strata: A constant (sd 0 -> zero seats), B spread
    val rows = Seq(
      ("A", 1L, 10L), ("A", 2L, 10L), ("A", 3L, 10L),
      ("B", 4L, 0L), ("B", 5L, 100L), ("B", 6L, 50L), ("B", 7L, 10L))
    val df = rows.toDF("s", "k", "x")
    val got = Sampling.neymanAllocation(df, "s", "k", col("x"), 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    def isqrt(v: Long): Long = {
      var s = math.sqrt(v.toDouble).toLong
      if ((s + 1) * (s + 1) <= v) s += 1
      if (s * s > v) s -= 1
      s
    }
    def nsd(xs: Seq[Long]): Long = {
      val n = xs.size.toLong; val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      isqrt(n * sxx - sx * sx)
    }
    val a = nsd(Seq(10L, 10L, 10L)); val b = nsd(Seq(0L, 100L, 50L, 10L))
    assert(a == 0L)
    // all 3 seats to B (A's weight is zero)
    assert(got == Seq(("A", 3L, a, 0L, 0L), ("B", 4L, b, 3L, 3L)))
    // isqrt correction: perfect square and its neighbors
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 35L, 36L, 37L,
      (1L << 31) * (1L << 31) - 1, (1L << 31) * (1L << 31))
    val viaSpark = vals.toDF("v")
      .select(floor(sqrt(col("v").cast("double"))).cast("bigint").as("s0"),
        col("v"))
      .select(when((col("s0") + 1) * (col("s0") + 1) <= col("v"),
        col("s0") + 1).otherwise(col("s0")).as("s1"), col("v"))
      .select(when(col("s1") * col("s1") > col("v"), col("s1") - 1)
        .otherwise(col("s1")).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSpark == vals.map(v =>
      java.math.BigInteger.valueOf(v).sqrt().longValueExact()))
  }

  // ---- shardBalance (x408) -------------------------------------------------

  test("shardBalance: partition of the corpus, serpentine order, token balance") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val idSum = docs.agg(sum("doc_id")).head.getLong(0)
    val out = Pack.shardBalance(docs, 8).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L until 8L)) // all shards inhabited
    // exactly-once partition: doc counts and id mass both reconcile
    assert(out.map(_.getLong(1)).sum == n)
    assert(out.map(_.getLong(4)).sum == idSum)
    // serpentine deals whole laps: shard doc counts differ by <= 1
    val counts = out.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, counts.toSeq)
    // token balance: every shard within 2% of ideal on this corpus
    val ppm = out.map(_.getLong(3))
    assert(ppm.forall(p => p >= 980000 && p <= 1020000), ppm.toSeq)
    // brute-force replay of the serpentine rule on the driver
    val ranked = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, t) => (-t, id) }
    val expect = ranked.zipWithIndex.groupBy { case (_, r0) =>
      if ((r0 / 8) % 2 == 0) r0 % 8 else 7 - (r0 % 8)
    }.map { case (s, xs) => s.toLong ->
      (xs.length.toLong, xs.map(_._1._2).sum, xs.map(_._1._1).sum)
    }
    out.foreach { r =>
      val (nd, tok, ids) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(4)) == ((nd, tok, ids)),
        s"shard ${r.getLong(0)}")
    }
  }

}
