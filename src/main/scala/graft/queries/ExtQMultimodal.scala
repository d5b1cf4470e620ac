package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AsofJoin, Basket, Bpe, Cdc, Curation, Dedup, Entity, Expectations, Experiment, Graph, Ids, LmQuality, Multimodal, Pack, Privacy, Profile, Rollup, Sampling, SessionConf, Similarity, TextStats, TimeSeries}
import graft.streaming.Streaming
import graft.queries.ExtShared._

/** §2.8 judged queries — multimodal binary columns: BMP/WAV decode, features, audits. */
private[queries] object ExtQMultimodal {

  val qs: Seq[Q] = Seq(

    // ---- multimodal: REAL BMP decode over distributed binary payloads --
    // Every doc carries a valid 24bpp BMP built deterministically from
    // n_chars; the Spark side PARSES the actual header bytes in
    // mapPartitions while the oracle re-derives the fields from the
    // construction formula — a decoder bug is a hash mismatch, not a
    // silently-agreeing stub. Shared DuckDB geometry CTE:
    //   w = n_chars%64+1, h = n_chars%37+1,
    //   rowsize = 4-aligned 3w, px = rowsize*h, n_bytes = 54 + px.
    Q.df("x61_multimodal_meta",
      (s, dir) => Multimodal.decodeBmp(
        Multimodal.withBmpPayload(Tables.load(s, dir, "documents")))
        .orderBy("doc_id"),
      s"""WITH $duckBmpGeom
         |SELECT doc_id, CAST(54 + px AS BIGINT) AS n_bytes,
         |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST(24 AS BIGINT) AS bpp, CAST(px AS BIGINT) AS px_bytes
         |FROM g ORDER BY doc_id""".stripMargin),


    // the audio twin of x61: every doc carries a valid 16-bit PCM WAV
    // (RIFF built executor-side, parameters a pure function of n_chars)
    // and the judged fields are parsed from the actual bytes — the
    // oracle re-derives the construction formula, so a parser bug is a
    // correctness failure
    Q.df("x121_audio_meta",
      (s, dir) => Multimodal.decodeWav(
        Multimodal.withWavPayload(Tables.load(s, dir, "documents")))
        .orderBy("doc_id"),
      """SELECT doc_id,
        |  CAST(8000 + (n_chars % 3) * 4000 AS BIGINT) AS sample_rate,
        |  CAST(1 + n_chars % 2 AS BIGINT) AS channels,
        |  CAST(16 AS BIGINT) AS bits,
        |  CAST(n_chars % 500 + 50 AS BIGINT) AS n_samples,
        |  CAST(floor(10000.0 * (n_chars % 500 + 50) /
        |       (8000 + (n_chars % 3) * 4000)) AS BIGINT) AS dur_sec_x10k
        |FROM documents ORDER BY doc_id""".stripMargin),


    // frame sampling over the BMP payloads (video/audio chunk access)
    Q.df("x69_mm_frames",
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.withBmpPayload(Tables.load(s, dir, "documents")), 256),
      s"""WITH $duckBmpGeom
         |SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
         |  CAST(least(256, 54 + px - (i - 1) * 256) AS BIGINT) AS frame_bytes
         |FROM g, range(1, 1000) r(i)
         |WHERE (i - 1) * 256 < 54 + px
         |ORDER BY doc_id, frame_no""".stripMargin),


    // stub resize/downsample over the BMP payloads (every 4th byte);
    // the distributed resized payload stays binary — the oracle checks
    // the byte accounting
    Q.df("x80_mm_resize",
      (s, dir) => Multimodal.resize(
          Multimodal.withBmpPayload(Tables.load(s, dir, "documents")), 4)
        .select(col("doc_id"), col("n_bytes"), col("resized_bytes"))
        .orderBy("doc_id"),
      s"""WITH $duckBmpGeom
         |SELECT doc_id,
         |  CAST(54 + px AS BIGINT) AS n_bytes,
         |  CAST(floor((54 + px + 3) / 4.0) AS BIGINT) AS resized_bytes
         |FROM g ORDER BY doc_id""".stripMargin),


    // REAL feature extraction from decoded pixel data: 4-bin intensity
    // histogram over the image's pixel bytes, computed by the decoder;
    // the oracle derives the same counts in closed form from the pixel
    // fill rule (byte i = i % 256)
    Q.df("x70_mm_features",
      (s, dir) => {
        val f = Multimodal.decodeFeatures(
          Multimodal.withBmpPayload(Tables.load(s, dir, "documents")))
        f.select(col("doc_id"),
          element_at(col("features"), 1).as("b0"),
          element_at(col("features"), 2).as("b1"),
          element_at(col("features"), 3).as("b2"),
          element_at(col("features"), 4).as("b3"))
          .orderBy("doc_id")
      },
      s"""WITH $duckBmpGeom
         |SELECT doc_id,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 0)) AS BIGINT) AS b0,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 64)) AS BIGINT) AS b1,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 128)) AS BIGINT) AS b2,
         |  CAST(px // 256 * 64 + least(64, greatest(0, px % 256 - 192)) AS BIGINT) AS b3
         |FROM g ORDER BY doc_id""".stripMargin),


    // exact image dedup by content hash over the REAL payload bytes —
    // the object-store dedup step of a multimodal corpus; oracle = the
    // construction-formula twin: payloads are byte-identical exactly
    // when the dimension formula (n_chars % 64, n_chars % 37) collides
    Q.df("x142_image_dedup",
      (s, dir) => Multimodal.imageDedup(Tables.load(s, dir, "documents")),
      """SELECT CAST(count(*) AS BIGINT) AS n_images, min(doc_id) AS keep_id
        |FROM documents
        |GROUP BY n_chars % 64, n_chars % 37
        |ORDER BY keep_id""".stripMargin),


    // perceptual image near-dup: REAL dHash over decoded BMP pixels
    // (9x8 grid averages -> 64-bit difference hash), 4x16-bit hamming
    // bands for candidates, exact bit_count verify — the image twin of
    // the SimHash text path. Oracle = the construction-formula twin:
    // planted payloads are pure functions of doc_id (per-group texture
    // + one perturbed grid cell), so DuckDB re-derives each doc's
    // flipped-bit set and every within-group hamming distance without
    // seeing a byte; a decode, grid, hashing or banding bug all break
    // the pair set or the distances (see Multimodal.imageNearDup)
    Q.df("x152_image_near_dup",
      (s, dir) => Multimodal.imageNearDup(
        Tables.load(s, dir, "documents").where(col("doc_id") % 10 < 2), 8),
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 AS g,
        |    (doc_id * 7) % 9 AS cx, (doc_id * 5) % 8 AS cy
        |  FROM documents WHERE doc_id % 10 < 2),
        |cells0 AS (
        |  SELECT gs.g, gyy.gy, gxx.gx,
        |    CAST((CAST(gs.g * 1000 + gyy.gy * 9 + gxx.gx AS HUGEINT)
        |      * 2654435761) % 4294967296 AS BIGINT) AS x
        |  FROM generate_series(0, 7) gs(g)
        |  CROSS JOIN generate_series(0, 7) gyy(gy)
        |  CROSS JOIN generate_series(0, 8) gxx(gx)),
        |cells AS (
        |  SELECT g, gy, gx,
        |    CAST((CAST(xor(x, x >> 16) AS HUGEINT) * 2654435761) % 4294967296
        |      AS BIGINT) >> 24 AS v
        |  FROM cells0),
        |fl AS (
        |  SELECT i.doc_id, i.g,
        |    CASE WHEN i.cx >= 1 AND ((l.v < (c.v + 128) % 256) <> (l.v < c.v))
        |         THEN i.cy * 8 + i.cx - 1 END AS b1,
        |    CASE WHEN i.cx <= 7 AND (((c.v + 128) % 256 < r.v) <> (c.v < r.v))
        |         THEN i.cy * 8 + i.cx END AS b2
        |  FROM img i
        |  JOIN cells c ON c.g = i.g AND c.gy = i.cy AND c.gx = i.cx
        |  LEFT JOIN cells l ON l.g = i.g AND l.gy = i.cy AND l.gx = i.cx - 1
        |  LEFT JOIN cells r ON r.g = i.g AND r.gy = i.cy AND r.gx = i.cx + 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(
        |    (CASE WHEN a.b1 IS NOT NULL AND a.b1 IS DISTINCT FROM b.b1
        |          AND a.b1 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.b2 IS NOT NULL AND a.b2 IS DISTINCT FROM b.b1
        |          AND a.b2 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b1 IS NOT NULL AND b.b1 IS DISTINCT FROM a.b1
        |          AND b.b1 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b2 IS NOT NULL AND b.b2 IS DISTINCT FROM a.b1
        |          AND b.b2 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS dist
        |FROM fl a JOIN fl b ON a.g = b.g AND a.doc_id < b.doc_id
        |WHERE dist <= 8
        |ORDER BY doc_a, doc_b""".stripMargin),


    // perceptual near-dup KEEPER: the x152 dHash pair graph fed through
    // the judged connected-components machinery (x66/x71), labeling
    // every image with its cluster representative — the "keep one per
    // perceptual group" step of multimodal curation. Because x152's
    // recall is provably exact (every within-group pair found, none
    // across groups), each planted texture group is one complete
    // component and the CC labels must equal the per-group minimum —
    // which the oracle states directly from the construction formula
    Q.df("x157_image_neardup_keeper",
      (s, dir) => {
        val sub = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 10 < 2)
        val pairs = Multimodal.imageNearDup(sub, 8)
          .select(col("doc_a").as("d1"), col("doc_b").as("d2"))
        Dedup.clusters(sub, pairs).orderBy("doc_id")
      },
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 AS g
        |  FROM documents WHERE doc_id % 10 < 2)
        |SELECT doc_id, min(doc_id) OVER (PARTITION BY g) AS cluster_id
        |FROM img ORDER BY doc_id""".stripMargin),


    // perceptual AUDIO near-dup: REAL energy-difference fingerprint
    // over decoded 16-bit PCM samples (65 frame averages -> 64-bit
    // sketch), 8x8-bit hamming bands, exact bit_count verify — the
    // audio twin of x152 (narrower bands because a doc's two flipped
    // comparisons are adjacent bits that may straddle one boundary;
    // 8 bands always leave a clean one, so recall is exact). Oracle =
    // the construction-formula twin, never reading a sample (see
    // Multimodal.audioNearDup)
    Q.df("x158_audio_near_dup",
      (s, dir) => Multimodal.audioNearDup(
        Tables.load(s, dir, "documents").where(col("doc_id") % 10 < 2), 8),
      """WITH img AS (
        |  SELECT doc_id, doc_id % 8 AS g, (doc_id * 3) % 65 AS nf
        |  FROM documents WHERE doc_id % 10 < 2),
        |cells0 AS (
        |  SELECT gs.g, ff.f,
        |    CAST((CAST(gs.g * 1000 + 100 + ff.f AS HUGEINT)
        |      * 2654435761) % 4294967296 AS BIGINT) AS x
        |  FROM generate_series(0, 7) gs(g)
        |  CROSS JOIN generate_series(0, 64) ff(f)),
        |cells AS (
        |  SELECT g, f,
        |    CAST((CAST(xor(x, x >> 16) AS HUGEINT) * 2654435761) % 4294967296
        |      AS BIGINT) >> 24 AS v
        |  FROM cells0),
        |fl AS (
        |  SELECT i.doc_id, i.g,
        |    CASE WHEN i.nf >= 1 AND ((l.v < (c.v + 128) % 256) <> (l.v < c.v))
        |         THEN i.nf - 1 END AS b1,
        |    CASE WHEN i.nf <= 63 AND (((c.v + 128) % 256 < r.v) <> (c.v < r.v))
        |         THEN i.nf END AS b2
        |  FROM img i
        |  JOIN cells c ON c.g = i.g AND c.f = i.nf
        |  LEFT JOIN cells l ON l.g = i.g AND l.f = i.nf - 1
        |  LEFT JOIN cells r ON r.g = i.g AND r.f = i.nf + 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(
        |    (CASE WHEN a.b1 IS NOT NULL AND a.b1 IS DISTINCT FROM b.b1
        |          AND a.b1 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.b2 IS NOT NULL AND a.b2 IS DISTINCT FROM b.b1
        |          AND a.b2 IS DISTINCT FROM b.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b1 IS NOT NULL AND b.b1 IS DISTINCT FROM a.b1
        |          AND b.b1 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN b.b2 IS NOT NULL AND b.b2 IS DISTINCT FROM a.b1
        |          AND b.b2 IS DISTINCT FROM a.b2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS dist
        |FROM fl a JOIN fl b ON a.g = b.g AND a.doc_id < b.doc_id
        |WHERE dist <= 8
        |ORDER BY doc_a, doc_b""".stripMargin),


    // per-clip loudness audit over REAL decoded PCM: every 16-bit LE
    // sample read from the data chunk; the oracle re-derives sum/peak
    // from buildWav's closed form (byte i = i%256 => |sample| has a
    // 128-sample period summing 2088960) without seeing the bytes —
    // any offset/endianness/sign decode bug is a correctness failure
    Q.df("x215_audio_gain",
      (s, dir) => Multimodal.audioGain(
        Multimodal.withWavPayload(Tables.load(s, dir, "documents"))),
      """WITH p AS (
        |  SELECT doc_id,
        |    (1 + n_chars % 2) * (n_chars % 500 + 50) AS n_tot
        |  FROM documents),
        |s AS (SELECT doc_id, n_tot, n_tot // 128 AS f, n_tot % 128 AS r
        |      FROM p)
        |SELECT doc_id, CAST(n_tot AS BIGINT) AS n_total_samples,
        |  CAST(f * 2088960 +
        |    CASE WHEN r <= 64 THEN 257 * r * (r - 1) + 256 * r
        |         ELSE 1052608 + (r - 64) * 65280
        |              - 514 * (((r - 1) * r) // 2 - 2016)
        |    END AS BIGINT) AS sum_abs,
        |  CAST(CASE WHEN n_tot >= 64 THEN 32638
        |       ELSE 514 * (n_tot - 1) + 256 END AS BIGINT) AS peak_abs,
        |  CAST(300000000 // (CASE WHEN n_tot >= 64 THEN 32638
        |       ELSE 514 * (n_tot - 1) + 256 END) AS BIGINT) AS gain_x10k
        |FROM s ORDER BY doc_id""".stripMargin),


    // cross-modal consistency: text near-dup pairs full-outer-joined
    // with real-payload image-dup pairs — both/text_only/image_only
    // route to different curation policies; a ratio shift is a
    // pipeline bug (e.g. a thumbnailer collapsing distinct images);
    // oracle: image equality == the x142 dimension-formula collision
    Q.df("x278_multimodal_consistency",
      (s, dir) => Multimodal.multimodalConsistency(
        Tables.load(s, dir, "documents")),
      s"""WITH $duckTok, ${duckShinglesFiltered(2)}, $duckJaccardTail,
         |tp AS (
         |  SELECT d1, d2 FROM inter
         |  JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
         |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.2),
         |img AS (SELECT doc_id, n_chars % 64 AS iw, n_chars % 37 AS ih
         |        FROM documents),
         |ip AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM img a JOIN img b
         |    ON a.iw = b.iw AND a.ih = b.ih AND a.doc_id < b.doc_id),
         |cl AS (
         |  SELECT coalesce(tp.d1, ip.d1) AS d1,
         |    coalesce(tp.d2, ip.d2) AS d2,
         |    CASE WHEN tp.d1 IS NOT NULL AND ip.d1 IS NOT NULL
         |        THEN 'both'
         |      WHEN tp.d1 IS NOT NULL THEN 'text_only'
         |      ELSE 'image_only' END AS category
         |  FROM tp FULL JOIN ip ON tp.d1 = ip.d1 AND tp.d2 = ip.d2),
         |ag AS (
         |  SELECT category, CAST(count(*) AS BIGINT) AS n_pairs,
         |    min(d1) AS e1,
         |    min_by(d2, lpad(CAST(d1 AS VARCHAR), 20, '0') || ':'
         |               || lpad(CAST(d2 AS VARCHAR), 20, '0')) AS e2
         |  FROM cl GROUP BY 1),
         |cats AS (SELECT unnest(['both', 'image_only', 'text_only'])
         |           AS category)
         |SELECT cats.category, coalesce(ag.n_pairs, 0) AS n_pairs,
         |  ag.e1 AS example_d1, ag.e2 AS example_d2
         |FROM cats LEFT JOIN ag USING (category)
         |ORDER BY cats.category""".stripMargin),


    // sample-level audio QA: clipping + amplitude envelope read from
    // every 16-bit PCM word (real decode in mapPartitions; media
    // bytes never shuffle); oracle = the synthetic capture's sample
    // pattern re-derived in SQL, so a byte-order or offset bug is a
    // hash failure, not silent skew
    Q.df("x292_audio_clipping",
      (s, dir) => Multimodal.audioClippingAudit(
        Multimodal.withWavPayload(Tables.load(s, dir, "documents"))),
      """WITH d AS (
        |  SELECT doc_id,
        |    (n_chars % 500 + 50) * (1 + n_chars % 2) AS words
        |  FROM documents),
        |g AS (
        |  SELECT r.range AS j,
        |    CASE WHEN r.range >= 64 THEN 514 * r.range + 256 - 65536
        |      ELSE 514 * r.range + 256 END AS v
        |  FROM range(0, 128) r),
        |f AS (SELECT doc_id, words, words // 128 AS np,
        |        words % 128 AS rem FROM d)
        |SELECT f.doc_id, CAST(f.words AS BIGINT) AS n_words,
        |  CAST(sum(CASE WHEN abs(g.v) >= 32000
        |    THEN f.np + CASE WHEN g.j < f.rem THEN 1 ELSE 0 END
        |    ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(max(CASE WHEN g.j < f.rem OR f.np > 0
        |    THEN abs(g.v) END) AS BIGINT) AS max_abs,
        |  CAST(min(CASE WHEN g.j < f.rem OR f.np > 0
        |    THEN abs(g.v) END) AS BIGINT) AS min_abs
        |FROM f, g GROUP BY 1, 2 ORDER BY doc_id""".stripMargin),

    // pixel-histogram audit on REAL decoded bytes: per-image 256-bin
    // byte histogram folded inside the decode loop (payloads never
    // shuffle), summarized as exact integers; the oracle closed-forms
    // the histogram from the capture rule (byte i = i % 256 over the
    // 4-aligned region), so any decode bug is a hash failure
    Q.df("x398_image_histogram",
      (s, dir) => Multimodal.pixelHistogramAudit(
        Multimodal.withBmpPayload(Tables.load(s, dir, "documents"))),
      s"""WITH $duckBmpGeom
         |SELECT doc_id, CAST(px AS BIGINT) AS px_bytes,
         |  CAST(least(px, 256) AS BIGINT) AS n_distinct_vals,
         |  CAST(0 AS BIGINT) AS modal_val,
         |  CAST(px // 256 + CASE WHEN px % 256 > 0 THEN 1 ELSE 0 END
         |    AS BIGINT) AS modal_count,
         |  CAST((px // 256 + CASE WHEN px % 256 > 0 THEN 1 ELSE 0 END)
         |    * 1000000 // px AS BIGINT) AS modal_ppm
         |FROM g ORDER BY doc_id""".stripMargin),

  )
}
