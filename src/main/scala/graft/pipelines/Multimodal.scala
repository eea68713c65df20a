package graft.pipelines

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** §2.3 multimodal columns: media travels as opaque `binary` payloads
  * with typed metadata extracted by a batched per-partition decoder.
  * The Spark-side plumbing — schema, typed Dataset, partition-local
  * batching, deterministic features — is real; the actual image/audio
  * codec is STUBBED (this container has no media libraries) behind
  * [[Multimodal.decodeStub]], which derives deterministic pseudo-
  * features from the bytes so the pipeline is verifiable end-to-end.
  */
object Multimodal {

  /** A media row: id + raw payload (here: utf-8 bytes standing in for
    * an encoded image/audio blob). */
  final case class MediaDoc(doc_id: Long, payload: Array[Byte])

  /** Extracted metadata. In a real deployment width/frames come from
    * the codec; here they are deterministic functions of the bytes. */
  final case class MediaFeat(
      doc_id: Long,
      byte_len: Int,
      fake_width: Int,
      fake_frames: Long,
      feat16: Long,
      content_hash: String)

  /** STUB codec: where a real implementation would decode pixels /
    * samples, this derives features from the raw bytes. Deterministic
    * on purpose — the oracle recomputes it in SQL. */
  def decodeStub(d: MediaDoc, md: MessageDigest): MediaFeat = {
    val len = d.payload.length
    md.reset()
    val hash = md.digest(d.payload).map("%02x".format(_)).mkString
    MediaFeat(
      doc_id = d.doc_id,
      byte_len = len,
      fake_width = len % 64 + 16,
      fake_frames = len.toLong / 100L + 1L,
      feat16 = d.payload.take(16).map(b => (b & 0xff).toLong).sum,
      content_hash = hash)
  }

  /** Batched per-partition feature extraction: one codec handle per
    * partition, records processed in batches of 64 (the shape a real
    * vectorized decoder wants). */
  def extractFeatures(ds: Dataset[MediaDoc]): Dataset[MediaFeat] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.grouped(64).flatMap(_.map(decodeStub(_, md)))
    }
  }

  // -------------------------------------------------------------- mm01
  private val mm01 = {
    // oracle twin of feat16: sum of the first 16 byte values — the
    // corpus is pure ASCII (verified), so byte == code point
    val feat16Sql = (1 to 16).map(i =>
      s"(CASE WHEN length(text) >= $i THEN ascii(substr(text, $i, 1)) ELSE 0 END)")
      .mkString(" + ")
    QueryDef(
      "mm01_multimodal",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
          .as[MediaDoc]
        extractFeatures(docs).toDF()
      },
      Some(s"""SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INT) AS byte_len,
        | CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS fake_width,
        | CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS fake_frames,
        | CAST($feat16Sql AS BIGINT) AS feat16,
        | md5(text) AS content_hash
        |FROM documents""".stripMargin))
  }

  // -------------------------------------------------------------- mm02
  /** Frame sampling: the 1→N multimodal shape (video → sampled
    * frames, audio → windows) as a narrow generate — each payload
    * yields up to 4 frames at a 128-byte stride, each with an offset
    * and a pseudo-feature over its first 8 bytes (stub codec again:
    * real frame decode needs media libs this container lacks; the
    * row-multiplication, batch shape and bounded fan-out are the real
    * thing). Declarative posexplode keeps it inside codegen — no UDF,
    * no shuffle; fan-out is bounded (≤4×) so the scan still dominates
    * at 100 TB. */
  private val mm02 = {
    val stride = 128
    val maxFrames = 4
    def f8Sql(off: String) = (1 to 8).map(j =>
      s"(CASE WHEN length(text) >= $off + $j THEN ascii(substr(text, $off + $j, 1)) ELSE 0 END)")
      .mkString(" + ")
    QueryDef(
      "mm02_frame_sample",
      (s, dir) => {
        val n = s"least($maxFrames, length(text) div $stride + 1)"
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            expr(s"sequence(0, $n - 1)").as("idxs"))
          .select(col("doc_id"), col("text"),
            posexplode(col("idxs")).as(Seq("frame_idx", "i")))
          .select(col("doc_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            (col("frame_idx") * stride).cast("long").as("frame_off"),
            expr(f8Sql(s"frame_idx * $stride")).cast("long").as("f8"))
      },
      Some(s"""SELECT doc_id,
        | CAST(i AS BIGINT) AS frame_idx,
        | CAST(i * $stride AS BIGINT) AS frame_off,
        | CAST(${f8Sql(s"i * $stride")} AS BIGINT) AS f8
        |FROM documents CROSS JOIN LATERAL (SELECT
        |  unnest(generate_series(0,
        |    least($maxFrames, length(text) // $stride + 1) - 1)) AS i) t
        |""".stripMargin))
  }

  // -------------------------------------------------------------- mm03
  /** aHash machinery shared by the mm03 query, its spec's brute-force
    * completeness proof, and ScaleProbe's candidate-growth line.
    *
    * 64-bit fingerprint in FOUR 16-bit bands: 65,536 buckets per band,
    * so the structural candidate floor is ~4n²/2¹⁶ — 256× below the
    * round-4 32-bit/8-bit-band scheme's ~4n²/2⁸, at the same
    * pigeonhole completeness (Hamming ≤ 3 diffs across 4 bands leave
    * ≥1 band identical). The fingerprint travels AS the four band
    * values, never one 64-bit integer: bit 63 would make the
    * sum-of-bits expression overflow signed BIGINT in the oracle
    * engine, while 16-bit bands stay comfortably integer-exact in
    * both. Hamming distance = Σ per-band bit_count(xor). */
  private[graft] object Phash {
    val NBits = 64
    val NBands = 4
    val BandBits = NBits / NBands // 16
    val MaxHamming = NBands - 1 // the pigeonhole-complete radius
    def px(i: Int) =
      s"(CASE WHEN length(text) >= $i THEN ascii(substr(text, $i, 1)) ELSE 0 END)"
    val sumPx: String = (1 to NBits).map(px).mkString(" + ")
    // bit j of band k set when pixel * 64 > sum of pixels (integer-only
    // comparison — no float mean, so both engines agree exactly)
    def bandExpr(k: Int): String = (1 to BandBits).map { j =>
      s"(CASE WHEN ${px((k - 1) * BandBits + j)} * $NBits > px_sum THEN ${1L << (j - 1)} ELSE 0 END)"
    }.mkString(" + ")
    val hammingExpr: String = (1 to NBands)
      .map(k => s"bit_count(l$k ^ r$k)").mkString(" + ")

    /** (doc_id, b1..b4): the fingerprint as band values. ONE native
      * [[graft.functions.AHashBands]] call per row — the declarative
      * CASE chain (which the DuckDB oracle still runs, and a spec
      * pins as bit-equal) evaluates 128 `substr(text, i, 1)` calls
      * per row, each an O(i) code-point walk: measured ~0.8 s of
      * mm03's 1.5 s at sf0.1 went to re-walking prefixes. */
    def hashed(s: SparkSession, dir: String) = {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      Tables.load(s, dir, "documents")
        .withColumn("bands",
          column(graft.functions.AHashBands(expression(col("text")))))
        .select(
          col("doc_id") +: (1 to NBands).map(k =>
            element_at(col("bands"), k).as(s"b$k")): _*)
    }

    /** The declarative twin of [[hashed]] (the oracle's form), kept
      * callable so the equivalence spec can diff the two on crafted
      * and corpus rows. */
    def hashedSqlForm(s: SparkSession, dir: String) =
      Tables.load(s, dir, "documents")
        .selectExpr("doc_id", "text", s"$sumPx AS px_sum")
        .selectExpr(
          "doc_id" +: (1 to NBands).map(k => s"CAST(${bandExpr(k)} AS BIGINT) AS b$k"): _*)

    /** Band-collided ordered pairs with their exact Hamming distance —
      * BEFORE the radius filter and distinct. Row count here is the
      * banded join's true work, the quantity ScaleProbe tracks. */
    def collided(s: SparkSession, dir: String) = {
      val banded = hashed(s, dir).select(col("doc_id"),
        col("b1"), col("b2"), col("b3"), col("b4"),
        posexplode(expr("array(b1, b2, b3, b4)")).as(Seq("pos", "bsig")))
        .withColumn("band", (col("pos") + 1).cast("int")).drop("pos")
      // band key = (band position, band value); same-band collision
      val l = banded.select(col("doc_id").as("m1"), col("b1").as("l1"),
        col("b2").as("l2"), col("b3").as("l3"), col("b4").as("l4"),
        col("band"), col("bsig"))
      val r = banded.select(col("doc_id").as("m2"), col("b1").as("r1"),
        col("b2").as("r2"), col("b3").as("r3"), col("b4").as("r4"),
        col("band"), col("bsig"))
      l.join(r, Seq("band", "bsig"))
        .filter(col("m1") < col("m2"))
        .select(col("m1"), col("m2"),
          expr(s"CAST($hammingExpr AS INT)").as("hamming"))
    }
  }

  /** Near-duplicate MEDIA detection: average-hash (aHash) perceptual
    * fingerprint + banded Hamming self-join — the image-dedup pass of
    * a multimodal corpus. The aHash "pixels" are a STUB (byte values
    * at the first 64 payload offsets stand in for downscaled-image
    * luma; a real codec slots into the same expression), but the
    * similarity machinery is the real thing: bit_i = pixel_i > mean,
    * 64-bit fingerprint in four 16-bit LSH bands ([[Phash]] — a pair
    * within Hamming ≤ 3 must agree on ≥1 of 4 bands, pigeonhole),
    * exact per-band `bit_count(xor)` verify on band-collided pairs
    * only. One explode×4 + one equi-join on the band key: the dd03
    * shape applied to binary payloads, never an all-pairs product. */
  private val mm03 = {
    import Phash._
    val bandSqlCols = (1 to NBands)
      .map(k => s"CAST(${bandExpr(k)} AS BIGINT) AS b$k").mkString(", ")
    val hammingSql = (1 to NBands)
      .map(k => s"bit_count(xor(l.b$k, r.b$k))").mkString(" + ")
    QueryDef(
      "mm03_phash_dedup",
      (s, dir) =>
        // filter BEFORE distinct: a pair can collide on up to 4 bands,
        // and dropping >MaxHamming rows first keeps them out of the
        // distinct's exchange entirely
        collided(s, dir)
          .filter(col("hamming") <= MaxHamming)
          .distinct(),
      Some(s"""WITH h AS (SELECT doc_id, $bandSqlCols FROM
        |  (SELECT doc_id, text, $sumPx AS px_sum FROM documents)),
        |b AS (SELECT doc_id, b1, b2, b3, b4, band,
        |  CASE band WHEN 1 THEN b1 WHEN 2 THEN b2
        |            WHEN 3 THEN b3 ELSE b4 END AS bsig
        |  FROM h CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, $NBands)) AS band) t)
        |SELECT DISTINCT l.doc_id AS m1, r.doc_id AS m2,
        |  CAST($hammingSql AS INT) AS hamming
        |FROM b l JOIN b r ON l.band = r.band AND l.bsig = r.bsig
        |  AND l.doc_id < r.doc_id
        |WHERE $hammingSql <= $MaxHamming
        |""".stripMargin))
  }

  // -------------------------------------------------------------- mm04
  /** Media dedup END-TO-END (round 8): mm03's banded perceptual-hash
    * pairs closed into duplicate GROUPS via [[Dedup.connectedComponents]]
    * — the same distributed min-label propagation dd06 runs for text —
    * with the min-id keeper per group. This is the media mirror of the
    * text pipeline's dd02 → dd06 composition: a crawl's image corpus
    * dedups by pHash clusters, not by pairs (transitively-linked
    * near-dups must collapse to ONE kept asset even when the endpoints'
    * Hamming distance exceeds the pair radius). Same scale posture as
    * both parents: the pair join is banded (pigeonhole-complete for
    * Hamming ≤ 3), propagation is one keyed join + min-agg per round
    * with rounds = component diameter. Oracle: DuckDB recursive
    * transitive closure over the identical pair CTEs. */
  private val mm04 = {
    import Phash._
    val bandSqlCols = (1 to NBands)
      .map(k => s"CAST(${bandExpr(k)} AS BIGINT) AS b$k").mkString(", ")
    val hammingSql = (1 to NBands)
      .map(k => s"bit_count(xor(l.b$k, r.b$k))").mkString(" + ")
    QueryDef(
      "mm04_media_dup_groups",
      (s, dir) => {
        val pairs = collided(s, dir)
          .filter(col("hamming") <= MaxHamming)
          .select(col("m1").as("d1"), col("m2").as("d2"))
          .distinct()
        Dedup.connectedComponents(
          Tables.load(s, dir, "documents").select(col("doc_id")), pairs)
      },
      Some(s"""WITH RECURSIVE h AS (SELECT doc_id, $bandSqlCols FROM
        |  (SELECT doc_id, text, $sumPx AS px_sum FROM documents)),
        |b AS (SELECT doc_id, b1, b2, b3, b4, band,
        |  CASE band WHEN 1 THEN b1 WHEN 2 THEN b2
        |            WHEN 3 THEN b3 ELSE b4 END AS bsig
        |  FROM h CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, $NBands)) AS band) t),
        |mp AS (SELECT DISTINCT l.doc_id AS m1, r.doc_id AS m2
        |  FROM b l JOIN b r ON l.band = r.band AND l.bsig = r.bsig
        |    AND l.doc_id < r.doc_id
        |  WHERE $hammingSql <= $MaxHamming),
        |edges AS (SELECT m1 AS a, m2 AS b FROM mp
        |  UNION ALL SELECT m2, m1 FROM mp),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT a AS doc_id, MIN(b) AS cluster, MIN(b) = a AS is_keeper
        |FROM reach GROUP BY a
        |""".stripMargin))
  }

  // -------------------------------------------------------------- mm05
  /** AUDIO-VISUAL ALIGNMENT pairs (round 12) — the data-prep step
    * contrastive A/V training runs (audio-visual correspondence:
    * Arandjelović & Zisserman 2017 arXiv:1705.08168; AVID, Morgado et
    * al. 2020 arXiv:2004.12943): each sampled VIDEO FRAME pairs with
    * the AUDIO WINDOW covering the same timeline position, producing
    * the positive (frame, window) training pairs. The two tracks tick
    * at DIFFERENT rates (here: frames every 128 payload bytes — the
    * mm02 grid — audio windows every 96), so the pairing is a RANGE
    * condition (window.start ≤ frame.mid < window.end) — executed as
    * the banded EQUI-join the range recipe reduces to when intervals
    * tile: band = mid div WinStride, join on (doc_id, band). Frames
    * whose midpoint falls past the last audio window (tail frames of
    * a payload whose audio track is shorter — window count is capped)
    * are dropped by the inner join, the honest "no audio coverage"
    * accounting. Pairs carry both tracks' stub features and their
    * absolute difference (the stand-in correspondence score; a real
    * pipeline feeds the pair to the AV encoder). Scale: two bounded
    * explodes (≤4 frames, ≤6 windows per doc) riding the scan, one
    * (doc, band)-keyed join — corpus-linear, no range scan. */
  private val mm05 = {
    val frameStride = 128
    val maxFrames = 4
    val winStride = 96
    val maxWins = 6
    def f8Sql(off: String) = (1 to 8).map(j =>
      s"(CASE WHEN length(text) >= $off + $j THEN ascii(substr(text, $off + $j, 1)) ELSE 0 END)")
      .mkString(" + ")
    QueryDef(
      "mm05_av_align",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val nF = s"least($maxFrames, length(text) div $frameStride + 1)"
        val frames = docs
          .select(col("doc_id"), col("text"),
            explode(expr(s"sequence(0, $nF - 1)")).as("frame_idx"))
          .select(col("doc_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            expr(s"CAST(frame_idx * $frameStride + ${frameStride / 2} AS BIGINT)")
              .as("mid"),
            expr(f8Sql(s"frame_idx * $frameStride")).cast("long").as("v_f8"))
          .withColumn("band", expr(s"mid div $winStride"))
        val nW = s"least($maxWins, length(text) div $winStride + 1)"
        val wins = docs
          .select(col("doc_id"), col("text"),
            explode(expr(s"sequence(0, $nW - 1)")).as("win_idx"))
          .select(col("doc_id"),
            col("win_idx").cast("long").as("win_idx"),
            expr(s"CAST(win_idx * $winStride AS BIGINT)").as("win_start"),
            expr(f8Sql(s"win_idx * $winStride")).cast("long").as("a_f8"))
        frames
          .join(wins, frames("doc_id") === wins("doc_id") &&
            frames("band") === wins("win_idx"))
          .select(frames("doc_id"), col("frame_idx"), col("mid"),
            col("win_idx"), col("win_start"), col("v_f8"), col("a_f8"),
            abs(col("v_f8") - col("a_f8")).as("av_gap"))
      },
      Some(s"""WITH frames AS (SELECT doc_id,
        |    CAST(i AS BIGINT) AS frame_idx,
        |    CAST(i * $frameStride + ${frameStride / 2} AS BIGINT) AS mid,
        |    CAST(${f8Sql(s"i * $frameStride")} AS BIGINT) AS v_f8
        |  FROM documents CROSS JOIN LATERAL (SELECT unnest(generate_series(0,
        |    least($maxFrames, length(text) // $frameStride + 1) - 1)) AS i) t),
        |wins AS (SELECT doc_id,
        |    CAST(i AS BIGINT) AS win_idx,
        |    CAST(i * $winStride AS BIGINT) AS win_start,
        |    CAST(${f8Sql(s"i * $winStride")} AS BIGINT) AS a_f8
        |  FROM documents CROSS JOIN LATERAL (SELECT unnest(generate_series(0,
        |    least($maxWins, length(text) // $winStride + 1) - 1)) AS i) t)
        |SELECT f.doc_id, f.frame_idx, f.mid, w.win_idx, w.win_start,
        |  f.v_f8, w.a_f8, abs(f.v_f8 - w.a_f8) AS av_gap
        |FROM frames f JOIN wins w
        |  ON w.doc_id = f.doc_id AND w.win_idx = f.mid // $winStride""".stripMargin))
  }

  // -------------------------------------------------------------- mm06
  /** SEQUENCE-aware media dedup — duplicate CLIP detection (round 13):
    * mm03/mm04 hash whole assets, but a re-uploaded video is usually a
    * clip of another at a temporal OFFSET (trimmed intro, cut credits)
    * — per-asset fingerprints can't see it, the frame SEQUENCE can.
    * Each payload's frame grid (mm02's shape at a finer 32-byte
    * stride, ≤16 full windows) yields per-frame 60-bit content hashes;
    * two assets sharing a frame hash become an alignment VOTE at
    * offset = idx_a − idx_b, votes are counted per (pair, offset) as
    * DISTINCT matched a-frames, the best offset per pair wins, and a
    * pair is a clip-duplicate when ≥ [[Mm06MinAligned]] frames align
    * at one offset. Frames shared by more than [[Mm06MaxDf]] assets
    * (blank/intro boilerplate — the media analogue of dd18's hot
    * shingles) are anti-joined out of vote generation. The gate
    * INJECTS the clip case (the dd18 snippet pattern at the frame
    * level): every 25th eligible doc contributes a pseudo-asset whose
    * payload drops the first [[Mm06ClipShift]] frames — its frames
    * are byte-identical to its host's shifted by exactly ClipShift,
    * so the pair MUST surface at that offset; ids offset past the
    * real domain via a max(doc_id)+1 driver scalar. The codec is the
    * standard stub (frame content = the byte window; a real frame
    * pHash slots into the same hash slot); alignment math is exact
    * integers + one final division. At 100 TB: frame table rides the
    * scan (≤16 rows/asset), the vote join is bounded by Σ_{df≤cap}
    * df² like dd18, votes collapse map-side per (pair, offset). */
  private val mm06 = {
    val Stride = 32
    val MaxFrames = 16
    val MinAligned = 4
    val MaxDf = 64
    val ClipMod = 25
    val ClipShift = 2
    QueryDef(
      "mm06_clip_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
        val clips = docs
          .filter(col("doc_id") % ClipMod === 0 &&
            length(col("text")) >= (ClipShift + MinAligned) * Stride)
          .select((col("doc_id") + off).as("doc_id"),
            expr(s"substr(text, ${ClipShift * Stride} + 1)").as("text"))
        val frames = docs.unionByName(clips)
          .filter(length(col("text")) >= Stride)
          .select(col("doc_id"), col("text"),
            explode(expr(
              s"sequence(0, least($MaxFrames, length(text) div $Stride) - 1)"))
              .as("idx"))
          .select(col("doc_id"), col("idx").cast("long").as("idx"),
            expr(graft.OracleSafe.hash60(
              s"substring(text, idx * $Stride + 1, $Stride)")).as("h"))
        val hot = frames.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") > MaxDf).select("h")
        val fk = frames.join(broadcast(hot), Seq("h"), "left_anti")
        val sz = frames.groupBy("doc_id").agg(count(lit(1)).as("nf"))
        val votes = fk.select(col("doc_id").as("ida"), col("idx").as("ia"),
            col("h"))
          .join(fk.select(col("doc_id").as("idb"), col("idx").as("ib"),
            col("h")), "h")
          .filter(col("ida") < col("idb"))
          .groupBy(col("ida"), col("idb"), (col("ia") - col("ib")).as("off"))
          .agg(countDistinct(col("ia")).as("n_aligned"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ida"), col("idb"))
          .orderBy(col("n_aligned").desc, col("off").asc)
        votes.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("n_aligned") >= MinAligned)
          .join(sz.select(col("doc_id").as("ida"), col("nf").as("na_frames")),
            "ida")
          .join(sz.select(col("doc_id").as("idb"), col("nf").as("nb_frames")),
            "idb")
          .select(col("ida"), col("idb"), col("off"), col("n_aligned"),
            col("na_frames"), col("nb_frames"),
            expr("CAST(n_aligned AS DOUBLE) / least(na_frames, nb_frames)")
              .as("frac"))
      },
      Some(s"""WITH d0 AS (SELECT doc_id, text FROM documents),
        |clips AS (SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents)
        |    AS doc_id,
        |  substr(text, ${ClipShift * Stride} + 1) AS text
        |  FROM d0 WHERE doc_id % $ClipMod = 0
        |    AND length(text) >= ${(ClipShift + MinAligned) * Stride}),
        |allv AS (SELECT * FROM d0 UNION ALL SELECT * FROM clips),
        |fr AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
        |    ${graft.OracleSafe.hash60Sql(s"substr(text, i * $Stride + 1, $Stride)")} AS h
        |  FROM allv CROSS JOIN LATERAL (SELECT unnest(generate_series(0,
        |    least($MaxFrames, length(text) // $Stride) - 1)) AS i) t
        |  WHERE length(text) >= $Stride),
        |hot AS (SELECT h FROM fr GROUP BY h
        |  HAVING COUNT(DISTINCT doc_id) > $MaxDf),
        |fk AS (SELECT doc_id, idx, h FROM fr ANTI JOIN hot USING (h)),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf FROM fr
        |  GROUP BY doc_id),
        |votes AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
        |    a.idx - b.idx AS off,
        |    CAST(COUNT(DISTINCT a.idx) AS BIGINT) AS n_aligned
        |  FROM fk a JOIN fk b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ida, idb
        |    ORDER BY n_aligned DESC, off ASC) AS rn FROM votes)
        |SELECT ida, idb, off, n_aligned, sa.nf AS na_frames,
        |  sb.nf AS nb_frames,
        |  CAST(n_aligned AS DOUBLE) / least(sa.nf, sb.nf) AS frac
        |FROM best JOIN sz sa ON sa.doc_id = ida
        |JOIN sz sb ON sb.doc_id = idb
        |WHERE rn = 1 AND n_aligned >= $MinAligned""".stripMargin))
  }

  // -------------------------------------------------------------- mm07
  /** Scene-cut detection / shot segmentation (round 14) — the video
    * stage that runs BEFORE frame dedup and captioning in a
    * multimodal curation pipeline: split each asset's frame sequence
    * into scenes at hard cuts, where a cut is a frame whose feature
    * distance to its predecessor exceeds a threshold (the classic
    * histogram-difference shot detector). Per frame the stub codec
    * yields an 8-bin pseudo-histogram (sums of the window's four-byte
    * sub-blocks — a real pixel histogram slots into the same eight
    * columns); the frame-to-frame distance is the INTEGER L1 between
    * consecutive histograms, a cut is distance > [[Mm07CutT]] (≈ the
    * corpus' 74th percentile — both scenes and continuations are
    * plentiful), and scenes are the running count of cuts. Output is
    * one row per (asset, scene): start/end frame, length, and the
    * opening cut's distance (0 for the first scene).
    *
    * The gate INJECTS the static-scene case (mm06's injection
    * pattern): every [[Mm07StaticMod]]-th doc contributes a
    * pseudo-asset whose payload repeats its first frame
    * [[Mm07StaticReps]] times before the organic tail — the repeats
    * are byte-identical so their deltas are exactly 0, and scene 0
    * MUST span at least those frames; ids offset past the real
    * domain via the max(doc_id)+1 driver scalar.
    *
    * Scale shape: the frame explode is bounded (≤[[Mm07MaxFrames]]
    * rows/asset) and rides the scan; the lag window and the
    * per-(asset, scene) aggregate share the SAME doc_id partitioning
    * — one exchange end to end. All arithmetic is integer-exact;
    * the only engine-shared text op is ascii() on the verified
    * all-ASCII corpus. */
  private val Mm07Stride = 32
  private val Mm07MaxFrames = 16
  private val Mm07CutT = 400L
  private val Mm07StaticMod = 20
  private val Mm07StaticReps = 4
  private val mm07 = {
    // per-frame 8-bin pseudo-histogram, bin j = sum of 4 byte values;
    // `POS` is the 1-based offset expression of the frame's window
    def binTxt(j: Int, pos: String): String = (1 to 4).map(k =>
      s"(CASE WHEN length(text) >= $pos + ${j * 4 + k - 1}" +
        s" THEN ascii(substr(text, $pos + ${j * 4 + k - 1}, 1))" +
        " ELSE 0 END)").mkString("(", " + ", ")")
    val deltaTxt = (0 until 8)
      .map(j => s"abs(f$j - lf$j)").mkString(" + ")
    QueryDef(
      "mm07_scene_cut",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
        val statics = docs
          .filter(col("doc_id") % Mm07StaticMod === 0 &&
            length(col("text")) >= Mm07Stride)
          .select((col("doc_id") + off).as("doc_id"),
            concat(expr(s"repeat(substr(text, 1, $Mm07Stride), $Mm07StaticReps)"),
              expr(s"substr(text, ${Mm07Stride + 1})")).as("text"))
        val frames = docs.unionByName(statics)
          .filter(length(col("text")) >= Mm07Stride)
          .select(col("doc_id"), col("text"),
            explode(expr(s"sequence(0, least($Mm07MaxFrames," +
              s" length(text) div $Mm07Stride) - 1)")).as("idx"))
          .select(Seq(col("doc_id"), col("idx").cast("long").as("idx")) ++
            (0 until 8).map(j =>
              expr(binTxt(j, s"(idx * $Mm07Stride + 1)"))
                .cast("long").as(s"f$j")): _*)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("idx"))
        val lagged = frames.select(
          Seq(col("doc_id"), col("idx")) ++
            (0 until 8).map(j => col(s"f$j")) ++
            (0 until 8).map(j =>
              lag(col(s"f$j"), 1).over(w).as(s"lf$j")): _*)
        val scored = lagged
          .withColumn("delta",
            when(col("lf0").isNull, lit(0L))
              .otherwise(expr(deltaTxt).cast("long")))
          .withColumn("is_cut",
            col("lf0").isNotNull && col("delta") > Mm07CutT)
        val scene = scored.withColumn("scene_id",
          sum(when(col("is_cut"), 1L).otherwise(0L)).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        scene.groupBy(col("doc_id"), col("scene_id"))
          .agg(min(col("idx")).as("start_idx"),
            max(col("idx")).as("end_idx"),
            count(lit(1)).as("n_frames"),
            max(when(col("is_cut"), col("delta")).otherwise(0L))
              .as("open_delta"))
      },
      Some {
        val bins = (0 until 8).map(j =>
          s"${binTxt(j, s"(i * $Mm07Stride + 1)")} AS f$j").mkString(",\n  ")
        val lags = (0 until 8).map(j =>
          s"lag(f$j) OVER (PARTITION BY doc_id ORDER BY idx) AS lf$j")
          .mkString(",\n  ")
        s"""WITH d0 AS (SELECT doc_id, text FROM documents),
          |statics AS (SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents)
          |    AS doc_id,
          |  repeat(substr(text, 1, $Mm07Stride), $Mm07StaticReps)
          |    || substr(text, ${Mm07Stride + 1}) AS text
          |  FROM d0 WHERE doc_id % $Mm07StaticMod = 0
          |    AND length(text) >= $Mm07Stride),
          |allv AS (SELECT * FROM d0 UNION ALL SELECT * FROM statics),
          |fr AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
          |  $bins
          |  FROM allv CROSS JOIN LATERAL (SELECT unnest(generate_series(0,
          |    least($Mm07MaxFrames, length(text) // $Mm07Stride) - 1)) AS i) t
          |  WHERE length(text) >= $Mm07Stride),
          |lg AS (SELECT doc_id, idx, ${(0 until 8).map(j => s"f$j").mkString(", ")},
          |  $lags
          |  FROM fr),
          |sc AS (SELECT doc_id, idx,
          |    CASE WHEN lf0 IS NULL THEN 0
          |         ELSE CAST($deltaTxt AS BIGINT) END AS delta,
          |    lf0 IS NOT NULL AND
          |      (CASE WHEN lf0 IS NULL THEN 0
          |            ELSE CAST($deltaTxt AS BIGINT) END) > $Mm07CutT AS is_cut
          |  FROM lg),
          |sn AS (SELECT doc_id, idx, delta, is_cut,
          |    SUM(CASE WHEN is_cut THEN 1 ELSE 0 END) OVER (
          |      PARTITION BY doc_id ORDER BY idx
          |      ROWS UNBOUNDED PRECEDING) AS scene_id
          |  FROM sc)
          |SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
          |  MIN(idx) AS start_idx, MAX(idx) AS end_idx,
          |  CAST(COUNT(*) AS BIGINT) AS n_frames,
          |  CAST(MAX(CASE WHEN is_cut THEN delta ELSE 0 END) AS BIGINT)
          |    AS open_delta
          |FROM sn GROUP BY doc_id, scene_id
          |""".stripMargin
      })
  }

  val defs: Seq[QueryDef] = Seq(mm01, mm02, mm03, mm04, mm05, mm06, mm07)
}
