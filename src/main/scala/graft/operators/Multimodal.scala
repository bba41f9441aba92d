package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column operators (BASELINE.json north star): media payloads
  * are opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs per-partition at the Dataset seam where a real
  * codec sits. m2's image decode IS real (javax.imageio, JVM-built-in)
  * with a clearly-marked deterministic fake as the non-image fallback —
  * the driver fixture stores text payloads, so fixture rows take the fake
  * path and stay SQL-oracle-checkable, while the image path is spec-pinned
  * on synthesized PNGs. Audio/video remain byte-level stand-ins (no codecs
  * in the JVM); their Spark-side plumbing (schema, join, binary handling,
  * partition-wise batch shape, window/frame fan-out) is real and
  * oracle-checked.
  */
object Multimodal {

  /** Input row for the fake decoder: payload as raw bytes. */
  final case class MediaRow(doc_id: Long, content: Array[Byte])

  /** Output of the fake decoder: deterministic pseudo-features. A real
    * implementation would decode image bytes here (per-partition, so codec
    * state is reused across rows — the mapInPandas batch shape in Scala
    * form). */
  final case class DecodedMedia(doc_id: Long, width: Long, height: Long,
      byte_len: Long, byte_sum: Long)

  /** STUB decoder — deterministic fake standing in for an image codec. */
  private def fakeDecode(r: MediaRow): DecodedMedia = {
    val b = r.content
    DecodedMedia(
      doc_id = r.doc_id,
      width = if (b.nonEmpty) (b(0) & 0xff) % 64 + 1 else 0L,
      height = if (b.length > 1) (b(1) & 0xff).toLong else 0L,
      byte_len = b.length.toLong,
      byte_sum = b.map(x => (x & 0xff).toLong).sum)
  }

  /** The decoder at the codec seam: a REAL image decode first
    * (javax.imageio — PNG/JPEG/GIF/BMP readers ship with the JVM, no
    * external libs), falling back to the labeled deterministic fake for
    * payloads that aren't decodable images. The driver fixture stores
    * text bytes, so every fixture row takes the fake path and the oracle
    * stays SQL-replayable; the real path (true pixel dimensions from the
    * decoded frame) is pinned by MultimodalDecodeSpec on a PNG synthesized
    * in memory. ImageIO probes magic bytes before committing a reader, so
    * the non-image rejection is cheap per row. */
  private[graft] def decode(r: MediaRow): DecodedMedia = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      catch { case _: Throwable => null }
    if (img != null)
      DecodedMedia(r.doc_id, img.getWidth.toLong, img.getHeight.toLong,
        r.content.length.toLong, r.content.map(x => (x & 0xff).toLong).sum)
    else fakeDecode(r)
  }

  /** Multimodal record assembly: documents ⋈ embeddings into one row of
    * (metadata struct, binary payload, embedding), with digest/size
    * features computed Spark-side. */
  val m1 = GraftQuery(
    "m1_multimodal_struct",
    "documents ⋈ embeddings as a multimodal record: binary payload + metadata + digest",
    (s, dir) => {
      val docs = table(s, dir, "documents")
      val emb = table(s, dir, "embeddings")
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .withColumn("meta", struct(col("lang"), col("source"), col("n_chars")))
        .withColumn("content", col("text").cast("binary"))
        .select(
          col("doc_id"),
          col("meta.lang").as("lang"),
          col("meta.source").as("source"),
          length(col("content")).cast(LongType).as("byte_len"),
          md5(col("content")).as("content_md5"),
          size(col("embedding")).cast(LongType).as("emb_dim"),
          col("label").cast(LongType).as("label"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT d.doc_id, d.lang, d.source,
             length(d.text) AS byte_len,
             md5(d.text) AS content_md5,
             len(e.embedding) AS emb_dim,
             CAST(e.label AS BIGINT) AS label
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      ORDER BY d.doc_id"""))

  /** Per-partition decode of the binary payload through the typed Dataset
    * seam (mapPartitions — codec state reused across a partition's rows).
    * The decode itself is real (ImageIO) with a deterministic fake
    * fallback for non-image payloads; the fixture is all-text, so its
    * features stay integer-exact and the oracle replays them in SQL. */
  val m2 = GraftQuery(
    "m2_decode_features",
    "Binary payload → per-partition decode (ImageIO, fake fallback) → typed feature rows",
    (s, dir) => {
      import s.implicits._
      table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[MediaRow]
        .mapPartitions(rows => rows.map(decode))
        .toDF()
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST((ascii(substring(text, 1, 1)) % 64) + 1 AS BIGINT) AS width,
             CAST(ascii(substring(text, 2, 1)) AS BIGINT) AS height,
             length(text) AS byte_len,
             CAST(list_aggregate(list_transform(string_split(text, ''),
               c -> ascii(c)), 'sum') AS BIGINT) AS byte_sum
      FROM documents
      ORDER BY doc_id"""))

  /** Frame sampling over a "video" payload: slice the binary into
    * fixed-size windows, keep every 2nd window ("frame"), emit one row per
    * sampled frame with offset + deterministic pseudo-features. The
    * explode fan-out is the real shape of production frame extraction
    * (rows stay bounded by payload size / frame stride); the byte-level
    * features stand in for the codec. */
  val m3 = GraftQuery(
    "m3_frame_sample",
    "Binary payload → fixed-stride frame sampling → per-frame feature rows",
    (s, dir) => {
      // character-based framing (frames and lengths in chars, digest over
      // the substring's UTF-8 bytes) — byte-based framing would diverge
      // from the oracle on multi-byte characters and could split codepoints
      val frameLen = 32
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("n_frames", floor(length(col("text")) / frameLen).cast("int"))
        .filter(col("n_frames") > 0)
      docs
        .select(col("doc_id"), col("text"),
          posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("idx", "frame_no")))
        .filter(col("frame_no") % 2 === 0) // sample every 2nd frame
        .select(
          col("doc_id"),
          col("frame_no").cast("long").as("frame_no"),
          (col("frame_no") * frameLen).cast("long").as("char_offset"),
          length(col("text").substr(col("frame_no") * frameLen + 1, lit(frameLen))).cast("long").as("frame_len"),
          md5(col("text").substr(col("frame_no") * frameLen + 1, lit(frameLen)).cast("binary")).as("frame_md5"))
        .orderBy("doc_id", "frame_no")
    },
    Some("""
      SELECT doc_id,
             frame_no,
             frame_no * 32 AS char_offset,
             length(substring(text, CAST(frame_no * 32 + 1 AS INTEGER), 32)) AS frame_len,
             md5(substring(text, CAST(frame_no * 32 + 1 AS INTEGER), 32)) AS frame_md5
      FROM (SELECT doc_id, text, unnest(range(0, length(text) // 32)) AS frame_no
            FROM documents
            WHERE length(text) // 32 > 0)
      WHERE frame_no % 2 = 0
      ORDER BY doc_id, frame_no"""))

  /** Output of the resize seam: payload sizes + digest of the downsampled
    * form. `orig_len` is characters for text payloads (matching the SQL
    * oracle), bytes for binary images. */
  final case class ResizedMedia(doc_id: Long, orig_len: Long,
      resized_len: Long, resized_md5: String)

  /** The resizer at the codec seam — m2's pattern applied to the thumbnail
    * pass: a decodable image is REALLY resized (half each dimension via
    * Graphics2D, re-encoded as PNG — java.awt, JVM-built-in, headless-safe);
    * any other payload takes the labeled deterministic fake — the SAME
    * stride-4 regex the SQL oracle replays (`java.util.regex` IS Spark's
    * regexp_replace engine, so the fake is bit-identical to the previous
    * pure-SQL form, newlines and all). Real-path behavior is pinned by
    * MultimodalDecodeSpec on a synthesized PNG. */
  private[graft] def resize(r: MediaRow): ResizedMedia = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      catch { case _: Throwable => null }
    if (img != null) {
      val w = math.max(1, img.getWidth / 2)
      val h = math.max(1, img.getHeight / 2)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      val bytes = bos.toByteArray
      ResizedMedia(r.doc_id, r.content.length.toLong, bytes.length.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString)
    } else {
      val str = new String(r.content, java.nio.charset.StandardCharsets.UTF_8)
      val resized = str.replaceAll("(.)(.{0,3})", "$1")
      val rb = resized.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ResizedMedia(r.doc_id, str.length.toLong, resized.length.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(rb)
          .map("%02x".format(_)).mkString)
    }
  }

  /** Resize/downsample at the typed Dataset seam: real thumbnail for
    * decodable images, stride-4 resampling (keep the first unit of every
    * 4) for everything else — the cheap pre-pass that lets the expensive
    * full-res decode (m2) run only on rows that survive downstream
    * filters. The all-text fixture takes the fake path, so output and
    * oracle are unchanged from the pure-SQL form this replaces. */
  val m4 = GraftQuery(
    "m4_resize_stub",
    "Payload downsample (real thumbnail for images, stride-4 fake for text): resized length + digest",
    (s, dir) => {
      import s.implicits._
      table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[MediaRow]
        .mapPartitions(rows => rows.map(resize))
        .toDF()
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, length(text) AS orig_len,
             length(regexp_replace(text, '(.)(.{0,3})', '\1', 'g')) AS resized_len,
             md5(regexp_replace(text, '(.)(.{0,3})', '\1', 'g')) AS resized_md5
      FROM documents
      ORDER BY doc_id"""))

  /** Overlapping window extraction — the audio/STFT frame shape (hop <
    * window, unlike m3's tumbling frames): 32-unit windows every 16 units,
    * one row per window with offset, per-window energy (sum of unit codes —
    * the codec stand-in) and digest. The fan-out is (len/hop) rows per
    * payload, generated by sequence+posexplode entirely inside codegen —
    * no per-row loop, no shuffle before the final sort. */
  val m5 = GraftQuery(
    "m5_audio_windows",
    "Overlapping (hop=16, win=32) window extraction with per-window energy + digest",
    (s, dir) => {
      val win = 32; val hop = 16
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("n_win",
          (floor((length(col("text")) - win) / hop) + 1).cast("int"))
        .filter(col("n_win") > 0)
      docs
        .select(col("doc_id"), col("text"),
          posexplode(sequence(lit(0), col("n_win") - 1)).as(Seq("idx", "win_no")))
        .withColumn("w", col("text").substr(col("win_no") * hop + 1, lit(win)))
        .select(
          col("doc_id"),
          col("win_no").cast("long").as("win_no"),
          (col("win_no") * hop).cast("long").as("offset"),
          // codegen'd code-point sum — the HOF chain it replaces ran three
          // interpreted lambdas per character (see CharCodeSum)
          graft.functions.Functions.charCodeSum(col("w")).as("energy"),
          md5(col("w").cast("binary")).as("win_md5"))
        .orderBy("doc_id", "win_no")
    },
    Some("""
      SELECT doc_id, win_no, win_no * 16 AS offset,
             CAST(list_aggregate(list_transform(
               string_split(substring(text, CAST(win_no * 16 + 1 AS INTEGER), 32), ''),
               c -> ascii(c)), 'sum') AS BIGINT) AS energy,
             md5(substring(text, CAST(win_no * 16 + 1 AS INTEGER), 32)) AS win_md5
      FROM (SELECT doc_id, text,
                   unnest(range(0, (length(text) - 32) // 16 + 1)) AS win_no
            FROM documents
            WHERE (length(text) - 32) // 16 + 1 > 0)
      ORDER BY doc_id, win_no"""))

  /** Cross-video frame-level dedup — m3's framing composed with d1's
    * digest-groupBy discipline, reported as PAIRS of payloads sharing
    * frames (the video analogue of t8's shared text chunks). Shape at
    * 100 TB: the shuffle carries 16-byte frame digests (never payload
    * bytes); pair enumeration happens inside digest groups whose size is
    * bounded by the dedup candidates themselves; the Jaccard-style overlap
    * ratio then confirms on counts alone — no second payload pass. The
    * byte-stride "frames" stand in for codec output; the dataflow is the
    * real one. */
  val m6 = GraftQuery(
    "m6_frame_dedup",
    "Cross-payload frame dedup: pairs sharing ≥ 4 distinct frames + overlap ratio",
    (s, dir) => {
      val frameLen = 32
      val frames = table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("n_frames", floor(length(col("text")) / frameLen).cast("int"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"), col("text"), col("n_frames"),
          posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("idx", "frame_no")))
        .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
          md5(col("text").substr(col("frame_no") * frameLen + 1, lit(frameLen))
            .cast("binary")).as("frame_md5"))
        .distinct() // per-doc distinct frames: repeated frames count once
      val shared = frames.as("a")
        .join(frames.as("b"),
          col("a.frame_md5") === col("b.frame_md5") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
          col("a.n_frames").as("n1"), col("b.n_frames").as("n2"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 4)
      shared.select(col("doc1"), col("doc2"), col("n_shared"),
          round(col("n_shared").cast("double")
            / (col("n1") + col("n2") - col("n_shared")), 4).as("overlap"))
        .orderBy("doc1", "doc2")
    },
    Some("""
      WITH f AS (
        SELECT DISTINCT doc_id,
               length(text) // 32 AS n_frames,
               md5(substring(text, CAST(frame_no * 32 + 1 AS INTEGER), 32)) AS frame_md5
        FROM (SELECT doc_id, text, unnest(range(0, length(text) // 32)) AS frame_no
              FROM documents
              WHERE length(text) // 32 > 0))
      SELECT a.doc_id AS doc1, b.doc_id AS doc2,
             count(*) AS n_shared,
             round(count(*) / CAST(a.n_frames + b.n_frames - count(*) AS DOUBLE), 4)
               AS overlap
      FROM f a JOIN f b ON a.frame_md5 = b.frame_md5 AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.n_frames, b.n_frames
      HAVING count(*) >= 4
      ORDER BY doc1, doc2"""))

  /** Cross-modal alignment scoring — the CLIP-score filter shape: each
    * (text, media-embedding) pair gets a cosine alignment score and
    * misaligned pairs are flagged for drop. The text side uses a
    * deterministic 8-dim hashed bag-of-words projection (token → md5
    * bucket, the feature-hashing trick — honestly labeled stand-in for a
    * text encoder, same contract as m2/m4's fake codec); the media side
    * takes the first 8 embedding dims. Everything is row-local after one
    * token-bucket aggregation: at 100 TB the encoder swaps in at the same
    * seam (a mapInPandas batch over the text column) and the join/score/
    * filter plumbing — which is what this query pins — is unchanged.
    * Deterministic → oracle-checked, scores rounded to 4 decimals. */
  val m7 = GraftQuery(
    "m7_crossmodal_align",
    "CLIP-shaped alignment score: hashed-BoW text vector vs embedding head, cosine + keep flag",
    (s, dir) => {
      val dims = 0 until 8
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
        .withColumn("b", ascii(substring(md5(col("w")), 1, 1)) % 8)
      val tCols = dims.map(j =>
        sum(when(col("b") === j, 1L).otherwise(0L)).cast("double").as(s"t$j"))
      val tv = toks.groupBy("doc_id").agg(tCols.head, tCols.tail: _*)
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id") +:
          dims.map(j => element_at(col("embedding"), j + 1).cast("double").as(s"e$j")): _*)
      val dot = dims.map(j => col(s"t$j") * col(s"e$j")).reduce(_ + _)
      val tn = sqrt(dims.map(j => col(s"t$j") * col(s"t$j")).reduce(_ + _))
      val en = sqrt(dims.map(j => col(s"e$j") * col(s"e$j")).reduce(_ + _))
      tv.join(emb, "doc_id")
        .withColumn("align", round(dot / (tn * en), 4))
        .select(col("doc_id"), col("align"), (col("align") >= 0.0).as("keep"))
        .orderBy("doc_id")
    },
    Some {
      val dims = 0 until 8
      val tcols = dims.map(j =>
        s"CAST(sum(CASE WHEN ascii(substr(md5(w),1,1)) % 8 = $j THEN 1 ELSE 0 END) AS DOUBLE) AS t$j")
        .mkString(",\n               ")
      val dot = dims.map(j => s"t$j * CAST(e.embedding[${j + 1}] AS DOUBLE)").mkString(" + ")
      val tn = dims.map(j => s"t$j * t$j").mkString(" + ")
      val en = dims.map(j => s"CAST(e.embedding[${j + 1}] AS DOUBLE) * CAST(e.embedding[${j + 1}] AS DOUBLE)").mkString(" + ")
      s"""
      WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                    FROM documents),
      tv AS (SELECT doc_id,
               $tcols
             FROM toks GROUP BY doc_id),
      scored AS (
        SELECT tv.doc_id,
               round(($dot) / (sqrt($tn) * sqrt($en)), 4) AS align
        FROM tv JOIN embeddings e ON e.vec_id = tv.doc_id)
      SELECT doc_id, align, align >= 0.0 AS keep
      FROM scored
      ORDER BY doc_id"""
    })

  /** Energy-gated segment extraction — the VAD (voice-activity-detection)
    * shape of an audio pipeline: m5's overlapping windows are thresholded
    * against the payload's mean energy, and runs of consecutive active
    * windows merge into segments (gaps-and-islands: win_no − row_number
    * is constant within a run). The threshold compare is INTEGER
    * cross-multiplication (energy·n > total ⇔ energy > mean — text char
    * codes are low-variance, so the gate is the doc's own mean; a real
    * VAD would use a noise-floor multiplier the same way) so no float
    * ever enters the gate → fully oracle-checked. Shape at
    * 100 TB: windows shuffle once on doc_id for the per-doc stats and
    * island numbering (both in the same window exchange), segments are
    * one partial-agg groupBy — payload bytes never move after the scan.
    * A real pipeline swaps the char-code energy for codec RMS; the gate,
    * merge, and segment accounting are the production dataflow. */
  val m8 = GraftQuery(
    "m8_active_segments",
    "Energy gate (> doc mean) + contiguous-window merge → active segments per payload",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val win = 32; val hop = 16
      val w = table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("n_win",
          (floor((length(col("text")) - win) / hop) + 1).cast("int"))
        .filter(col("n_win") > 0)
        .select(col("doc_id"), col("text"),
          posexplode(sequence(lit(0), col("n_win") - 1)).as(Seq("idx", "win_no")))
        .select(col("doc_id"), col("win_no").cast("long").as("win_no"),
          graft.functions.Functions.charCodeSum(
            col("text").substr(col("win_no") * hop + 1, lit(win))).as("energy"))
      val byDoc = Window.partitionBy("doc_id")
      val gated = w
        .withColumn("tot", sum("energy").over(byDoc))
        .withColumn("nw", count(lit(1)).over(byDoc))
        .filter(col("energy") * col("nw") > col("tot"))
        .withColumn("grp", col("win_no") -
          row_number().over(Window.partitionBy("doc_id").orderBy("win_no")))
      gated.groupBy("doc_id", "grp")
        .agg(min("win_no").as("w0"), max("win_no").as("w1"),
          count(lit(1)).as("n_windows"),
          max("energy").as("peak_energy"), sum("energy").as("seg_energy"))
        .select(col("doc_id"),
          (col("w0") * hop).cast("long").as("start_offset"),
          (col("w1") * hop + win).cast("long").as("end_offset"),
          col("n_windows"), col("peak_energy"), col("seg_energy"))
        .orderBy("doc_id", "start_offset")
    },
    Some("""
      WITH w AS (
        SELECT doc_id, win_no,
               CAST(list_aggregate(list_transform(
                 string_split(substring(text, CAST(win_no * 16 + 1 AS INTEGER), 32), ''),
                 c -> ascii(c)), 'sum') AS BIGINT) AS energy
        FROM (SELECT doc_id, text,
                     unnest(range(0, (length(text) - 32) // 16 + 1)) AS win_no
              FROM documents
              WHERE (length(text) - 32) // 16 + 1 > 0)),
      tot AS (SELECT doc_id, sum(energy) AS tot, count(*) AS nw
              FROM w GROUP BY doc_id),
      act AS (SELECT w.doc_id, win_no, energy,
                     win_no - row_number() OVER (PARTITION BY w.doc_id
                       ORDER BY win_no) AS grp
              FROM w JOIN tot USING (doc_id)
              WHERE energy * nw > tot)
      SELECT doc_id,
             min(win_no) * 16 AS start_offset,
             max(win_no) * 16 + 32 AS end_offset,
             CAST(count(*) AS BIGINT) AS n_windows,
             max(energy) AS peak_energy,
             CAST(sum(energy) AS BIGINT) AS seg_energy
      FROM act
      GROUP BY doc_id, grp
      ORDER BY doc_id, start_offset"""))

  /** Content-type sniffing / modality routing — the dispatch step in
    * front of every decode (m2) in a mixed-media lake: payloads are routed
    * by MAGIC BYTES (PNG \x89PNG\r\n\x1a\n, JPEG \xFF\xD8\xFF, RIFF/WAVE),
    * never by file extension or metadata, which lie. The fixture is
    * all-text, so the query PLANTS deterministic magic prefixes first
    * (t16's planting contract: doc_id%5 picks the modality, both engines
    * derive the identical payload) — the operator under test is the
    * sniffer. Sniffing compares hex prefixes of the binary (row-local
    * codegen, identical uppercase hex in both engines); the routing
    * report is the per-modality row/byte accounting a pipeline uses to
    * fan out to per-modality decoders. At 100 TB: one scan, no shuffle
    * except the 4-group aggregate. */
  val m9 = GraftQuery(
    "m9_modality_routing",
    "Magic-byte content sniffing: route planted PNG/JPEG/WAVE/text payloads, per-modality accounting",
    (s, dir) => {
      val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
      val wav = "RIFF    WAVE".getBytes("ISO-8859-1")
      val planted = table(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(lit(png), col("text").cast("binary")))
            .when(col("doc_id") % 5 === 1, concat(lit(jpg), col("text").cast("binary")))
            .when(col("doc_id") % 5 === 2, concat(lit(wav), col("text").cast("binary")))
            .otherwise(col("text").cast("binary")).as("b"))
      planted
        .withColumn("h", hex(col("b")))
        .withColumn("modality",
          when(col("h").startsWith("89504E470D0A1A0A"), "image/png")
            .when(col("h").startsWith("FFD8FF"), "image/jpeg")
            .when(col("h").startsWith("52494646") &&
              substring(col("h"), 17, 8) === "57415645", "audio/wav")
            .otherwise("text/plain"))
        .groupBy("modality")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("b"))).cast("long").as("total_bytes"),
          min("doc_id").as("first_doc"))
        .orderBy("modality")
    },
    Some("""
      WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0
                      THEN '\x89PNG\x0D\x0A\x1A\x0A'::BLOB || encode(text)
                    WHEN doc_id % 5 = 1
                      THEN '\xFF\xD8\xFF\xE0'::BLOB || encode(text)
                    WHEN doc_id % 5 = 2
                      THEN 'RIFF    WAVE'::BLOB || encode(text)
                    ELSE encode(text) END AS b
        FROM documents),
      sniffed AS (
        SELECT doc_id, b, hex(b) AS h,
               CASE WHEN starts_with(hex(b), '89504E470D0A1A0A') THEN 'image/png'
                    WHEN starts_with(hex(b), 'FFD8FF') THEN 'image/jpeg'
                    WHEN starts_with(hex(b), '52494646')
                         AND substr(hex(b), 17, 8) = '57415645' THEN 'audio/wav'
                    ELSE 'text/plain' END AS modality
        FROM planted)
      SELECT modality, count(*) AS n_docs,
             CAST(sum(octet_length(b)) AS BIGINT) AS total_bytes,
             min(doc_id) AS first_doc
      FROM sniffed
      GROUP BY modality
      ORDER BY modality"""))

  /** Output of the perceptual-hash seam: 56-bit dHash per payload. */
  final case class PHashRow(doc_id: Long, dhash: Long)

  /** Perceptual dHash at the codec seam — m2's pattern applied to
    * NEAR-duplicate image detection (m6 dedups frames by EXACT digest; a
    * re-encoded or slightly-edited image defeats that). Real path: decode
    * via ImageIO, Graphics2D-downsample to an 8×8 grayscale grid, hash =
    * the 56 horizontal gradient signs (7 per row) — the standard dHash
    * construction (difference hash; per Krawetz's public description),
    * robust to re-encode/resize because only relative brightness order
    * survives. Fake path (non-image payloads): the SAME construction over
    * char-code "pixels" sampled on the same 8×8 grid across the text
    * (char-based indexing, BMP code units — the m3/m4 portability
    * contract), so fixture rows are SQL-replayable AND structurally
    * correlated: identical payloads hash identically, small edits move few
    * grid samples. 56 bits (not 64) keeps every band shift inside a
    * non-negative Long in both engines (d4's range(60) lesson). */
  private[graft] def dhash(r: MediaRow): PHashRow = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      catch { case _: Throwable => null }
    val gray: (Int, Int) => Int =
      if (img != null) {
        val small = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g = small.createGraphics()
        g.drawImage(img, 0, 0, 8, 8, null)
        g.dispose()
        val raster = small.getRaster
        (row, c) => raster.getSample(c, row, 0)
      } else {
        val str = new String(r.content, java.nio.charset.StandardCharsets.UTF_8)
        val len = str.length
        (row, c) => str.charAt(((row * 8 + c) * len) / 64).toInt
      }
    var h = 0L
    var row = 0
    while (row < 8) {
      var c = 0
      while (c < 7) {
        if (gray(row, c) > gray(row, c + 1)) h |= 1L << (row * 7 + c)
        c += 1
      }
      row += 1
    }
    PHashRow(r.doc_id, h)
  }

  /** Perceptual near-dup index over the payload column: per-doc dHash,
    * plus the two numbers a dedup pipeline reads off the index — band-mate
    * count (candidate tier: docs sharing any of the 4 14-bit bands; the
    * LSH discipline, pigeonhole-lossless for Hamming ≤ 3) and confirmed
    * near-dup count (Hamming ≤ 3 over the full 56 bits). Candidates come
    * from a band-keyed equi-join — never an all-pairs join — and band
    * WIDTH is the occupancy dial (d4/s2's discipline: bits scale with
    * log(corpus) so bucket occupancy — and thus candidates per doc — stays
    * bounded; 8-bit bands measured 260 candidates/doc on the 5k fixture,
    * 14-bit bands ~1), so the verify join cost tracks duplicate density,
    * not corpus². The all-text fixture takes the fake
    * path end-to-end (oracle-checked); the real-image path is pinned by
    * MultimodalDecodeSpec on synthesized PNGs. */
  val m10 = GraftQuery(
    "m10_perceptual_hash",
    "Perceptual dHash index: per-doc 56-bit hash + band-mate and Hamming≤3 near-dup counts",
    (s, dir) => {
      import s.implicits._
      val hashes = table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[MediaRow]
        .mapPartitions(rows => rows.map(dhash))
        .toDF()
      val bands = hashes.select(col("doc_id"), explode(array((0 until 4).map(k =>
          struct(lit(k).as("k"),
            shiftright(col("dhash"), k * 14).bitwiseAND(lit(16383L)).as("v"))): _*)).as("e"))
        .select(col("doc_id"), col("e.k").as("k"), col("e.v").as("v"))
      val cand = bands.as("a").join(bands.as("b"), Seq("k", "v"))
        .filter(col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("mate"))
        .distinct()
      val verified = cand
        .join(hashes.select(col("doc_id"), col("dhash").as("h1")), "doc_id")
        .join(hashes.select(col("doc_id").as("mate"), col("dhash").as("h2")), "mate")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_band_mates"),
          sum(when(bit_count(col("h1").bitwiseXOR(col("h2"))) <= 3, 1L)
            .otherwise(0L)).as("n_near_dups"))
      hashes.join(verified, Seq("doc_id"), "left")
        .select(col("doc_id"), col("dhash"),
          coalesce(col("n_band_mates"), lit(0L)).as("n_band_mates"),
          coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"))
        .orderBy("doc_id")
    },
    Some("""
      WITH g AS (SELECT doc_id, text, length(text) AS len FROM documents),
      px AS (SELECT doc_id, b,
                    ascii(substring(text,
                      CAST((b * len) // 64 AS INTEGER) + 1, 1)) AS p
             FROM g, UNNEST(range(64)) AS t(b)),
      bits AS (SELECT a.doc_id, (a.b // 8) * 7 + (a.b % 8) AS bit
               FROM px a JOIN px n ON n.doc_id = a.doc_id AND n.b = a.b + 1
               WHERE a.b % 8 < 7 AND a.p > n.p),
      h AS (SELECT g.doc_id,
                   CAST(coalesce(sum(1::BIGINT << CAST(bit AS INTEGER)), 0)
                     AS BIGINT) AS dhash
            FROM g LEFT JOIN bits ON bits.doc_id = g.doc_id
            GROUP BY g.doc_id),
      bands AS (SELECT doc_id, k, (dhash >> CAST(k * 14 AS INTEGER)) & 16383 AS v
                FROM h, UNNEST(range(4)) AS t(k)),
      cand AS (SELECT DISTINCT a.doc_id, b.doc_id AS mate
               FROM bands a JOIN bands b ON a.k = b.k AND a.v = b.v
                AND a.doc_id <> b.doc_id),
      verified AS (SELECT c.doc_id,
                          CAST(count(*) AS BIGINT) AS n_band_mates,
                          CAST(sum(CASE WHEN bit_count(xor(h1.dhash, h2.dhash)) <= 3
                                        THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dups
                   FROM cand c
                   JOIN h h1 ON h1.doc_id = c.doc_id
                   JOIN h h2 ON h2.doc_id = c.mate
                   GROUP BY c.doc_id)
      SELECT h.doc_id, h.dhash,
             coalesce(v.n_band_mates, 0) AS n_band_mates,
             coalesce(v.n_near_dups, 0) AS n_near_dups
      FROM h LEFT JOIN verified v ON v.doc_id = h.doc_id
      ORDER BY h.doc_id"""))

  /** Chunk-digest manifest — the content-addressable-store layout every
    * deduplicating blob system uses (backup stores, OCI image layers,
    * artifact caches): each payload splits into fixed 64-byte chunks,
    * chunks are addressed by digest, and storage is charged once per
    * DISTINCT chunk — so payloads sharing prefixes (the fixture's
    * near-dup shape) share their leading chunks. The report is the dedup
    * ratio a CAS quotes: per payload, chunk count, chunks also present in
    * another payload, and the shared fraction in basis points. Fixed
    * stride is the binary complement of t8's content-defined chunking
    * (stride survives any payload type; CDC beats it only on insertions).
    *
    * Binary chunking is expressed over the payload's HEX image (2 chars
    * per byte) because the oracle's engine has no BLOB substring — both
    * engines hex uppercase, so chunk digests agree by construction.
    * Per-payload chunk dedup is ROW-LOCAL (t24's array_distinct-before-
    * explode); only (doc_id, 32-char digest) rows ever shuffle. */
  val m11 = GraftQuery(
    "m11_chunk_manifest",
    "CAS chunk manifest: 64-byte chunk digests, cross-payload sharing in basis points",
    (s, dir) => {
      val chunks = table(s, dir, "documents")
        .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
        .select(col("doc_id"),
          explode(array_distinct(expr(
            """transform(sequence(0, CAST(greatest(ceil(length(hx) / 128.0), 1) AS INT) - 1),
               i -> md5(substring(hx, i * 128 + 1, 128)))"""))).as("ch"))
      val freq = chunks.groupBy("ch").agg(count(lit(1)).as("n_payloads"))
      chunks.join(freq, "ch")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("n_payloads") >= 2, 1L).otherwise(0L)).as("n_shared"),
          floor(sum(when(col("n_payloads") >= 2, 1L).otherwise(0L)) * 10000.0
            / count(lit(1))).as("shared_bp"))
        .orderBy("doc_id")
    },
    Some("""
      WITH hx AS (SELECT doc_id, hex(text) AS hx FROM documents),
      c0 AS (SELECT doc_id, md5(substr(hx, CAST(i * 128 + 1 AS INTEGER), 128)) AS ch
             FROM hx, UNNEST(range(0, greatest(CAST(ceil(length(hx) / 128.0) AS BIGINT), 1)))
                        AS t(i)),
      c AS (SELECT DISTINCT doc_id, ch FROM c0),
      f AS (SELECT ch, count(*) AS n_payloads FROM c GROUP BY ch)
      SELECT c.doc_id, count(*) AS n_chunks,
             CAST(sum(CASE WHEN f.n_payloads >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             CAST(floor(sum(CASE WHEN f.n_payloads >= 2 THEN 1 ELSE 0 END) * 10000.0
                        / count(*)) AS BIGINT) AS shared_bp
      FROM c JOIN f USING (ch)
      GROUP BY c.doc_id
      ORDER BY c.doc_id"""))

  /** One histogram row: bucket ∈ [0,8), cnt = samples landing in it. */
  final case class LumaBucket(doc_id: Long, is_image: Boolean,
      bucket: Long, cnt: Long)

  /** Brightness histogram at the codec seam — m2's decode contract applied
    * to pixel STATISTICS rather than dimensions: a decodable image yields
    * an 8-bucket histogram of Rec.601 luma over its pixels (stride-sampled
    * to ≤4096 so a huge frame costs the same as a thumbnail — the
    * bounded-work-per-row rule that keeps a decode stage schedulable);
    * any other payload takes the labeled fake (byte>>5 buckets), which the
    * SQL oracle replays over the text fixture. Spec-pinned on synthesized
    * gray PNGs for the real path. */
  private[graft] def lumaHistogram(r: MediaRow): Seq[LumaBucket] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      catch { case _: Throwable => null }
    val counts = new Array[Long](8)
    val isImage = img != null
    if (isImage) {
      val (w, h) = (img.getWidth, img.getHeight)
      val stride = math.max(1, math.sqrt(w.toLong * h / 4096.0).toInt)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          counts(luma >> 5) += 1
          x += stride
        }
        y += stride
      }
    } else r.content.foreach(b => counts((b & 0xff) >> 5) += 1)
    (0 until 8).filter(counts(_) > 0)
      .map(k => LumaBucket(r.doc_id, isImage, k.toLong, counts(k)))
  }

  /** Per-payload brightness histogram rows (empty buckets omitted — the
    * group-by shape the oracle produces). The fan-out is ≤8 rows per
    * payload, so the decode stage's output stays bounded regardless of
    * media size — the histogram, not the pixels, is what shuffles. */
  val m12 = GraftQuery(
    "m12_luma_histogram",
    "Payload → 8-bucket luma histogram at the decode seam (real pixels for images, byte fake for text)",
    (s, dir) => {
      import s.implicits._
      table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[MediaRow]
        .mapPartitions(rows => rows.flatMap(lumaHistogram))
        .toDF()
        .orderBy("doc_id", "bucket")
    },
    Some("""
      SELECT doc_id, FALSE AS is_image,
             CAST(ascii(c) // 32 AS BIGINT) AS bucket,
             count(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents)
      GROUP BY doc_id, bucket
      ORDER BY doc_id, bucket"""))

  /** Container-HEADER metadata extraction — typed columns (dimensions,
    * bit depth, channels, sample rate) parsed from the first bytes of a
    * binary payload WITHOUT invoking any codec: a PNG IHDR chunk and a
    * WAV RIFF/fmt header are fixed-offset structures, so the parse is
    * pure row-local string math over hex(payload) — big-endian PNG ints
    * read straight off, little-endian WAV fields byte-swapped by
    * reassembling hex pairs in reverse. This is the scan-speed filter
    * stage a media pipeline runs BEFORE the expensive decode (m2):
    * "images ≥ 16×16", "audio at 16 kHz" select on header metadata
    * while touching ~32 bytes per row. Unlike m2's JVM-codec path the
    * whole parse is SQL-expressible, so headers synthesized byte-exactly
    * in BOTH engines (m9's planted-payload discipline; width/height/
    * channels/rate derived from doc_id, CRC left unvalidated as a fake
    * constant — parsers don't checksum on the skip path) make every row
    * oracle-checked, not spec-only. */
  /** The m13 parser, factored so MultimodalDecodeSpec can prove it reads
    * REAL encoder output (an ImageIO-written PNG), not only the
    * synthesized headers the oracle replays. Input: (doc_id, b binary);
    * output: typed header metadata. Fixed offsets per the PNG (RFC 2083
    * §3/§4.1.1, big-endian) and RIFF/WAVE (fmt chunk, little-endian)
    * specifications. */
  private[graft] def headerMeta(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def hx(from: Int, n: Int) = substring(col("h"), from, n)
    def beInt(from: Int, n: Int) = conv(hx(from, n), 16, 10).cast("long")
    def leInt4(from: Int) =
      conv(concat(hx(from + 6, 2), hx(from + 4, 2), hx(from + 2, 2), hx(from, 2)), 16, 10).cast("long")
    def leInt2(from: Int) =
      conv(concat(hx(from + 2, 2), hx(from, 2)), 16, 10).cast("long")
    df.withColumn("h", hex(col("b")))
      .select(col("doc_id"),
        when(col("h").startsWith("89504E470D0A1A0A"), "png")
          .when(col("h").startsWith("52494646") && hx(17, 8) === "57415645", "wav")
          .otherwise("unparsed").as("container"),
        when(col("h").startsWith("89504E470D0A1A0A"), beInt(33, 8)).as("width"),
        when(col("h").startsWith("89504E470D0A1A0A"), beInt(41, 8)).as("height"),
        when(col("h").startsWith("89504E470D0A1A0A"), beInt(49, 2)).as("bit_depth"),
        when(col("h").startsWith("52494646"), leInt2(45)).as("channels"),
        when(col("h").startsWith("52494646"), leInt4(49)).as("sample_rate"))
  }

  val m13 = GraftQuery(
    "m13_header_metadata",
    "Codec-free header parse: PNG IHDR dims + WAV fmt channels/rate from fixed offsets",
    (s, dir) => {
      def be4(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      def le4(c: org.apache.spark.sql.Column) = {
        val h = be4(c)
        concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
      }
      def le2(c: org.apache.spark.sql.Column) = {
        val h = lpad(hex(c), 4, "0")
        concat(substring(h, 3, 2), substring(h, 1, 2))
      }
      val width = col("doc_id") % 640 + 16
      val height = (col("doc_id") * 7) % 480 + 16
      val channels = col("doc_id") % 2 + 1
      val rate = (col("doc_id") % 5 + 1) * lit(8000L)
      val planted = table(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(unhex(concat(lit("89504E470D0A1A0A0000000D49484452"),
              be4(width), be4(height), lit("0806000000DEADBEEF"))),
              col("text").cast("binary")))
            .when(col("doc_id") % 3 === 1,
              concat(unhex(concat(lit("52494646"), le4(length(col("text")) + 36),
                lit("57415645666D742010000000"), lit("0100"), le2(channels),
                le4(rate))), col("text").cast("binary")))
            .otherwise(col("text").cast("binary")).as("b"))
      headerMeta(planted).orderBy("doc_id")
    },
    Some("""
      WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN
                 from_hex('89504E470D0A1A0A0000000D49484452'
                   || lpad(hex(doc_id % 640 + 16), 8, '0')
                   || lpad(hex((doc_id * 7) % 480 + 16), 8, '0')
                   || '0806000000DEADBEEF') || encode(text)
               WHEN doc_id % 3 = 1 THEN
                 from_hex('52494646'
                   || substr(lpad(hex(length(text) + 36), 8, '0'), 7, 2)
                   || substr(lpad(hex(length(text) + 36), 8, '0'), 5, 2)
                   || substr(lpad(hex(length(text) + 36), 8, '0'), 3, 2)
                   || substr(lpad(hex(length(text) + 36), 8, '0'), 1, 2)
                   || '57415645666D742010000000' || '0100'
                   || substr(lpad(hex(doc_id % 2 + 1), 4, '0'), 3, 2)
                   || substr(lpad(hex(doc_id % 2 + 1), 4, '0'), 1, 2)
                   || substr(lpad(hex((doc_id % 5 + 1) * 8000), 8, '0'), 7, 2)
                   || substr(lpad(hex((doc_id % 5 + 1) * 8000), 8, '0'), 5, 2)
                   || substr(lpad(hex((doc_id % 5 + 1) * 8000), 8, '0'), 3, 2)
                   || substr(lpad(hex((doc_id % 5 + 1) * 8000), 8, '0'), 1, 2))
                 || encode(text)
               ELSE encode(text) END AS b
        FROM documents),
      hx AS (SELECT doc_id, hex(b) AS h FROM planted)
      SELECT doc_id,
             CASE WHEN starts_with(h, '89504E470D0A1A0A') THEN 'png'
                  WHEN starts_with(h, '52494646')
                       AND substr(h, 17, 8) = '57415645' THEN 'wav'
                  ELSE 'unparsed' END AS container,
             CASE WHEN starts_with(h, '89504E470D0A1A0A')
                  THEN CAST('0x' || substr(h, 33, 8) AS BIGINT) END AS width,
             CASE WHEN starts_with(h, '89504E470D0A1A0A')
                  THEN CAST('0x' || substr(h, 41, 8) AS BIGINT) END AS height,
             CASE WHEN starts_with(h, '89504E470D0A1A0A')
                  THEN CAST('0x' || substr(h, 49, 2) AS BIGINT) END AS bit_depth,
             CASE WHEN starts_with(h, '52494646')
                  THEN CAST('0x' || substr(h, 47, 2) || substr(h, 45, 2) AS BIGINT)
                  END AS channels,
             CASE WHEN starts_with(h, '52494646')
                  THEN CAST('0x' || substr(h, 55, 2) || substr(h, 53, 2)
                         || substr(h, 51, 2) || substr(h, 49, 2) AS BIGINT)
                  END AS sample_rate
      FROM hx
      ORDER BY doc_id"""))

  /** Ragged-batch formation for model inference — the serving-side step
    * between m13's header scan and m2's decode: images padded to their
    * batch's max canvas waste compute proportional to the dimension
    * spread, so production batchers SORT by shape first (bucketed
    * batching). Batches of 8 are cut over the height-sorted PNG stream
    * (row_number div 8 — one window pass); per batch the canvas is
    * (max_w × max_h × n) and waste_bp its unused fraction, all exact
    * integer math on m13's parsed header dims — no decode touched. The
    * oracle derives dims from the planted-header generator directly
    * (m13 proves parse == plant byte-for-byte), keeping its replay
    * short. At 100 TB batching is per-partition streaming over a
    * dimension-sorted layout — the same window math, zero extra
    * shuffles beyond the sort. */
  val m14 = GraftQuery(
    "m14_inference_batching",
    "Height-sorted ragged batches of 8 over parsed PNG dims: canvas, pixel waste bp per batch",
    (s, dir) => {
      def be4(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      val width = col("doc_id") % 640 + 16
      val height = (col("doc_id") * 7) % 480 + 16
      val planted = table(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          concat(unhex(concat(lit("89504E470D0A1A0A0000000D49484452"),
            be4(width), be4(height), lit("0806000000DEADBEEF"))),
            col("text").cast("binary")).as("b"))
      val dims = headerMeta(planted)
        .filter(col("container") === "png")
        .select(col("doc_id"), col("width"), col("height"))
      dims
        .withColumn("batch_id", expr("(row_number() OVER (ORDER BY height, doc_id) - 1) div 8"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n"),
          max(col("width")).as("max_w"),
          max(col("height")).as("max_h"),
          sum(col("width") * col("height")).as("pixels"))
        .withColumn("canvas", col("max_w") * col("max_h") * col("n"))
        .withColumn("waste_bp", expr("(canvas - pixels) * 10000 div canvas"))
        .select("batch_id", "n", "max_w", "max_h", "pixels", "waste_bp")
        .orderBy("batch_id")
    },
    Some("""
      WITH dims AS (
        SELECT doc_id, doc_id % 640 + 16 AS width, (doc_id * 7) % 480 + 16 AS height
        FROM documents WHERE doc_id % 3 = 0),
      seq AS (SELECT doc_id, width, height,
                     (row_number() OVER (ORDER BY height, doc_id) - 1) // 8 AS batch_id
              FROM dims),
      b AS (SELECT batch_id, count(*) AS n, max(width) AS max_w,
                   max(height) AS max_h,
                   CAST(sum(width * height) AS BIGINT) AS pixels
            FROM seq GROUP BY batch_id)
      SELECT batch_id, n, max_w, max_h, pixels,
             CAST((max_w * max_h * n - pixels) * 10000 // (max_w * max_h * n)
                  AS BIGINT) AS waste_bp
      FROM b
      ORDER BY batch_id"""))

  /** Catalog-vs-payload consistency audit — "trust but verify the
    * metadata": media catalogs carry dimensions copied around since
    * ingest (the reference copies StorageDescriptors the same way,
    * gluettalax.py:456-459), and layout decisions (m14 batching) silently
    * go wrong when they drift from the bytes. The audit joins m13's
    * header-PARSED dims against a sidecar catalog (planted stale rows:
    * every 11th entry claims width+4 — a resize whose catalog update was
    * lost) and flags mismatches with the drift delta. At scale this is a
    * header-scan (~32 bytes/row) + broadcast-or-shuffle join on doc_id —
    * never a decode. */
  val m15 = GraftQuery(
    "m15_catalog_drift_audit",
    "Header-parsed dims vs sidecar catalog: planted stale entries flagged with drift deltas",
    (s, dir) => {
      def be4(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      val width = col("doc_id") % 640 + 16
      val height = (col("doc_id") * 7) % 480 + 16
      val planted = table(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          concat(unhex(concat(lit("89504E470D0A1A0A0000000D49484452"),
            be4(width), be4(height), lit("0806000000DEADBEEF"))),
            col("text").cast("binary")).as("b"))
      val parsed = headerMeta(planted)
        .filter(col("container") === "png")
        .select(col("doc_id"), col("width").as("real_w"), col("height").as("real_h"))
      val catalog = table(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          (col("doc_id") % 640 + 16 +
            when(col("doc_id") % 11 === 0, 4L).otherwise(0L)).as("cat_w"),
          ((col("doc_id") * 7) % 480 + 16).as("cat_h"))
      parsed.join(catalog, "doc_id")
        .select(col("doc_id"), col("real_w"), col("cat_w"),
          (col("cat_w") - col("real_w")).as("drift_w"),
          (col("real_w") === col("cat_w") && col("real_h") === col("cat_h"))
            .as("consistent"))
        .filter(!col("consistent"))
        .orderBy("doc_id")
    },
    Some("""
      WITH d AS (SELECT doc_id,
                        doc_id % 640 + 16 AS real_w,
                        doc_id % 640 + 16
                          + CASE WHEN doc_id % 11 = 0 THEN 4 ELSE 0 END AS cat_w
                 FROM documents WHERE doc_id % 3 = 0)
      SELECT doc_id, real_w, cat_w, cat_w - real_w AS drift_w,
             FALSE AS consistent
      FROM d
      WHERE real_w <> cat_w
      ORDER BY doc_id"""))

  /** One content tile: grid position, size, digest. */
  final case class TileRow(doc_id: Long, tile_idx: Long, tile_len: Long,
      digest: String)

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** The tiler at the codec seam (m2's pattern applied to sub-image
    * granularity): a decodable image splits into a 4×4 grid of pixel
    * blocks — each block's ARGB ints digested independently, the unit of
    * crop/logo/watermark dedup — while any other payload takes the labeled
    * deterministic fake: 16 equal CHARACTER slices (m3's char-framing
    * rule; the last tile absorbs the remainder), digested over UTF-8
    * bytes, which is exactly what the SQL oracle replays. Real-path
    * behavior (identical blocks ⇒ identical digests, position-independent)
    * is pinned by MultimodalDecodeSpec on a synthesized PNG. */
  private[graft] def tileDigests(r: MediaRow): Seq[TileRow] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
      catch { case _: Throwable => null }
    if (img != null) {
      val (tw, th) = (img.getWidth / 4, img.getHeight / 4)
      if (tw == 0 || th == 0) Seq.empty
      else for (ty <- 0 until 4; tx <- 0 until 4) yield {
        val px = img.getRGB(tx * tw, ty * th, tw, th, null, 0, tw)
        val bb = java.nio.ByteBuffer.allocate(px.length * 4)
        px.foreach(bb.putInt)
        TileRow(r.doc_id, ty * 4L + tx, tw.toLong * th, md5Hex(bb.array()))
      }
    } else {
      val text = new String(r.content, java.nio.charset.StandardCharsets.UTF_8)
      // Slice on CODE POINTS, not UTF-16 code units: the oracle's DuckDB
      // substring/length are code-point-based, and supplementary-plane
      // characters (emoji) occupy two UTF-16 units — unit-based boundaries
      // would split surrogate pairs and diverge (ADVICE r8).
      val nCp = text.codePointCount(0, text.length)
      val t = nCp / 16
      if (t == 0) Seq.empty
      else {
        val offsets = (0 until 16).scanLeft(0)((off, _) => text.offsetByCodePoints(off, t))
        (0 until 16).map { i =>
          val slice =
            if (i == 15) text.substring(offsets(15))
            else text.substring(offsets(i), offsets(i + 1))
          val sliceCp = if (i == 15) nCp - 15 * t else t
          TileRow(r.doc_id, i.toLong, sliceCp.toLong,
            md5Hex(slice.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }
    }
  }

  /** Tile-level duplicate detection — the sub-image dedup a crawl pipeline
    * runs to catch shared crops, logos, and boilerplate banners that
    * whole-image digests (m11) and perceptual whole-frame hashes (m10)
    * both miss: content tiles through the codec seam, then a digest-keyed
    * share analysis per grid position. Scale: the shuffle carries (tile
    * digest, position) pairs — 16 fixed-size digests per asset, never
    * pixels; the share groupBy keys on digest (uniform), and the report
    * is 16 rows regardless of corpus size. Exact-duplicate assets appear
    * as digests shared at EVERY position, cropped/partial copies as
    * shares at some positions only — which is the signal tile granularity
    * exists to expose. */
  val m16 = GraftQuery(
    "m16_tile_dedup",
    "4×4 content tiling via the codec seam + per-position tile-share report",
    (s, dir) => {
      import s.implicits._
      val tiles = table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .as[MediaRow]
        .mapPartitions(rows => rows.flatMap(tileDigests))
        .toDF()
      val byDigest = tiles
        .groupBy("tile_idx", "digest")
        .agg(count(lit(1)).as("n_docs"))
      byDigest
        .groupBy("tile_idx")
        .agg(sum(col("n_docs")).as("n_tiles"),
          count(lit(1)).as("n_distinct"),
          coalesce(sum(when(col("n_docs") > 1, col("n_docs"))), lit(0L)).as("n_docs_sharing"),
          max(col("n_docs")).as("max_share"))
        .orderBy("tile_idx")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, text, length(text) // 16 AS t
        FROM documents WHERE length(text) // 16 > 0),
      tiles AS (
        SELECT doc_id, i.tile_idx,
               md5(CASE WHEN i.tile_idx = 15
                        THEN substring(text, CAST(15 * t + 1 AS INTEGER))
                        ELSE substring(text, CAST(i.tile_idx * t + 1 AS INTEGER),
                                       CAST(t AS INTEGER))
                   END) AS digest
        FROM d, (SELECT unnest(range(16)) AS tile_idx) i),
      by_digest AS (
        SELECT tile_idx, digest, count(*) AS n_docs
        FROM tiles GROUP BY tile_idx, digest)
      SELECT tile_idx,
             CAST(sum(n_docs) AS BIGINT) AS n_tiles,
             count(*) AS n_distinct,
             CAST(coalesce(sum(CASE WHEN n_docs > 1 THEN n_docs END), 0) AS BIGINT)
               AS n_docs_sharing,
             CAST(max(n_docs) AS BIGINT) AS max_share
      FROM by_digest
      GROUP BY tile_idx
      ORDER BY tile_idx"""))

  /** WebDataset-style SHARD PACKING manifest — the storage-layout decision
    * every multimodal training corpus makes before a single GPU reads it:
    * payloads are streamed per source in doc_id order into ~4 KiB shard
    * archives, split by the tar-stream rule (a shard closes when the byte
    * cursor crosses the cap; the straddling payload belongs to the shard
    * where it STARTS — whole files never split, unlike t12's token
    * packing, which fills chunks exactly by splitting sequences). Output
    * is the manifest a loader consumes: per (source, shard) the file
    * count, byte extent, doc_id span, and an md5 over the ordered member
    * list (the integrity check distributed readers re-derive). All byte
    * math on octet lengths (multi-byte UTF-8 counted as stored); the
    * window is one per-source cumulative sum — layout planning costs one
    * shuffle at any corpus size, and the manifest is corpus/cap rows. */
  val m17 = GraftQuery(
    "m17_shard_manifest",
    "Shard-packing manifest: per-source 4KiB tar-stream shards, byte extents + member-list md5",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cap = 4096L
      val wCum = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          length(col("text").cast("binary")).cast("long").as("bytes"))
        .withColumn("cum_before",
          coalesce(sum("bytes").over(wCum), lit(0L)))
        .withColumn("shard_id", expr(s"cum_before div ${cap}L"))
        .groupBy("source", "shard_id")
        .agg(count(lit(1)).as("n_files"),
          sum("bytes").as("shard_bytes"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"),
          md5(concat_ws(",", sort_array(collect_list(col("doc_id"))))
            .cast("binary")).as("manifest_md5"))
        .orderBy("source", "shard_id")
    },
    Some("""
      WITH sized AS (
        SELECT source, doc_id, octet_length(encode(text)) AS bytes
        FROM documents),
      placed AS (
        SELECT source, doc_id, bytes,
               coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
        FROM sized)
      SELECT source, CAST(cum_before // 4096 AS BIGINT) AS shard_id,
             count(*) AS n_files,
             CAST(sum(bytes) AS BIGINT) AS shard_bytes,
             min(doc_id) AS first_doc,
             max(doc_id) AS last_doc,
             md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS manifest_md5
      FROM placed
      GROUP BY source, shard_id
      ORDER BY source, shard_id"""))

  /** SCENE-CUT detection at the frame seam — shot boundary detection,
    * the first pass of every video pipeline (keyframe selection, ad-break
    * alignment, dedup at shot granularity): the payload is sliced into
    * fixed 32-char frames (the codec-free stand-in the m5/m8/m12 family
    * uses — a real decoder changes only the frame iterator), each frame
    * reduces to an integer mean "luma" (sum of code points div length,
    * m12's primitive), and a CUT fires where consecutive frame lumas
    * differ by ≥ 8 — the classic histogram-delta threshold detector.
    * Entirely row-local HOF arithmetic: frames, lumas, and deltas never
    * leave the row, so the per-doc cost is O(payload) with zero
    * shuffles before the final bounded rollup. Output: per-doc frame
    * count, cut count, and first cut index (0 = none). */
  val m18 = GraftQuery(
    "m18_scene_cuts",
    "Shot-boundary detection: 32-char frames, integer mean-luma deltas, threshold cuts per doc",
    (s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("nf", expr(
          "CAST(least(greatest((length(text) + 31) div 32, 1), 16) AS INT)"))
        .withColumn("lumas", expr(
          """transform(sequence(0, nf - 1), k ->
               aggregate(transform(split(substring(text, k * 32 + 1, 32), ''),
                         c -> CAST(ascii(c) AS BIGINT)),
                 0L, (a, x) -> a + x)
               div greatest(length(substring(text, k * 32 + 1, 32)), 1))"""))
        .withColumn("cutflags", expr(
          """transform(sequence(1, nf - 1), k ->
               CASE WHEN abs(element_at(lumas, k + 1) - element_at(lumas, k)) >= 8
                    THEN 1L ELSE 0L END)"""))
        .select(col("doc_id"), col("nf").cast("long").as("n_frames"),
          expr("aggregate(cutflags, 0L, (a, x) -> a + x)").as("n_cuts"),
          expr("""coalesce(array_position(cutflags, 1L), 0L)""")
            .as("first_cut_idx"))
        .orderBy("doc_id")
    },
    Some("""
      WITH framed AS (
        SELECT doc_id, text,
               CAST(least(greatest((length(text) + 31) // 32, 1), 16) AS BIGINT)
                 AS nf
        FROM documents),
      lumas AS (
        SELECT doc_id, nf,
               list_transform(range(0, CAST(nf AS INTEGER)), k ->
                 list_sum(list_transform(
                     string_split(substr(text, k * 32 + 1, 32), ''),
                     c -> CAST(ascii(c) AS BIGINT)))
                 // greatest(length(substr(text, k * 32 + 1, 32)), 1))
                 AS l
        FROM framed),
      cuts AS (
        SELECT doc_id, nf,
               list_transform(range(1, CAST(nf AS INTEGER)), k ->
                 CASE WHEN abs(l[k + 1] - l[k]) >= 8 THEN 1 ELSE 0 END)
                 AS cf
        FROM lumas)
      SELECT doc_id, nf AS n_frames,
             CAST(coalesce(list_sum(cf), 0) AS BIGINT) AS n_cuts,
             CAST(coalesce(list_position(cf, 1), 0) AS BIGINT)
               AS first_cut_idx
      FROM cuts
      ORDER BY doc_id"""))

  /** Deterministic AUGMENTATION assignment — the training-data answer to
    * "what crop/flip did sample X get in epoch E": parameters derive from
    * md5(doc_id ':' epoch), so any worker, any retry, any re-shard deals
    * the SAME augmentation without coordination or stored state — the
    * property that makes augmented epochs reproducible at 1000 executors.
    * Hex nibbles decode via strpos arithmetic (both engines lack a shared
    * hex→int cast; the lookup-string form is portable and row-local):
    * crop_x/crop_y from 4 nibbles mod 193 (224−31 valid offsets),
    * horizontal flip from one nibble, rotation quadrant from another.
    * The report aggregates per epoch — counts, flip share, integer mean
    * offsets, rotation histogram — proving decorrelation across epochs.
    * Scale shape: the assignment is a pure projection (one md5 per
    * (sample, epoch), zero shuffles); only the 3-row epoch rollup
    * exchanges, and a real pipeline would fuse the decode + augment at
    * this exact seam (m2/m4's mapPartitions codec). */
  val m19 = GraftQuery(
    "m19_augmentation_assignment",
    "Deterministic per-(sample, epoch) crop/flip/rotation from md5, epoch-level audit",
    (s, dir) => {
      def nib(i: Int) =
        s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1)"
      def quad(i: Int) =
        s"(((${nib(i)} * 16 + ${nib(i + 1)}) * 16 + ${nib(i + 2)}) * 16 + ${nib(i + 3)})"
      table(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("sequence(0L, 2L)")).as("epoch"))
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string"))))
        .withColumn("crop_x", expr(s"${quad(1)} % 193"))
        .withColumn("crop_y", expr(s"${quad(5)} % 193"))
        .withColumn("flip", expr(s"${nib(9)} % 2"))
        .withColumn("rot", expr(s"${nib(10)} % 4"))
        .groupBy("epoch")
        .agg(count(lit(1)).as("n"),
          sum("flip").as("n_flipped"),
          expr("sum(crop_x) div count(*)").as("avg_crop_x"),
          expr("sum(crop_y) div count(*)").as("avg_crop_y"),
          sum(when(col("rot") === 0, 1L).otherwise(0L)).as("n_rot0"),
          sum(when(col("rot") === 1, 1L).otherwise(0L)).as("n_rot90"),
          sum(when(col("rot") === 2, 1L).otherwise(0L)).as("n_rot180"),
          sum(when(col("rot") === 3, 1L).otherwise(0L)).as("n_rot270"))
        .orderBy("epoch")
    },
    Some("""
      WITH assigned AS (
        SELECT epoch,
               (strpos('0123456789abcdef', substring(h, 9, 1)) - 1) % 2
                 AS flip,
               (strpos('0123456789abcdef', substring(h, 10, 1)) - 1) % 4
                 AS rot,
               ((((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1)) * 16
                  + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1)) * 16
                  + (strpos('0123456789abcdef', substring(h, 4, 1)) - 1)) % 193
                 AS crop_x,
               ((((strpos('0123456789abcdef', substring(h, 5, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substring(h, 6, 1)) - 1)) * 16
                  + (strpos('0123456789abcdef', substring(h, 7, 1)) - 1)) * 16
                  + (strpos('0123456789abcdef', substring(h, 8, 1)) - 1)) % 193
                 AS crop_y
        FROM (
          SELECT md5(concat(CAST(doc_id AS VARCHAR), ':',
                            CAST(epoch AS VARCHAR))) AS h, epoch
          FROM documents, (SELECT unnest(range(0, 3)) AS epoch)))
      SELECT epoch, count(*) AS n,
             CAST(sum(flip) AS BIGINT) AS n_flipped,
             CAST(sum(crop_x) AS BIGINT) // count(*) AS avg_crop_x,
             CAST(sum(crop_y) AS BIGINT) // count(*) AS avg_crop_y,
             CAST(sum(CASE WHEN rot = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rot0,
             CAST(sum(CASE WHEN rot = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rot90,
             CAST(sum(CASE WHEN rot = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rot180,
             CAST(sum(CASE WHEN rot = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rot270
      FROM assigned
      GROUP BY epoch
      ORDER BY epoch"""))

  /** CROSS-MODAL duplicate detection — the corpus-level question a
    * mixed-media pipeline must answer with ONE verdict: are two
    * documents duplicates in ANY representation? Each doc fingerprints
    * through two independent chunkers — the m16-style fixed 64-char
    * TILES (the image-patch analog) and 8-word STRIDE CHUNKS (the text
    * analog) — and candidate pairs come from digest equi-joins in each
    * modality separately (bucketed by digest — never an all-pairs
    * compare; the same join discipline as d1/m16). The report classes
    * every candidate pair: tiles-only, chunks-only, or confirmed-both —
    * the disagreement classes are exactly where a single-modality dedup
    * silently under-merges (layout changes defeat tiles, rewording
    * defeats chunks). Bounded to the ground-truth slice; the production
    * path runs the same two digest tables at corpus scale. */
  val m20 = GraftQuery(
    "m20_cross_modal_dedup",
    "Tile digests vs word-chunk digests: pair candidates per modality, agreement classes",
    (s, dir) => {
      val docs = table(s, dir, "documents")
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val tiles = docs
        .withColumn("nt", expr(
          "CAST(greatest((length(text) + 63) div 64, 1) AS INT)"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, nt - 1),
               k -> md5(CAST(substring(text, k * 64 + 1, 64) AS BINARY)))"""))
          .as("dg")).distinct()
      val chunks = docs
        .withColumn("ws", split(lower(col("text")), " "))
        .withColumn("nc", expr(
          "CAST(greatest((size(ws) + 7) div 8, 1) AS INT)"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, nc - 1),
               k -> md5(CAST(array_join(slice(ws, k * 8 + 1, 8), ' ')
                        AS BINARY)))""")).as("dg")).distinct()
      def pairsOf(f: org.apache.spark.sql.DataFrame, name: String) = f.as("a")
        .join(f.as("b"),
          col("a.dg") === col("b.dg") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
        .agg(count(lit(1)).as(name))
      pairsOf(tiles, "n_tile_hits")
        .join(pairsOf(chunks, "n_chunk_hits"), Seq("doc1", "doc2"), "full_outer")
        .withColumn("n_tile_hits", coalesce(col("n_tile_hits"), lit(0L)))
        .withColumn("n_chunk_hits", coalesce(col("n_chunk_hits"), lit(0L)))
        .withColumn("verdict", expr(
          """CASE WHEN n_tile_hits > 0 AND n_chunk_hits > 0 THEN '1_both'
                  WHEN n_tile_hits > 0 THEN '2_tiles_only'
                  ELSE '3_chunks_only' END"""))
        .groupBy("verdict")
        .agg(count(lit(1)).as("n_pairs"),
          sum("n_tile_hits").as("tile_hits"),
          sum("n_chunk_hits").as("chunk_hits"))
        .orderBy("verdict")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 300),
      tiles AS (
        SELECT DISTINCT doc_id,
               md5(substring(text, k * 64 + 1, 64)) AS dg
        FROM docs, UNNEST(range(0, CAST(greatest((length(text) + 63) // 64, 1)
                                   AS INTEGER))) AS t(k)),
      chunks AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(ws[k * 8 + 1 : k * 8 + 8], ' ')) AS dg
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM docs),
             UNNEST(range(0, CAST(greatest((len(ws) + 7) // 8, 1)
                             AS INTEGER))) AS t(k)),
      tp AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                    count(*) AS n_tile_hits
             FROM tiles a JOIN tiles b
               ON a.dg = b.dg AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      cp AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2,
                    count(*) AS n_chunk_hits
             FROM chunks a JOIN chunks b
               ON a.dg = b.dg AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      merged AS (
        SELECT coalesce(tp.doc1, cp.doc1) AS doc1,
               coalesce(tp.doc2, cp.doc2) AS doc2,
               coalesce(tp.n_tile_hits, 0) AS n_tile_hits,
               coalesce(cp.n_chunk_hits, 0) AS n_chunk_hits
        FROM tp FULL OUTER JOIN cp
          ON tp.doc1 = cp.doc1 AND tp.doc2 = cp.doc2)
      SELECT CASE WHEN n_tile_hits > 0 AND n_chunk_hits > 0 THEN '1_both'
                  WHEN n_tile_hits > 0 THEN '2_tiles_only'
                  ELSE '3_chunks_only' END AS verdict,
             count(*) AS n_pairs,
             CAST(sum(n_tile_hits) AS BIGINT) AS tile_hits,
             CAST(sum(n_chunk_hits) AS BIGINT) AS chunk_hits
      FROM merged
      GROUP BY 1
      ORDER BY verdict"""))

  /** INTERLEAVED MULTIMODAL CONTEXT PACKING — t12's concat-and-chunk
    * assembly at the VLM seam: a vision-language training sequence
    * interleaves text spans with image placeholders whose token cost is
    * the PATCH GRID (ceil(w/16)·ceil(h/16) for a 16-px ViT), so the
    * packer must price each modality differently before cutting 2048-
    * token windows. Every third doc is an image (the m13/m14 planting
    * convention); its cost derives from the REAL header parse
    * (headerMeta — the dims travel binary→parse→cost, not from a trusted
    * catalog, which m15 shows drifts), text costs whitespace tokens.
    * Per (source, window): item/image counts and the text-vs-image token
    * split — the number a mixture designer reads to see how much of the
    * context budget images eat. Same scale shape as t12: one cumulative
    * sum per source + a bounded explode (a doc spans ≤ cost/B + 1
    * windows); the parse is a ~32-byte header scan, never a decode. */
  val m21 = GraftQuery(
    "m21_interleaved_packing",
    "VLM context packing: patch-grid-priced images interleaved with text into 2048-token windows",
    (s, dir) => {
      val B = 2048
      def be4(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      val width = col("doc_id") % 640 + 16
      val height = (col("doc_id") * 7) % 480 + 16
      val docs = table(s, dir, "documents")
      val planted = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("source"),
          concat(unhex(concat(lit("89504E470D0A1A0A0000000D49484452"),
            be4(width), be4(height), lit("0806000000DEADBEEF"))),
            col("text").cast("binary")).as("b"))
      val imgItems = headerMeta(planted.drop("source"))
        .filter(col("container") === "png")
        .join(planted.select("doc_id", "source"), "doc_id")
        .select(col("doc_id"), col("source"),
          expr("CAST(((width + 15) div 16) * ((height + 15) div 16) AS BIGINT)")
            .as("tok"),
          lit("image").as("modality"))
      val txtItems = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"),
          lit("text").as("modality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      val spans = txtItems.unionByName(imgItems)
        .withColumn("e", sum("tok").over(w))
        .withColumn("b", col("e") - col("tok"))
      spans
        .select(col("source"), col("modality"), col("b"), col("e"),
          explode(sequence(floor(col("b") / B), floor((col("e") - 1) / B)))
            .as("chunk_id"))
        .withColumn("fill",
          least(col("e"), (col("chunk_id") + 1) * B)
            - greatest(col("b"), col("chunk_id") * B))
        .groupBy("source", "chunk_id")
        .agg(count(lit(1)).as("n_items"),
          sum(when(col("modality") === "image", 1L).otherwise(0L)).as("n_images"),
          sum(when(col("modality") === "text", col("fill")).otherwise(0L))
            .as("text_tokens"),
          sum(when(col("modality") === "image", col("fill")).otherwise(0L))
            .as("image_tokens"))
        .orderBy("source", "chunk_id")
    },
    Some("""
      WITH items AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 3 = 0
                 THEN ((doc_id % 640 + 16 + 15) // 16)
                      * (((doc_id * 7) % 480 + 16 + 15) // 16)
                 ELSE len(string_split(text, ' ')) END AS tok,
               CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'text' END
                 AS modality
        FROM documents),
      spans AS (
        SELECT doc_id, source, modality, tok,
               CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
        FROM items),
      sp AS (SELECT *, e - tok AS b FROM spans),
      ex AS (SELECT source, modality, b, e, chunk_id
             FROM sp, UNNEST(range(b // 2048, (e - 1) // 2048 + 1))
               AS t(chunk_id))
      SELECT source, chunk_id, count(*) AS n_items,
             CAST(sum(CASE WHEN modality = 'image' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_images,
             CAST(sum(CASE WHEN modality = 'text'
               THEN least(e, (chunk_id + 1) * 2048)
                    - greatest(b, chunk_id * 2048) ELSE 0 END) AS BIGINT)
               AS text_tokens,
             CAST(sum(CASE WHEN modality = 'image'
               THEN least(e, (chunk_id + 1) * 2048)
                    - greatest(b, chunk_id * 2048) ELSE 0 END) AS BIGINT)
               AS image_tokens
      FROM ex
      GROUP BY source, chunk_id
      ORDER BY source, chunk_id"""))

  /** CONTRASTIVE PAIR ASSEMBLY — the CLIP-style training-batch op: each
    * image (the m13 planting convention, dims through the REAL header
    * parse) pairs with its caption (the doc's text), and batches of 8
    * are drawn by md5 RANK (t13's deterministic seedless shuffle — id
    * order would batch neighbors, and contrastive learning needs mixed
    * negatives). Within a batch every non-matching (image, caption)
    * combination is a free negative: 8 positives buy 56 negatives —
    * the in-batch trick that makes contrastive training data-efficient.
    * Per batch the audit reports what a training engineer checks before
    * a run: negative count, CONFOUNDED negatives (same-source pairs —
    * a caption that plausibly matches a sibling image is a false
    * negative, the contrastive analogue of t55's containment guard),
    * the patch-token load (m21's pricing — batches must fit the vision
    * tower), and caption length. One rank window + one groupBy; the
    * confounded count is Σ c·(c−1) over in-batch source counts, plain
    * algebra, never a pair join. */
  val m22 = GraftQuery(
    "m22_contrastive_batches",
    "CLIP-batch assembly by md5 rank: in-batch negatives, confounded same-source count, patch load",
    (s, dir) => {
      def be4(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      val width = col("doc_id") % 640 + 16
      val height = (col("doc_id") * 7) % 480 + 16
      val docs = table(s, dir, "documents")
      val planted = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("source"), col("text"),
          concat(unhex(concat(lit("89504E470D0A1A0A0000000D49484452"),
            be4(width), be4(height), lit("0806000000DEADBEEF"))),
            col("text").cast("binary")).as("b"))
      val items = headerMeta(planted.select("doc_id", "b"))
        .filter(col("container") === "png")
        .join(planted.select("doc_id", "source", "text"), "doc_id")
        .select(col("doc_id"), col("source"),
          expr("CAST(((width + 15) div 16) * ((height + 15) div 16) AS BIGINT)")
            .as("patches"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("cap_tokens"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .withColumn("batch_id", expr("(rk - 1) div 8"))
      val perSource = items.groupBy("batch_id", "source")
        .agg(count(lit(1)).as("c"))
        .groupBy("batch_id")
        .agg(sum(expr("c * (c - 1)")).as("n_confounded_neg"))
      items.groupBy("batch_id")
        .agg(count(lit(1)).as("n_items"),
          sum("patches").as("patch_tokens"),
          sum("cap_tokens").as("caption_tokens"),
          min("doc_id").as("first_doc"))
        .join(perSource, "batch_id")
        .select(col("batch_id"), col("n_items"),
          expr("n_items * (n_items - 1)").as("n_negatives"),
          col("n_confounded_neg"), col("patch_tokens"),
          col("caption_tokens"), col("first_doc"))
        .orderBy("batch_id")
    },
    Some("""
      WITH items AS (
        SELECT doc_id, source,
               ((doc_id % 640 + 16 + 15) // 16)
                 * (((doc_id * 7) % 480 + 16 + 15) // 16) AS patches,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS cap_tokens,
               row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rk
        FROM documents WHERE doc_id % 3 = 0),
      b AS (SELECT *, (rk - 1) // 8 AS batch_id FROM items),
      conf AS (
        SELECT batch_id, CAST(sum(c * (c - 1)) AS BIGINT) AS n_confounded_neg
        FROM (SELECT batch_id, source, count(*) AS c
              FROM b GROUP BY batch_id, source)
        GROUP BY batch_id)
      SELECT b2.batch_id, b2.n_items,
             b2.n_items * (b2.n_items - 1) AS n_negatives,
             conf.n_confounded_neg, b2.patch_tokens, b2.caption_tokens,
             b2.first_doc
      FROM (SELECT batch_id, count(*) AS n_items,
                   CAST(sum(patches) AS BIGINT) AS patch_tokens,
                   CAST(sum(cap_tokens) AS BIGINT) AS caption_tokens,
                   min(doc_id) AS first_doc
            FROM b GROUP BY batch_id) b2
      JOIN conf USING (batch_id)
      ORDER BY b2.batch_id"""))

  /** ASPECT-RATIO BUCKETING — the batching layer every image-training
    * pipeline puts between the catalog and the GPU (the SDXL-style
    * resolution ladder): batching mixed-shape images naively means
    * padding everything to the batch max (wasted pixels = wasted FLOPs)
    * or center-cropping (destroyed composition); bucketing snaps each
    * image to the NEAREST aspect ratio in a fixed ladder of
    * equal-area-budget resolutions, so a batch is shape-uniform with
    * only a small aspect distortion. Runs off the parsed-dimension
    * CATALOG (m13's header-parse contract — at 100 TB you bucket from
    * metadata, never by re-reading image bytes), assignment is ROW-LOCAL
    * integer argmin over the 7-entry ladder (a transform + array_min on
    * (dist, r) structs — ties break to the smaller ratio, no window, no
    * join), and every metric is integer bp (aspect = w·10⁴ div h). The
    * per-bucket report carries image counts, batch counts at batch=32,
    * and the realized distortion band — the numbers that decide whether
    * the ladder needs more rungs. */
  val m23 = GraftQuery(
    "m23_aspect_bucketing",
    "SDXL-style aspect-ratio bucketing from the dims catalog: row-local ladder argmin, per-bucket batch stats",
    (s, dir) => {
      val dims = table(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 640 + 16).cast("long").as("w"),
          ((col("doc_id") * 7) % 480 + 16).cast("long").as("h"))
        .withColumn("ar_bp", expr("w * 10000 div h"))
      val picked = dims.withColumn("pick", array_min(expr(
        """transform(
             array(struct(2500L AS r, 256L AS tw, 1024L AS th),
                   struct(5000L AS r, 384L AS tw, 768L AS th),
                   struct(7500L AS r, 432L AS tw, 576L AS th),
                   struct(10000L AS r, 512L AS tw, 512L AS th),
                   struct(13333L AS r, 576L AS tw, 432L AS th),
                   struct(20000L AS r, 768L AS tw, 384L AS th),
                   struct(40000L AS r, 1024L AS tw, 256L AS th)),
             e -> struct(abs(ar_bp - e.r) AS dist, e.r AS r,
                         e.tw AS tw, e.th AS th))""")))
      picked.groupBy(col("pick.r").as("r_bp"), col("pick.tw").as("tw"),
          col("pick.th").as("th"))
        .agg(count(lit(1)).as("n_images"),
          expr("CAST((count(1) + 31) div 32 AS BIGINT)").as("n_batches"),
          expr("sum(pick.dist) div count(1)").as("avg_dist_bp"),
          min("ar_bp").as("min_ar_bp"), max("ar_bp").as("max_ar_bp"))
        .orderBy("r_bp")
    },
    Some("""
      WITH dims AS (
        SELECT doc_id, CAST(doc_id % 640 + 16 AS BIGINT) AS w,
               CAST((doc_id * 7) % 480 + 16 AS BIGINT) AS h
        FROM documents),
      ar AS (SELECT doc_id, w * 10000 // h AS ar_bp FROM dims),
      ladder(r, tw, th) AS (VALUES
        (2500, 256, 1024), (5000, 384, 768), (7500, 432, 576),
        (10000, 512, 512), (13333, 576, 432), (20000, 768, 384),
        (40000, 1024, 256)),
      pick AS (
        SELECT a.doc_id, a.ar_bp, l.r, l.tw, l.th,
               abs(a.ar_bp - l.r) AS dist,
               row_number() OVER (PARTITION BY a.doc_id
                 ORDER BY abs(a.ar_bp - l.r), l.r) AS rn
        FROM ar a CROSS JOIN ladder l)
      SELECT CAST(r AS BIGINT) AS r_bp, CAST(tw AS BIGINT) AS tw,
             CAST(th AS BIGINT) AS th,
             CAST(count(*) AS BIGINT) AS n_images,
             CAST((count(*) + 31) // 32 AS BIGINT) AS n_batches,
             CAST(sum(dist) // count(*) AS BIGINT) AS avg_dist_bp,
             CAST(min(ar_bp) AS BIGINT) AS min_ar_bp,
             CAST(max(ar_bp) AS BIGINT) AS max_ar_bp
      FROM pick WHERE rn = 1
      GROUP BY r, tw, th
      ORDER BY r_bp"""))

  /** BASE64 wire codec — the text-safe transport every multimodal payload
    * crosses at an API boundary (data URIs, JSON-embedded images, HTTP
    * bodies): binary payloads round-trip through base64 text and back,
    * digest-compared against the original bytes so any corruption
    * hash-fails; the data-URI prefix is assembled and parsed back with
    * the modality routed from m9's magic-byte rule. Completes the wire-
    * codec family (Avro q258, proto q260, XML q90) with the one encoding
    * that is pure text. Row-local both ways — the codec rides the scan. */
  val m24 = GraftQuery(
    "m24_base64_codec",
    "Base64/data-URI round-trip of binary payloads: digest-compared, modality routed",
    (s, dir) => {
      val payloads = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          col("text").cast("binary").as("content"))
      payloads
        // Spark's base64 emits MIME-chunked output (76-char lines) for
        // long inputs; strip to the canonical unchunked form (what data
        // URIs require and what DuckDB emits) — unbase64 accepts both
        .withColumn("b64",
          regexp_replace(base64(col("content")), "[\\r\\n]", ""))
        .withColumn("uri", concat(lit("data:text/plain;base64,"), col("b64")))
        // parse back: split the prefix, decode, compare digests
        .withColumn("decoded", unbase64(expr("substring_index(uri, ',', -1)")))
        .withColumn("mime", expr("substring(substring_index(uri, ';', 1), 6)"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(when(col("decoded") === col("content"), true))
            .as("n_roundtrip_ok"),
          sum(length(col("b64")).cast("long")).as("b64_bytes"),
          sum(length(col("content")).cast("long")).as("raw_bytes"),
          max(col("mime")).as("mime"))
        .withColumn("overhead_bp", expr(
          "(b64_bytes - raw_bytes) * 10000 div raw_bytes"))
        .select("lang", "n", "n_roundtrip_ok", "raw_bytes", "b64_bytes",
          "overhead_bp", "mime")
        .orderBy("lang")
    },
    Some("""
      WITH p AS (
        SELECT doc_id, lang, encode(text) AS content,
               base64(encode(text)) AS b64
        FROM documents),
      r AS (SELECT lang, content, b64,
                   'data:text/plain;base64,' || b64 AS uri
            FROM p),
      d AS (SELECT lang, content, b64,
                   from_base64(string_split(uri, ',')[2]) AS decoded,
                   substring(string_split(uri, ';')[1], 6) AS mime
            FROM r)
      SELECT lang, count(*) AS n,
             count(CASE WHEN decoded = content THEN 1 END)
               AS n_roundtrip_ok,
             CAST(sum(octet_length(content)) AS BIGINT) AS raw_bytes,
             CAST(sum(length(b64)) AS BIGINT) AS b64_bytes,
             (CAST(sum(length(b64)) AS BIGINT)
               - CAST(sum(octet_length(content)) AS BIGINT)) * 10000
               // CAST(sum(octet_length(content)) AS BIGINT) AS overhead_bp,
             max(mime) AS mime
      FROM d
      GROUP BY lang
      ORDER BY lang"""))

  val all: Seq[GraftQuery] = Seq(m1, m2, m3, m4, m5, m6, m7, m8, m9, m10, m11,
    m12, m13, m14, m15, m16, m17, m18, m19, m20, m21, m22, m23, m24)
}
