package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A multimodal record: opaque payload bytes + typed metadata. */
final case class MMRecord(doc_id: Long, fmt: String, payload: Array[Byte],
    magic: String)

/** Fake "decoded" media features — see [[Multimodal.decodeStub]]. */
final case class MMDecoded(doc_id: Long, fmt: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int, magic: String)

/** A sampled, resize-targeted frame — see [[Multimodal.frameSampleStub]]. */
final case class MMFrame(doc_id: Long, fmt: String, frame_idx: Int,
    out_w: Int, out_h: Int)

/** SURVEY.md §2.F — multimodal column plumbing: image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct, and
  * a partition-parallel decode stage.
  *
  * The payload here is synthesized deterministically from `text` (UTF-8
  * bytes) because the container has no media libraries — what is REAL and
  * tested is the Spark-side plumbing a 100-TB media pipeline needs:
  *   - `binary` column through scan/shuffle/agg (Tungsten treats it as
  *     opaque bytes; no row-size surprises),
  *   - typed metadata derived by codegen'd expressions (octet length,
  *     magic prefix, format tag) — prunable columns so a
  *     metadata-only query never deserializes payloads,
  *   - a typed `Dataset[MMRecord].mapPartitions` decode stage — the
  *     batch-per-partition shape you would hand to an image decoder
  *     (JNI / Arrow batch / Python worker); the decoder body itself is a
  *     clearly-marked deterministic STUB.
  *
  * The decode math is pure arithmetic on the byte length, so the whole
  * pipeline — including the "decoded" dimensions — is DuckDB-oracle-
  * checkable.
  */
object Multimodal {
  val Formats = Seq("png", "jpg", "wav", "mp4")

  /** Documents with payload bytes + typed metadata. */
  def withPayload(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .withColumn("payload", encode($"text", "UTF-8"))
      .withColumn("fmt", element_at(
        typedlit(Formats), ($"doc_id" % Formats.size).cast("int") + 1))
      .withColumn("meta", struct(
        length($"payload").cast("long").as("n_bytes"),
        substring(hex($"payload"), 1, 8).as("magic"),
        $"fmt".as("format")))
  }

  /** STUB DECODER — the container has no image/audio libraries, so the
    * "decode" derives dimensions deterministically from the byte length:
    *
    *   width    = 1 + (31·n_bytes mod 509)
    *   height   = 1 + (131·n_bytes mod 509)
    *   n_frames = 1 (still) or 1 + n_bytes mod 16 (wav/mp4)
    *
    * A real deployment replaces ONLY this body (e.g. JNI to libjpeg /
    * ffmpeg probe); the partition-iterator shape — one decoder init per
    * partition, streaming over records — is the production contract. */
  def decodeStub(records: Dataset[MMRecord]): Dataset[MMDecoded] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder init would go here (expensive handle reuse)
      it.map { r =>
        val n = r.payload.length.toLong
        val frames =
          if (r.fmt == "wav" || r.fmt == "mp4") 1 + (n % 16).toInt else 1
        MMDecoded(r.doc_id, r.fmt, n,
          1 + (31 * n % 509).toInt, 1 + (131 * n % 509).toInt, frames,
          r.magic)
      }
    }
  }

  val ResizeBox = 224
  val FrameStep = 3

  /** STUB resize + frame-sample stage downstream of [[decodeStub]]: keep
    * every [[FrameStep]]-th frame, and compute the aspect-preserving fit
    * of each frame into a [[ResizeBox]]² target (integer math — the
    * numbers a real resizer would be handed). Same contract as
    * decodeStub: the flatMap row-expansion shape is the production
    * plumbing; only the arithmetic is a stand-in for pixel work. */
  def frameSampleStub(decoded: Dataset[MMDecoded]): Dataset[MMFrame] = {
    import decoded.sparkSession.implicits._
    decoded.flatMap { d =>
      val (ow, oh) =
        if (d.width >= d.height)
          (ResizeBox, math.max(1, d.height * ResizeBox / d.width))
        else
          (math.max(1, d.width * ResizeBox / d.height), ResizeBox)
      (0 until d.n_frames by FrameStep).map(fi =>
        MMFrame(d.doc_id, d.fmt, fi, ow, oh))
    }
  }

  /** Per-format stats of the sampled+resized frame stream. */
  def mmFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recs = withPayload(s, dir)
      .select($"doc_id", $"fmt", $"payload", $"meta.magic".as("magic"))
      .as[MMRecord]
    frameSampleStub(decodeStub(recs)).toDF()
      .groupBy($"fmt")
      .agg(
        count(lit(1)).as("n_frames"),
        count_distinct($"doc_id").as("n_docs"),
        round(avg($"out_w"), 4).as("avg_out_w"),
        round(avg($"out_h"), 4).as("avg_out_h"),
        max($"frame_idx").as("max_frame_idx"))
      .orderBy($"fmt")
  }

  val mmFramesSql: String = {
    val fmtCase = Formats.zipWithIndex
      .map { case (f, i) => s"WHEN $i THEN '$f'" }.mkString(" ")
    s"""WITH rec AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % ${Formats.size} AS INT) $fmtCase END AS fmt,
       |    octet_length(encode(text)) AS n_bytes
       |  FROM documents),
       |dec AS (
       |  SELECT doc_id, fmt,
       |    CAST(1 + (31 * n_bytes % 509) AS INT) AS width,
       |    CAST(1 + (131 * n_bytes % 509) AS INT) AS height,
       |    CASE WHEN fmt IN ('wav', 'mp4')
       |      THEN CAST(1 + n_bytes % 16 AS INT) ELSE 1 END AS n_frames
       |  FROM rec),
       |res AS (
       |  SELECT doc_id, fmt, n_frames,
       |    CASE WHEN width >= height THEN $ResizeBox
       |      ELSE greatest(1, width * $ResizeBox // height) END AS out_w,
       |    CASE WHEN width >= height
       |      THEN greatest(1, height * $ResizeBox // width)
       |      ELSE $ResizeBox END AS out_h
       |  FROM dec),
       |frames AS (
       |  SELECT doc_id, fmt, out_w, out_h,
       |    unnest(range(0, n_frames, $FrameStep)) AS frame_idx
       |  FROM res)
       |SELECT fmt, count(*) AS n_frames, count(DISTINCT doc_id) AS n_docs,
       |  round(avg(out_w), 4) AS avg_out_w,
       |  round(avg(out_h), 4) AS avg_out_h,
       |  max(frame_idx) AS max_frame_idx
       |FROM frames GROUP BY fmt ORDER BY fmt""".stripMargin
  }

  /** Per-format corpus stats over metadata + decoded dimensions. */
  def mmMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // magic rides in the typed record — ONE corpus scan, no re-join
    val recs = withPayload(s, dir)
      .select($"doc_id", $"fmt", $"payload", $"meta.magic".as("magic"))
      .as[MMRecord]
    decodeStub(recs).toDF()
      .groupBy($"fmt")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("sum_bytes"),
        round(avg($"width"), 4).as("avg_width"),
        round(avg($"height"), 4).as("avg_height"),
        sum($"n_frames").as("sum_frames"),
        count_distinct($"magic").as("n_magics"))
      .orderBy($"fmt")
  }

  val mmMetaSql: String = {
    val fmtCase = Formats.zipWithIndex
      .map { case (f, i) => s"WHEN $i THEN '$f'" }.mkString(" ")
    s"""WITH rec AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % ${Formats.size} AS INT) $fmtCase END AS fmt,
       |    octet_length(encode(text)) AS n_bytes,
       |    substring(hex(encode(text)), 1, 8) AS magic
       |  FROM documents),
       |dec AS (
       |  SELECT doc_id, fmt, n_bytes, magic,
       |    CAST(1 + (31 * n_bytes % 509) AS INT) AS width,
       |    CAST(1 + (131 * n_bytes % 509) AS INT) AS height,
       |    CASE WHEN fmt IN ('wav', 'mp4')
       |      THEN CAST(1 + n_bytes % 16 AS INT) ELSE 1 END AS n_frames
       |  FROM rec)
       |SELECT fmt, count(*) AS n_docs,
       |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
       |  round(avg(width), 4) AS avg_width,
       |  round(avg(height), 4) AS avg_height,
       |  CAST(sum(n_frames) AS BIGINT) AS sum_frames,
       |  count(DISTINCT magic) AS n_magics
       |FROM dec GROUP BY fmt ORDER BY fmt""".stripMargin
  }

  /** Audio feature-framing window: 25 ms. */
  val AudioWinDiv = 40   // win = sample_rate / 40
  /** Hop: 10 ms. */
  val AudioHopDiv = 100  // hop = sample_rate / 100

  /** Audio feature-extraction framing — the ASR/audio-embedding
    * front-end's windowing math (25 ms windows, 10 ms hop) over the
    * audio-format payloads. Sample rate and PCM length are STUB
    * arithmetic on the metadata (same contract as [[decodeStub]]: a
    * real probe replaces only those two lines), but the pipeline shape
    * is the point — this is a METADATA-ONLY plan: the payload column is
    * never deserialized, the scan prunes to (doc_id, n_bytes), and the
    * per-format window totals a feature-extraction scheduler needs come
    * from integer arithmetic inside whole-stage codegen. */
  def mmAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(s, dir)
      .filter($"fmt".isin("wav", "mp4"))
      .select($"doc_id", $"fmt", $"meta.n_bytes".as("n_bytes"))
      // STUB probe: a real decoder reads these from the container header
      .withColumn("sample_rate",
        (lit(8000L) + ($"n_bytes" % 3) * 4000L).cast("long"))
      .withColumn("n_samples", $"n_bytes" * 4)
      .withColumn("win", expr(s"sample_rate DIV $AudioWinDiv"))
      .withColumn("hop", expr(s"sample_rate DIV $AudioHopDiv"))
      .withColumn("n_windows",
        when($"n_samples" >= $"win",
          expr("(n_samples - win) DIV hop") + 1).otherwise(lit(0L)))
      .groupBy($"fmt")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_windows").as("sum_windows"),
        round(avg($"n_windows"), 4).as("avg_windows"),
        round(avg($"sample_rate"), 4).as("avg_sample_rate"))
      .orderBy($"fmt")
  }

  val mmAudioSql: String = {
    val fmtCase = Formats.zipWithIndex
      .map { case (f, i) => s"WHEN $i THEN '$f'" }.mkString(" ")
    s"""WITH rec AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % ${Formats.size} AS INT) $fmtCase END AS fmt,
       |    octet_length(encode(text)) AS n_bytes
       |  FROM documents),
       |audio AS (
       |  SELECT fmt, n_bytes,
       |    8000 + (n_bytes % 3) * 4000 AS sample_rate,
       |    n_bytes * 4 AS n_samples
       |  FROM rec WHERE fmt IN ('wav', 'mp4')),
       |w AS (
       |  SELECT fmt, sample_rate,
       |    CASE WHEN n_samples >= sample_rate // $AudioWinDiv
       |      THEN (n_samples - sample_rate // $AudioWinDiv)
       |        // (sample_rate // $AudioHopDiv) + 1
       |      ELSE 0 END AS n_windows
       |  FROM audio)
       |SELECT fmt, count(*) AS n_docs,
       |  CAST(sum(n_windows) AS BIGINT) AS sum_windows,
       |  round(avg(n_windows), 4) AS avg_windows,
       |  round(avg(sample_rate), 4) AS avg_sample_rate
       |FROM w GROUP BY fmt ORDER BY fmt""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta(_, _)),
    "mm_audio" -> (mmAudio(_, _)),
    "mm_frames" -> (mmFrames(_, _)))

  def oracles: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_audio" -> mmAudioSql,
    "mm_frames" -> mmFramesSql)
}
