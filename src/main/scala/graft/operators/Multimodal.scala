package graft.operators

import java.nio.ByteBuffer
import java.nio.ByteOrder.{BIG_ENDIAN, LITTLE_ENDIAN}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A multimodal record: opaque payload bytes + typed metadata. */
final case class MMRecord(doc_id: Long, fmt: String, payload: Array[Byte],
    magic: String)

/** Decoded media features, parsed from the payload BYTES — see
  * [[Multimodal.decode]]. Stills carry (width, height) and one frame;
  * audio carries (sample_rate, n_samples) and zero dimensions; mp4
  * carries all of them. Decoded CONTENT travels as EXACT INTEGER
  * numerators (round-5 ADVICE: per-doc double means summed under
  * Spark's partial-agg order are not bit-deterministic against the
  * oracle's scan order, so aggregates fold the integers and divide
  * once): `pix_sum`/`pix_cnt` are the PNG inflated-scanline byte sum
  * and pixel count (0 where there are no decodable pixels), `sq_sum`
  * the WAV PCM sum of squared samples (0 for non-PCM formats). */
final case class MMDecoded(doc_id: Long, fmt: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int, sample_rate: Long,
    n_samples: Long, pix_sum: Long, pix_cnt: Long, sq_sum: Long,
    magic: String) {
  /** Per-doc derived content stats (exact fields are the agg surface). */
  def meanPixel: Double = if (pix_cnt > 0) pix_sum.toDouble / pix_cnt else 0.0
  def rms: Double =
    if (n_samples > 0) math.sqrt(sq_sum.toDouble / n_samples) else 0.0
}

/** A sampled, resize-targeted frame — see [[Multimodal.frameSampleStub]]. */
final case class MMFrame(doc_id: Long, fmt: String, frame_idx: Int,
    out_w: Int, out_h: Int)

/** SURVEY.md §2.F — multimodal column plumbing: image/audio/video
  * payloads as opaque `binary` columns with a typed metadata struct, and
  * a partition-parallel decode stage.
  *
  * The container has no media libraries and the test corpus has no real
  * media files, so INGEST is synthesized: [[withPayload]] builds each
  * payload as a REAL format structure — PNG is a complete file
  * (signature, IHDR with correct CRC32, a zlib IDAT holding real
  * grayscale scanlines, IEND) with the document text as a trailing
  * carrier body; WAV carries real 16-bit PCM in its data chunk; JPEG
  * is SOI/APP0/SOF0 marker segments + text body; MP4 is ftyp + a
  * custom box + text body — with dimensions / sample rate / sample
  * values derived deterministically from the body length. DECODE
  * ([[decode]]) is then real byte parsing AND real content decoding:
  * signature validation, marker scanning, chunk walking, big/little-
  * endian field extraction, CRC verification, zlib INFLATE of the
  * IDAT with per-scanline filter-byte checks and a pixel-mean fold,
  * and a PCM sum-of-squares RMS — corrupt a header OR content byte
  * and the parser throws (CRC / Adler-32 / length checks). What
  * remains a stand-in is JPEG/MP4 content (entropy-coded MCUs and
  * track atoms are out of scope) and the pixel math downstream
  * ([[frameSampleStub]]); a real deployment swaps the synthesized
  * ingest for actual files and adds pixel work to the same
  * partition-iterator contract.
  *
  * The PNG IDAT is written as zlib STORED blocks (2-byte zlib header,
  * 5-byte block headers chunked at 65535, Adler-32) — a fully valid
  * zlib stream `Inflater` decodes, chosen over compressed deflate
  * because its SIZE is a closed-form function of the raw scanline
  * length, which keeps `n_bytes` DuckDB-oracle-computable (a
  * compressed encoding's size exists only by running the compressor).
  *
  * Spark-side plumbing exercised (the part that matters at 100 TB):
  *   - `binary` column through scan/shuffle/agg (Tungsten treats it as
  *     opaque bytes; no row-size surprises),
  *   - typed metadata derived by codegen'd expressions (octet length,
  *     magic prefix, format tag) — prunable columns so a
  *     metadata-only query never deserializes payloads,
  *   - a typed `Dataset[MMRecord].mapPartitions` decode stage — the
  *     batch-per-partition shape you would hand to an image decoder
  *     (JNI / Arrow batch / Python worker).
  *
  * Every embedded field round-trips bytes → parse deterministically, so
  * the whole pipeline — including the parsed-from-bytes dimensions —
  * is DuckDB-oracle-checkable (the oracle recomputes the values the
  * ingest embedded; a parse bug breaks the hash match).
  */
object Multimodal {
  val Formats = Seq("png", "jpg", "wav", "mp4")

  // ------------------------------------------------- embedded parameters
  // The deterministic "content" parameters the synthesized ingest embeds
  // in the headers (and the DuckDB oracle recomputes); n = body length.
  private[graft] def widthOf(n: Long): Int = (1 + (31 * n) % 509).toInt
  private[graft] def heightOf(n: Long): Int = (1 + (131 * n) % 509).toInt
  private[graft] def framesOf(n: Long): Int = (1 + n % 16).toInt
  private[graft] def sampleRateOf(n: Long): Long = 8000L + (n % 3) * 4000L

  /** Synthesized fixed-header length per format (PNG's total overhead
    * additionally includes the IDAT/IEND structures — see
    * [[pngOverhead]]). */
  def headerLen(fmt: String): Int = fmt match {
    case "png" | "jpg" => 33
    case "wav" | "mp4" => 44
    case f => throw new IllegalArgumentException(s"unknown format $f")
  }

  /** PNG scanline bytes for a body of length `n`: `h` scanlines of
    * filter type 0 (None) + `w` constant grayscale pixels of value
    * `(n + y) % 256` — varying per scanline so the decoded mean is a
    * real fold over the inflated bytes, constant within a scanline so
    * the DuckDB oracle can recompute the mean with one `range(h)`
    * unnest instead of w×h rows. */
  private[graft] def pngRawLen(w: Int, h: Int): Int = h * (w + 1)
  private[graft] def pngScanlines(n: Long, w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](pngRawLen(w, h))
    var off = 0
    var y = 0
    while (y < h) {
      raw(off) = 0 // filter: None
      java.util.Arrays.fill(raw, off + 1, off + 1 + w, ((n + y) % 256).toByte)
      off += 1 + w
      y += 1
    }
    raw
  }

  /** Zlib stream of STORED deflate blocks around `raw` — hand-rolled so
    * the chunking (and therefore the stream SIZE, [[zlibStoredLen]]) is
    * deterministic: 0x78 0x01 zlib header, 5-byte stored-block headers
    * every ≤ 65535 bytes, big-endian Adler-32 trailer. `Inflater`
    * consumes it like any zlib data. */
  private[graft] def zlibStoredLen(rawLen: Int): Int =
    2 + 5 * ((rawLen + 65534) / 65535) + rawLen + 4
  private[graft] def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(zlibStoredLen(raw.length))
    out.put(0x78.toByte).put(0x01.toByte)
    var off = 0
    while (off < raw.length || off == 0) {
      val len = math.min(65535, raw.length - off)
      out.put(if (off + len >= raw.length) 1.toByte else 0.toByte) // BFINAL|BTYPE=00
      out.order(LITTLE_ENDIAN).putShort(len.toShort).putShort((~len).toShort)
      out.put(raw, off, len)
      off += len
      if (off >= raw.length) {
        val ad = new java.util.zip.Adler32
        ad.update(raw)
        out.order(BIG_ENDIAN).putInt(ad.getValue.toInt)
        return out.array()
      }
    }
    out.array() // unreachable (loop returns); keeps the compiler happy
  }

  /** A complete PNG chunk: length, type, data, CRC32(type ∥ data). */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + data.length).order(BIG_ENDIAN)
    bb.putInt(data.length).put(typ.getBytes(US_ASCII)).put(data)
    val crc = new CRC32
    crc.update(typ.getBytes(US_ASCII)); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Total PNG structure bytes beyond the body: signature 8 + IHDR
    * chunk 25 + IDAT chunk (12 + zlib) + IEND chunk 12. */
  private[graft] def pngOverhead(n: Long): Int =
    8 + 25 + 12 + zlibStoredLen(pngRawLen(widthOf(n), heightOf(n))) + 12

  /** WAV PCM sample `i` for a body of length `n`: a deterministic
    * full-range 16-bit pattern, `((n + i) % 256) * 257 − 32768`. */
  private[graft] def pcmSample(n: Long, i: Long): Int =
    (((n + i) % 256) * 257 - 32768).toInt

  // ------------------------------------------------------------ synthesis

  /** Build a payload: a REAL format structure with decodable content.
    * PNG: 8-byte signature + IHDR (correct CRC32, 8-bit grayscale) +
    * IDAT (zlib stored-block scanlines, correct CRC32 and Adler-32) +
    * IEND, then the text body as trailing carrier bytes.
    * JPEG: SOI + APP0 "JFIF" + SOF0 carrying (height, width) + body.
    * WAV: RIFF/WAVE + fmt (16-bit mono PCM, embedded sample rate) +
    * data chunk holding n REAL PCM samples ([[pcmSample]] — 2n bytes,
    * no text body; the PCM is the content). MP4: ftyp(isom) + a custom
    * `grft` box carrying (width, height, n_frames, sample_rate,
    * n_samples) as big-endian fields + body. */
  private[graft] def synthesize(fmt: String, text: String): Array[Byte] = {
    val body = text.getBytes(UTF_8)
    val n = body.length.toLong
    if (fmt == "png") {
      val (w, h) = (widthOf(n), heightOf(n))
      val bb = ByteBuffer.allocate(pngOverhead(n) + body.length).order(BIG_ENDIAN)
      bb.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte))
      val ihdr = ByteBuffer.allocate(13).order(BIG_ENDIAN)
      ihdr.putInt(w).putInt(h)
      ihdr.put(8.toByte)  // bit depth
      ihdr.put(0.toByte)  // color type: grayscale (1 byte/pixel scanlines)
      ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compr/filter/interlace
      bb.put(pngChunk("IHDR", ihdr.array()))
      bb.put(pngChunk("IDAT", zlibStored(pngScanlines(n, w, h))))
      bb.put(pngChunk("IEND", Array.emptyByteArray))
      bb.put(body)
      return bb.array()
    }
    if (fmt == "wav") {
      val bb = ByteBuffer.allocate(headerLen(fmt) + 2 * body.length)
        .order(LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(US_ASCII))
      bb.putInt(36 + 2 * body.length) // riff payload size
      bb.put("WAVE".getBytes(US_ASCII))
      bb.put("fmt ".getBytes(US_ASCII))
      bb.putInt(16)                     // fmt chunk size
      bb.putShort(1)                    // PCM
      bb.putShort(1)                    // mono
      val sr = sampleRateOf(n)
      bb.putInt(sr.toInt)
      bb.putInt(sr.toInt * 2)           // byte rate (16-bit mono)
      bb.putShort(2)                    // block align
      bb.putShort(16)                   // bits per sample
      bb.put("data".getBytes(US_ASCII))
      bb.putInt(2 * body.length)        // data chunk size (n 16-bit samples)
      var i = 0L
      while (i < n) { bb.putShort(pcmSample(n, i).toShort); i += 1 }
      return bb.array()
    }
    val bb = ByteBuffer.allocate(headerLen(fmt) + body.length)
    fmt match {
      case "jpg" =>
        bb.order(BIG_ENDIAN)
        bb.put(0xFF.toByte).put(0xD8.toByte)              // SOI
        bb.put(0xFF.toByte).put(0xE0.toByte).putShort(16) // APP0, len 16
        bb.put("JFIF".getBytes(US_ASCII)).put(0.toByte)
        bb.put(1.toByte).put(1.toByte)                    // version 1.1
        bb.put(0.toByte)                                  // density units
        bb.putShort(1).putShort(1)                        // x/y density
        bb.put(0.toByte).put(0.toByte)                    // no thumbnail
        bb.put(0xFF.toByte).put(0xC0.toByte).putShort(11) // SOF0, len 11
        bb.put(8.toByte)                                  // precision
        bb.putShort(heightOf(n).toShort).putShort(widthOf(n).toShort)
        bb.put(1.toByte)                                  // 1 component
        bb.put(1.toByte).put(0x11.toByte).put(0.toByte)   // comp spec
      case "mp4" =>
        bb.order(BIG_ENDIAN)
        bb.putInt(16).put("ftyp".getBytes(US_ASCII))
        bb.put("isom".getBytes(US_ASCII)).putInt(0)
        bb.putInt(28).put("grft".getBytes(US_ASCII))
        bb.putInt(widthOf(n)).putInt(heightOf(n)).putInt(framesOf(n))
        bb.putInt(sampleRateOf(n).toInt).putInt((n * 2).toInt)
    }
    bb.put(body)
    bb.array()
  }

  /** Documents with payload bytes + typed metadata. Payload synthesis
    * runs in a typed map (it stands in for reading real media files at
    * ingest); the metadata struct is derived by codegen'd expressions
    * over the binary column, so metadata-only consumers stay
    * expression-only. */
  def withPayload(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = Tables(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val fmt = Formats((id % Formats.size).toInt)
        (id, fmt, synthesize(fmt, text))
      })
      .toDF("doc_id", "fmt", "payload")
    enc.withColumn("meta", struct(
      length($"payload").cast("long").as("n_bytes"),
      substring(hex($"payload"), 1, 8).as("magic"),
      $"fmt".as("format")))
  }

  // -------------------------------------------------------------- parsing

  private def be16(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 8) | (a(off + 1) & 0xFF)
  private def be32(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 24) | ((a(off + 1) & 0xFF) << 16) |
      ((a(off + 2) & 0xFF) << 8) | (a(off + 3) & 0xFF)
  private def le32(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8) |
      ((a(off + 2) & 0xFF) << 16) | ((a(off + 3) & 0xFF) << 24)
  private def ascii(a: Array[Byte], off: Int, len: Int): String =
    new String(a, off, len, US_ASCII)
  private def fail(r: MMRecord, why: String): Nothing =
    throw new IllegalArgumentException(
      s"doc ${r.doc_id} (${r.fmt}): malformed payload — $why")

  /** Parse ONE record's payload bytes — real signature / marker /
    * chunk / box parsing (see the object scaladoc). Package-visible so
    * the spec can exercise malformed-input failure directly. */
  private[graft] def parse(r: MMRecord): MMDecoded = {
    val a = r.payload
    val n = a.length.toLong
    r.fmt match {
      case "png" =>
        val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        if (!(0 until 8).forall(i => (a(i) & 0xFF) == sig(i)))
          fail(r, "bad PNG signature")
        if (ascii(a, 12, 4) != "IHDR") fail(r, "first chunk is not IHDR")
        val crc = new CRC32
        crc.update(a, 12, 4 + be32(a, 8)) // chunk type + data
        if (crc.getValue.toInt != be32(a, 29)) fail(r, "IHDR CRC mismatch")
        val (w, h) = (be32(a, 16), be32(a, 20))
        // chunk walk to IDAT: verify its CRC, INFLATE the zlib stream
        // (real zlib decode — a corrupt byte fails the Adler/CRC), then
        // fold the scanlines: filter byte 0 + w grayscale pixels each
        var off = 8 + 12 + be32(a, 8) // past IHDR
        var pixSum = -1L
        while (pixSum < 0) {
          if (off + 8 > a.length) fail(r, "no IDAT chunk found")
          val len = be32(a, off)
          ascii(a, off + 4, 4) match {
            case "IDAT" =>
              val c = new CRC32
              c.update(a, off + 4, 4 + len)
              if (c.getValue.toInt != be32(a, off + 8 + len))
                fail(r, "IDAT CRC mismatch")
              val inf = new java.util.zip.Inflater
              inf.setInput(a, off + 8, len)
              val raw = new Array[Byte](pngRawLen(w, h))
              val got = try inf.inflate(raw)
                catch { case e: java.util.zip.DataFormatException =>
                  fail(r, s"IDAT zlib: ${e.getMessage}") }
              if (got != raw.length || !inf.finished())
                fail(r, s"IDAT inflated to $got, want ${raw.length}")
              inf.end()
              var sum = 0L
              var p = 0
              while (p < raw.length) {
                if (raw(p) != 0) fail(r, s"unsupported filter ${raw(p)}")
                var x = p + 1
                val end = p + 1 + w
                while (x < end) { sum += raw(x) & 0xFF; x += 1 }
                p = end
              }
              pixSum = sum
            case "IEND" => fail(r, "IEND before any IDAT")
            case _ => off += 12 + len
          }
        }
        MMDecoded(r.doc_id, r.fmt, n, w, h, 1, 0L, 0L,
          pixSum, w.toLong * h, 0L, r.magic)
      case "jpg" =>
        if ((a(0) & 0xFF) != 0xFF || (a(1) & 0xFF) != 0xD8)
          fail(r, "bad JPEG SOI")
        // marker scan: walk segments until SOF0
        var off = 2
        var out: MMDecoded = null
        while (out == null) {
          if (off + 4 > a.length) fail(r, "no SOF0 marker found")
          if ((a(off) & 0xFF) != 0xFF) fail(r, s"bad marker at $off")
          val marker = a(off + 1) & 0xFF
          val segLen = be16(a, off + 2)
          if (marker == 0xC0)
            out = MMDecoded(r.doc_id, r.fmt, n,
              be16(a, off + 7), be16(a, off + 5), 1, 0L, 0L, 0L, 0L, 0L,
              r.magic)
          else off += 2 + segLen
        }
        out
      case "wav" =>
        if (ascii(a, 0, 4) != "RIFF" || ascii(a, 8, 4) != "WAVE")
          fail(r, "bad RIFF/WAVE header")
        var off = 12
        var sr = -1L
        var dataSize = -1L
        var sumSq = 0L
        while ((sr < 0 || dataSize < 0) && off + 8 <= a.length) {
          val id = ascii(a, off, 4)
          val size = le32(a, off + 4).toLong
          // a size that runs past the payload means the walk has left
          // the chunk structure (or the field is corrupt) — fail loudly
          // instead of wandering through content bytes
          if (size < 0 || off + 8 + size > a.length)
            fail(r, s"chunk '$id' size $size runs past the payload")
          if (id == "fmt ") sr = le32(a, off + 12).toLong // +8 hdr, +4 fmt/ch
          if (id == "data") {
            dataSize = size
            // decode the PCM content: little-endian int16 samples,
            // exact integer sum of squares for the RMS
            var p = off + 8
            val end = off + 8 + size.toInt
            while (p + 1 < end) {
              val s = ((a(p) & 0xFF) | (a(p + 1) << 8)).toShort.toLong
              sumSq += s * s
              p += 2
            }
          }
          off += 8 + (if (id == "data") 0 else size.toInt)
        }
        if (sr < 0 || dataSize < 0) fail(r, "missing fmt /data chunk")
        val nSamples = dataSize / 2
        MMDecoded(r.doc_id, r.fmt, n, 0, 0, framesOf(nSamples), sr,
          nSamples, 0L, 0L, sumSq, r.magic)
      case "mp4" =>
        if (ascii(a, 4, 4) != "ftyp") fail(r, "first box is not ftyp")
        var off = be32(a, 0)
        var out: MMDecoded = null
        while (out == null && off + 8 <= a.length) {
          if (ascii(a, off + 4, 4) == "grft")
            out = MMDecoded(r.doc_id, r.fmt, n,
              be32(a, off + 8), be32(a, off + 12), be32(a, off + 16),
              be32(a, off + 20).toLong, be32(a, off + 24).toLong, 0L, 0L, 0L,
              r.magic)
          else off += be32(a, off)
        }
        if (out == null) fail(r, "no grft box found")
        out
      case f => fail(r, s"unknown format $f")
    }
  }

  /** Partition-parallel decode: one decoder context per partition,
    * streaming over records — the batch shape you would hand a JNI /
    * Arrow / Python decoder. The parsing is real byte work ([[parse]]);
    * only the content downstream of the header is synthetic. */
  def decode(records: Dataset[MMRecord]): Dataset[MMDecoded] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder init would go here (expensive handle reuse)
      it.map(parse)
    }
  }

  val ResizeBox = 224
  val FrameStep = 3

  /** STUB resize + frame-sample stage downstream of [[decode]]: keep
    * every [[FrameStep]]-th frame of each VISUAL record (audio has no
    * frames to resize), and compute the aspect-preserving fit of each
    * frame into a [[ResizeBox]]² target (integer math — the numbers a
    * real resizer would be handed). The flatMap row-expansion shape is
    * the production plumbing; the arithmetic stands in for pixel
    * work. */
  def frameSampleStub(decoded: Dataset[MMDecoded]): Dataset[MMFrame] = {
    import decoded.sparkSession.implicits._
    decoded.flatMap { d =>
      if (d.width <= 0 || d.height <= 0) Seq.empty[MMFrame]
      else {
        val (ow, oh) =
          if (d.width >= d.height)
            (ResizeBox, math.max(1, d.height * ResizeBox / d.width))
          else
            (math.max(1, d.width * ResizeBox / d.height), ResizeBox)
        (0 until d.n_frames by FrameStep).map(fi =>
          MMFrame(d.doc_id, d.fmt, fi, ow, oh))
      }
    }
  }

  /** The typed record stream every mm query decodes from. */
  private def records(s: SparkSession, dir: String): Dataset[MMRecord] = {
    import s.implicits._
    withPayload(s, dir)
      .select($"doc_id", $"fmt", $"payload", $"meta.magic".as("magic"))
      .as[MMRecord]
  }

  // the oracle-side CASE mapping doc_id to its format tag
  private def fmtCase: String = Formats.zipWithIndex
    .map { case (f, i) => s"WHEN $i THEN '$f'" }.mkString(" ")
  // the oracle-side per-format constants: header length and magic (the
  // first 8 hex chars of each synthesized header — PNG signature, JPEG
  // SOI+APP0, RIFF tag, ftyp box size)
  private val headerLenSql =
    "CASE WHEN fmt IN ('png', 'jpg') THEN 33 ELSE 44 END"
  private val magicSql =
    """CASE fmt WHEN 'png' THEN '89504E47' WHEN 'jpg' THEN 'FFD8FFE0'
      |      WHEN 'wav' THEN '52494646' ELSE '00000010' END""".stripMargin

  /** Per-format stats of the sampled+resized frame stream (visual
    * formats only — audio records expand to zero frames). */
  def mmFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    frameSampleStub(decode(records(s, dir))).toDF()
      .groupBy($"fmt")
      .agg(
        count(lit(1)).as("n_frames"),
        count_distinct($"doc_id").as("n_docs"),
        round(avg($"out_w"), 4).as("avg_out_w"),
        round(avg($"out_h"), 4).as("avg_out_h"),
        max($"frame_idx").as("max_frame_idx"))
      .orderBy($"fmt")
  }

  val mmFramesSql: String =
    s"""WITH rec AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % ${Formats.size} AS INT) $fmtCase END AS fmt,
       |    octet_length(encode(text)) AS n
       |  FROM documents),
       |dec AS (
       |  SELECT doc_id, fmt,
       |    CAST(1 + (31 * n % 509) AS INT) AS width,
       |    CAST(1 + (131 * n % 509) AS INT) AS height,
       |    CASE WHEN fmt = 'mp4' THEN CAST(1 + n % 16 AS INT) ELSE 1 END
       |      AS n_frames
       |  FROM rec WHERE fmt IN ('png', 'jpg', 'mp4')),
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

  /** Per-format corpus stats over metadata + PARSED dimensions AND
    * decoded CONTENT: every width/height/frame-count came out of the
    * payload bytes, `avg_mean_pixel` out of the inflated PNG
    * scanlines, and the oracle recomputes what the ingest embedded — a
    * parse (or inflate) bug is a hash mismatch. `avg_mean_pixel` is the
    * PIXEL-WEIGHTED corpus mean (Σ pix_sum / Σ pix_cnt): both sums are
    * exact BIGINTs, so the aggregate is order-independent by
    * construction and the 4-decimal gate cannot flip on Spark-vs-DuckDB
    * summation order (round-5 ADVICE — a sum of per-doc double means
    * was not). */
  def mmMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decode(records(s, dir)).toDF()
      .groupBy($"fmt")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("sum_bytes"),
        round(avg($"width"), 4).as("avg_width"),
        round(avg($"height"), 4).as("avg_height"),
        sum($"n_frames").as("sum_frames"),
        round(when(sum($"pix_cnt") > 0,
          sum($"pix_sum").cast("double") / sum($"pix_cnt"))
          .otherwise(lit(0.0)), 4).as("avg_mean_pixel"),
        count_distinct($"magic").as("n_magics"))
      .orderBy($"fmt")
  }

  val mmMetaSql: String =
    s"""WITH rec AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % ${Formats.size} AS INT) $fmtCase END AS fmt,
       |    octet_length(encode(text)) AS n
       |  FROM documents),
       |dims AS (
       |  SELECT doc_id, fmt, n,
       |    CAST(1 + (31 * n % 509) AS INT) AS w,
       |    CAST(1 + (131 * n % 509) AS INT) AS h
       |  FROM rec),
       |-- PNG structure size: sig 8 + IHDR 25 + IDAT (12 + zlib stored
       |-- stream of h*(w+1) raw bytes) + IEND 12, then the carrier body
       |png_bytes AS (
       |  SELECT doc_id,
       |    57 + (2 + 5 * ((h * (w + 1) + 65534) // 65535) + h * (w + 1) + 4)
       |      + n AS n_bytes
       |  FROM dims WHERE fmt = 'png'),
       |-- PNG content: scanline y is w pixels of (n + y) % 256, so the
       |-- exact byte sum folds over range(h) scaled by w — integer
       |-- numerators, one double division in the final select
       |png_px AS (
       |  SELECT doc_id, CAST(w AS BIGINT) * sum((n + y.r) % 256) AS pix_sum,
       |    CAST(w AS BIGINT) * h AS pix_cnt
       |  FROM (SELECT doc_id, n, w, h, unnest(range(h)) AS r FROM dims
       |        WHERE fmt = 'png') y
       |  GROUP BY doc_id, w, h),
       |dec AS (
       |  SELECT d.doc_id, d.fmt,
       |    CASE d.fmt
       |      WHEN 'png' THEN (SELECT n_bytes FROM png_bytes p
       |                       WHERE p.doc_id = d.doc_id)
       |      WHEN 'wav' THEN 44 + 2 * n
       |      ELSE n + $headerLenSql END AS n_bytes,
       |    CASE WHEN d.fmt = 'wav' THEN 0 ELSE w END AS width,
       |    CASE WHEN d.fmt = 'wav' THEN 0 ELSE h END AS height,
       |    CASE WHEN d.fmt IN ('wav', 'mp4')
       |      THEN CAST(1 + n % 16 AS INT) ELSE 1 END AS n_frames,
       |    CASE WHEN d.fmt = 'png' THEN coalesce(
       |      (SELECT pix_sum FROM png_px p WHERE p.doc_id = d.doc_id), 0)
       |      ELSE 0 END AS pix_sum,
       |    CASE WHEN d.fmt = 'png' THEN coalesce(
       |      (SELECT pix_cnt FROM png_px p WHERE p.doc_id = d.doc_id), 0)
       |      ELSE 0 END AS pix_cnt,
       |    $magicSql AS magic
       |  FROM dims d)
       |SELECT fmt, count(*) AS n_docs,
       |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
       |  round(avg(width), 4) AS avg_width,
       |  round(avg(height), 4) AS avg_height,
       |  CAST(sum(n_frames) AS BIGINT) AS sum_frames,
       |  round(CASE WHEN sum(pix_cnt) > 0
       |    THEN CAST(sum(pix_sum) AS DOUBLE) / CAST(sum(pix_cnt) AS DOUBLE)
       |    ELSE 0 END, 4) AS avg_mean_pixel,
       |  count(DISTINCT magic) AS n_magics
       |FROM dec GROUP BY fmt ORDER BY fmt""".stripMargin

  /** Audio feature-framing window: 25 ms. */
  val AudioWinDiv = 40   // win = sample_rate / 40
  /** Hop: 10 ms. */
  val AudioHopDiv = 100  // hop = sample_rate / 100

  /** Audio feature-extraction framing — the ASR/audio-embedding
    * front-end's windowing math (25 ms windows, 10 ms hop) over the
    * audio-format payloads — plus decoded CONTENT: `avg_rms` is the
    * root-mean-square of the REAL 16-bit PCM parsed out of the WAV
    * data chunk (0 for mp4, whose payload carries no PCM). Sample rate
    * and sample count are PARSED from the container bytes (WAV
    * fmt/data chunks, the mp4 box) by [[decode]]; the windowing
    * arithmetic then runs as integer expressions. The oracle
    * recomputes the embedded values — a header-parse OR sample-decode
    * bug breaks the hash match. */
  def mmAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decode(records(s, dir)).toDF()
      .filter($"fmt".isin("wav", "mp4"))
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
        round(avg($"sample_rate"), 4).as("avg_sample_rate"),
        // corpus-level RMS from exact integer numerators (Σ s² / Σ n),
        // one double division + sqrt — order-independent, unlike a mean
        // of per-doc double RMS values (round-5 ADVICE)
        round(when(sum($"n_samples") > 0,
          sqrt(sum($"sq_sum").cast("double") / sum($"n_samples")))
          .otherwise(lit(0.0)), 4).as("avg_rms"))
      .orderBy($"fmt")
  }

  val mmAudioSql: String =
    s"""WITH rec AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % ${Formats.size} AS INT) $fmtCase END AS fmt,
       |    octet_length(encode(text)) AS n
       |  FROM documents),
       |audio AS (
       |  SELECT doc_id, fmt, n,
       |    8000 + (n % 3) * 4000 AS sample_rate,
       |    CASE WHEN fmt = 'wav' THEN n ELSE n * 2 END AS n_samples
       |  FROM rec WHERE fmt IN ('wav', 'mp4')),
       |-- WAV PCM content: sample i = ((n + i) % 256) * 257 - 32768;
       |-- exact BIGINT sum of squares per doc — the corpus RMS is one
       |-- double division + sqrt over the exact sums in the final
       |-- select, order-independent on both engines (round-5 ADVICE)
       |pcm AS (
       |  SELECT doc_id, sum(s * s) AS sq_sum
       |  FROM (SELECT doc_id, ((n + i.r) % 256) * 257 - 32768 AS s
       |        FROM (SELECT doc_id, n, unnest(range(n)) AS r
       |              FROM audio WHERE fmt = 'wav') i)
       |  GROUP BY doc_id),
       |w AS (
       |  SELECT a.fmt, a.sample_rate, a.n_samples,
       |    CASE WHEN a.n_samples >= a.sample_rate // $AudioWinDiv
       |      THEN (a.n_samples - a.sample_rate // $AudioWinDiv)
       |        // (a.sample_rate // $AudioHopDiv) + 1
       |      ELSE 0 END AS n_windows,
       |    CASE WHEN a.fmt = 'wav' THEN coalesce(
       |      (SELECT sq_sum FROM pcm p WHERE p.doc_id = a.doc_id), 0)
       |      ELSE 0 END AS sq_sum
       |  FROM audio a)
       |SELECT fmt, count(*) AS n_docs,
       |  CAST(sum(n_windows) AS BIGINT) AS sum_windows,
       |  round(avg(n_windows), 4) AS avg_windows,
       |  round(avg(sample_rate), 4) AS avg_sample_rate,
       |  round(CASE WHEN sum(n_samples) > 0
       |    THEN sqrt(CAST(sum(sq_sum) AS DOUBLE) / CAST(sum(n_samples) AS DOUBLE))
       |    ELSE 0 END, 4) AS avg_rms
       |FROM w GROUP BY fmt ORDER BY fmt""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta(_, _)),
    "mm_audio" -> (mmAudio(_, _)),
    "mm_frames" -> (mmFrames(_, _)))

  def oracles: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_audio" -> mmAudioSql,
    "mm_frames" -> mmFramesSql)
}
