package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{MMRecord, Multimodal}

/** SURVEY.md §2.F specs: binary payload plumbing + real header
  * synthesis/parsing round-trip. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def recs = {
    val s = spark
    import s.implicits._
    Multimodal.withPayload(spark, sf)
      .select($"doc_id", $"fmt", $"payload", $"meta.magic".as("magic"))
      .as[MMRecord]
  }

  test("payload sizes: real structures account for every byte") {
    val s = spark
    import s.implicits._
    val pngOverhead = udf((n: Long) => Multimodal.pngOverhead(n).toLong)
    val bad = Multimodal.withPayload(spark, sf)
      .join(Tables(spark, sf, "documents").select($"doc_id", $"text"), "doc_id")
      .withColumn("n", length(encode($"text", "UTF-8")).cast("long"))
      .filter($"meta.n_bytes" =!=
        when($"fmt" === "png", pngOverhead($"n") + $"n")      // full PNG + body
          .when($"fmt" === "wav", lit(44) + $"n" * 2)         // header + PCM
          .when($"fmt" === "jpg", lit(33) + $"n")
          .otherwise(lit(44) + $"n"))
      .count()
    assert(bad == 0)
  }

  test("decode parses back exactly what the ingest embedded, from bytes") {
    val decoded = Multimodal.decode(recs).collect().sortBy(_.doc_id)
    val texts = Tables(spark, sf, "documents")
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      val n = texts(d.doc_id)
      d.fmt match {
        case "png" | "jpg" =>
          assert(d.width == Multimodal.widthOf(n), s"doc ${d.doc_id} width")
          assert(d.height == Multimodal.heightOf(n), s"doc ${d.doc_id} height")
          assert(d.n_frames == 1 && d.sample_rate == 0L)
          if (d.fmt == "png") {
            // content check: the inflated scanline byte sum must equal
            // the analytic sum of the (n + y) % 256 pattern — EXACT
            // integer equality (the numerators are the agg surface)
            val wantSum = d.width.toLong *
              (0 until d.height).map(y => (n + y) % 256).sum
            assert(d.pix_sum == wantSum,
              s"doc ${d.doc_id} pix_sum ${d.pix_sum} != $wantSum")
            assert(d.pix_cnt == d.width.toLong * d.height)
          } else assert(d.pix_sum == 0L && d.pix_cnt == 0L)
        case "wav" =>
          assert(d.width == 0 && d.height == 0)
          assert(d.sample_rate == Multimodal.sampleRateOf(n), s"doc ${d.doc_id} sr")
          assert(d.n_samples == n, "one PCM sample per body byte")
          assert(d.n_frames == Multimodal.framesOf(n))
          // content check: decoded sum-of-squares == analytic, EXACTLY
          if (n > 0) {
            val sumSq = (0L until n).map { i =>
              val s = Multimodal.pcmSample(n, i).toLong; s * s
            }.sum
            assert(d.sq_sum == sumSq,
              s"doc ${d.doc_id} sq_sum ${d.sq_sum} != $sumSq")
          }
        case "mp4" =>
          assert(d.width == Multimodal.widthOf(n) &&
            d.height == Multimodal.heightOf(n))
          assert(d.sample_rate == Multimodal.sampleRateOf(n))
          assert(d.n_samples == n * 2)
          assert(d.n_frames == Multimodal.framesOf(n))
      }
    }
    // deterministic across runs
    val again = Multimodal.decode(recs).collect().sortBy(_.doc_id)
    assert(decoded.sameElements(again))
  }

  test("parsing is real: corrupting header bytes makes decode throw") {
    // PNG with a flipped IHDR byte → CRC mismatch
    val png = Multimodal.synthesize("png", "hello png world")
    png(17) = (png(17) ^ 0x01).toByte // high byte of width, CRC now stale
    intercept[IllegalArgumentException] {
      Multimodal.parse(MMRecord(1L, "png", png, "89504E47"))
    }
    // WAV with a damaged chunk id → missing fmt chunk
    val wav = Multimodal.synthesize("wav", "hello wav world")
    wav(12) = 'X'.toByte // "fmt " → "Xmt "
    intercept[IllegalArgumentException] {
      Multimodal.parse(MMRecord(2L, "wav", wav, "52494646"))
    }
    // JPEG missing its SOF0 → marker scan must fail loudly
    val jpg = Multimodal.synthesize("jpg", "hello jpg world")
    jpg(21) = 0xC1.toByte // SOF0 marker byte → SOF1
    intercept[IllegalArgumentException] {
      Multimodal.parse(MMRecord(3L, "jpg", jpg, "FFD8FFE0"))
    }
    // PNG with a flipped CONTENT byte inside the IDAT zlib stream →
    // IDAT CRC mismatch (content decode is verified, not just headers)
    val png2 = Multimodal.synthesize("png", "hello png world")
    png2(33 + 8 + 10) = (png2(33 + 8 + 10) ^ 0x01).toByte
    intercept[IllegalArgumentException] {
      Multimodal.parse(MMRecord(5L, "png", png2, "89504E47"))
    }
    // and the uncorrupted forms all parse
    Seq("png", "jpg", "wav", "mp4").foreach { f =>
      Multimodal.parse(MMRecord(4L, f, Multimodal.synthesize(f, "ok"), ""))
    }
  }

  test("frame sampling: stills yield 1 frame, audio none, resize fits the box") {
    val frames = Multimodal.frameSampleStub(Multimodal.decode(recs)).collect()
    val stills = frames.filter(f => f.fmt == "png" || f.fmt == "jpg")
    assert(stills.groupBy(_.doc_id).forall(_._2.length == 1))
    assert(frames.forall(_.fmt != "wav"), "audio records expand to no frames")
    assert(frames.exists(_.fmt == "mp4"))
    assert(frames.forall(f => f.out_w <= Multimodal.ResizeBox &&
      f.out_h <= Multimodal.ResizeBox))
    assert(frames.forall(f => f.out_w == Multimodal.ResizeBox ||
      f.out_h == Multimodal.ResizeBox)) // aspect fit touches the box
    assert(frames.forall(_.frame_idx % Multimodal.FrameStep == 0))
  }

  test("mm_meta covers every format with all docs accounted for") {
    val docs = Tables(spark, sf, "documents").count()
    val out = Multimodal.mmMeta(spark, sf).collect()
    assert(out.map(_.getString(0)).sorted.sameElements(Multimodal.Formats.sorted))
    assert(out.map(_.getLong(1)).sum == docs)
    // one real magic constant per format now that headers are real
    assert(out.forall(_.getLong(7) == 1L))
    // decoded pixel content: png's mean sits inside the byte range,
    // formats without decodable pixels report 0
    val meanByFmt = out.map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(meanByFmt("png") > 0.0 && meanByFmt("png") < 255.0)
    assert(meanByFmt("jpg") == 0.0 && meanByFmt("wav") == 0.0 &&
      meanByFmt("mp4") == 0.0)
  }

  test("mm_audio: audio formats only, parsed sample rates, sane windowing") {
    val rows = Multimodal.mmAudio(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(Seq("mp4", "wav")))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)  // n_docs
      assert(r.getLong(2) >= 0) // sum_windows (a doc shorter than one
                                // 25 ms window honestly yields zero)
      assert(r.getDouble(4) >= 8000.0 && r.getDouble(4) <= 16000.0)
    }
    assert(rows.map(_.getLong(2)).sum > 0, "some doc must produce windows")
    // decoded PCM content: wav's RMS is real (full-range 16-bit pattern
    // lands in the tens of thousands); mp4 carries no PCM
    val rmsByFmt = rows.map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(rmsByFmt("wav") > 1000.0 && rmsByFmt("wav") < 32768.0)
    assert(rmsByFmt("mp4") == 0.0)
  }
}
