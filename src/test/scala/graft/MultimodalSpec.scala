package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{MMRecord, Multimodal}

/** SURVEY.md §2.F specs: binary payload plumbing + stub decode. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("payload bytes round-trip: n_bytes = UTF-8 length of text") {
    val s = spark
    import s.implicits._
    val bad = Multimodal.withPayload(spark, sf)
      .filter($"meta.n_bytes" =!= length(encode($"text", "UTF-8")))
      .count()
    assert(bad == 0)
  }

  test("decode stub: deterministic, dimensions in range, frames by format") {
    val s = spark
    import s.implicits._
    val recs = Multimodal.withPayload(spark, sf)
      .select($"doc_id", $"fmt", $"payload", $"meta.magic".as("magic"))
      .as[MMRecord]
    val a = Multimodal.decodeStub(recs).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStub(recs).collect().sortBy(_.doc_id)
    assert(a.sameElements(b)) // deterministic across runs
    assert(a.forall(d => d.width >= 1 && d.width <= 509))
    assert(a.forall(d => d.height >= 1 && d.height <= 509))
    assert(a.filter(d => d.fmt == "png" || d.fmt == "jpg").forall(_.n_frames == 1))
    assert(a.forall(d => d.n_frames >= 1 && d.n_frames <= 16))
  }

  test("frame sampling: stills yield 1 frame, resize fits the 224 box") {
    val s = spark
    import s.implicits._
    val recs = Multimodal.withPayload(spark, sf)
      .select($"doc_id", $"fmt", $"payload", $"meta.magic".as("magic"))
      .as[MMRecord]
    val frames = Multimodal.frameSampleStub(Multimodal.decodeStub(recs)).collect()
    val stills = frames.filter(f => f.fmt == "png" || f.fmt == "jpg")
    assert(stills.groupBy(_.doc_id).forall(_._2.length == 1))
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
  }

  test("mm_audio: audio formats only, metadata-only scan, sane windowing") {
    val out = Multimodal.mmAudio(spark, sf)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(Seq("mp4", "wav")))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)            // n_docs
      assert(r.getLong(2) >= r.getLong(1)) // ≥ 1 window per doc here
      assert(r.getDouble(4) >= 8000.0 && r.getDouble(4) <= 16000.0)
    }
    // the payload bytes must never reach the plan — metadata-only path
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"),
      s"audio windowing must not deserialize payloads:\n$plan")
  }
}
