package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Dedup

/** Planted-span checks for the cross-document repeated-span detector:
  * the islands merge must report the exact maximal run, spans on
  * different diagonals must not fuse, and the occurrence cap must
  * drop boilerplate seeds. */
class DedupSpansSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("a planted 20-token shared run reports one maximal span") {
    val s = spark
    import s.implicits._
    val shared = words("q", 20)
    // doc 1 carries the quote at token 6, doc 2 at token 11 — all
    // surrounding filler is unique so only the quote seeds matches
    val d1 = (words("a", 5) ++ shared ++ words("b", 5)).mkString(" ")
    val d2 = (words("c", 10) ++ shared ++ words("d", 7)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val out = Dedup.dedupSpansOn(docs, Dedup.SpanOccCap).collect()
    assert(out.length == 1, out.mkString("; "))
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getLong(2) == 6L && r.getLong(3) == 11L, s"starts: $r")
    assert(r.getLong(4) == 20L, s"span length: $r")
  }

  test("a document past the 2^21-token packing limit fails loudly, not silently") {
    val s = spark
    import s.implicits._
    // pos would otherwise overflow into the doc_id bits of the packed
    // posting key and silently corrupt pair detection (round-6 advice)
    val huge = Array.fill((1 << 21) + 8)("w").mkString(" ")
    val docs = Seq((1L, huge), (2L, "w w w w w w w w w")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.dedupSpansOn(docs, Dedup.SpanOccCap).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("exceeds 2^21 tokens")),
      s"want the packing-limit error, got: ${messages(e).mkString(" | ")}")
  }

  test("two occurrences in one document yield two diagonals, not a fused run") {
    val s = spark
    import s.implicits._
    val quote = words("z", Dedup.SpanK) // exactly one seed long
    val d1 = (quote ++ words("x", 4) ++ quote).mkString(" ")
    val d2 = (words("y", 3) ++ quote).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val out = Dedup.dedupSpansOn(docs, Dedup.SpanOccCap)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // the quote sits at doc-1 positions 1 and 13, doc-2 position 4:
    // two separate spans of exactly SpanK tokens
    assert(out.toSet == Set((1L, 4L, Dedup.SpanK.toLong),
      (13L, 4L, Dedup.SpanK.toLong)), out.mkString("; "))
  }

  test("span_redact merges overlapping intervals on the dropped side") {
    val s = spark
    import s.implicits._
    val q = words("q", 20)
    val d1 = (words("a", 5) ++ q ++ words("b", 5)).mkString(" ")
    val d2 = (words("c", 10) ++ q ++ words("d", 7)).mkString(" ")
    val d3 = (words("x", 4) ++ q ++ words("y", 4)).mkString(" ")
    // d4 = q8..q20 then y1..y4: shares 13 tokens with d1/d2/d3 and a
    // LONGER 17-token run with d3 — two distinct overlapping intervals
    // that must merge to one
    val d4 = (q.drop(7) ++ words("y", 4)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
      .toDF("doc_id", "text")
    val out = Dedup.spanRedactOn(docs, Dedup.SpanOccCap)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 is lowest-id everywhere: never redacted
    assert(!out.contains(1L))
    assert(out(2L) == ((1L, 20L, 17L)), s"doc2: ${out.get(2L)}")
    assert(out(3L) == ((1L, 20L, 8L)), s"doc3: ${out.get(3L)}")
    // [1,13] (vs d1/d2) and [1,17] (vs d3) merge into one 17-token cut
    assert(out(4L) == ((1L, 17L, 0L)), s"doc4: ${out.get(4L)}")
  }

  test("seeds over the occurrence cap stop seeding spans") {
    val s = spark
    import s.implicits._
    val viral = words("v", Dedup.SpanK).mkString(" ")
    // the viral 8-gram appears in every doc; cap 3 < 4 occurrences
    val docs = (1L to 4L).map(i => (i, s"u${i}a u${i}b $viral u${i}c"))
      .toDF("doc_id", "text")
    // EVERY span dropped: the report must still surface the census — one
    // all-null span row carrying the dropped-seed count (round-9 ADVICE:
    // the silent-recall-thinning case is when the census matters most)
    val allDropped = Dedup.dedupSpansOn(docs, occCap = 3).collect()
    assert(allDropped.length == 1, allDropped.mkString("; "))
    assert(allDropped.head.isNullAt(0) && allDropped.head.isNullAt(4),
      s"span columns must be null in the census-only row: ${allDropped.head}")
    assert(allDropped.head.getLong(5) == 1L,
      s"the one viral seed gram must be censused: ${allDropped.head}")
    // and with a permissive cap the pairs all appear (4 choose 2)
    val permissive = Dedup.dedupSpansOn(docs, occCap = 64).collect()
    assert(permissive.length == 6)
    // the cap's recall trade is observable: under the permissive cap
    // nothing drops, under the biting cap the one viral seed gram is
    // counted in the (otherwise empty) report's census column
    assert(permissive.forall(_.getLong(5) == 0L),
      "permissive cap must census zero dropped seeds")
    // mixed corpus: the viral gram crosses cap 3 (dropped, censused)
    // while a 2-occurrence quote stays under it (reported) — the
    // surviving span row carries the exact dropped-seed count
    val quote = words("k", Dedup.SpanK).mkString(" ")
    val mixed = Seq(
      (1L, s"u1a $viral u1b $quote u1c"),
      (2L, s"u2a $viral u2b $quote u2c"),
      (3L, s"u3a $viral u3b"),
      (4L, s"u4a $viral u4b")).toDF("doc_id", "text")
    val rows = Dedup.dedupSpansOn(mixed, occCap = 3).collect()
    assert(rows.length == 1, rows.mkString("; "))
    assert((rows.head.getLong(0), rows.head.getLong(1)) == ((1L, 2L)))
    assert(rows.head.getLong(5) == 1L,
      s"exactly the one viral seed gram must be censused: ${rows.head}")
  }
}
