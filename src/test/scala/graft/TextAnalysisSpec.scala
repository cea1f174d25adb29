package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.{MarkerCounts, TextFeatures}

/** MarkerCounts must be a pure compute-route change: identical values
  * to the composed size/filter/split column forms it replaced (the
  * DuckDB oracles are written against those semantics). */
class TextAnalysisSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("MarkerCounts == composed size/filter forms on docs + edge cases") {
    val s = spark
    import s.implicits._
    val markers = Seq(Seq("the", "a", "of"), Seq("der", "die", "und"))
    val edge = Seq("", "   ", "the THE tHe", "a\t\na  of", "ünïcode the ü")
      .toDF("text")
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"text").limit(300).unionByName(edge)
    val ts = TextFeatures.toks(lower($"text"))
    def composedCount(words: Seq[String]) =
      size(filter(ts, t => words.map(w => t === lit(w)).reduce(_ || _)))
    val cmp = docs
      .withColumn("mc", MarkerCounts($"text", markers))
      .withColumn("want_total", size(ts).cast("long"))
      .withColumn("want_0", composedCount(markers(0)).cast("long"))
      .withColumn("want_1", composedCount(markers(1)).cast("long"))
      .filter($"mc"(0) =!= $"want_total" ||
        $"mc"(1) =!= $"want_0" || $"mc"(2) =!= $"want_1")
    assert(cmp.count() == 0, "marker counts must equal the composed forms")
  }

  test("repetition_score: hand-computed dup/top/entropy values") {
    val s = spark
    import s.implicits._
    // doc 1: "x x x x x" — 4 2-grams all identical (dup2 = 3/4), 3
    // 3-grams identical (dup3 = 2/3), one word (top = 1, entropy = 0)
    // doc 2: 6 distinct words — zero repetition, entropy = ln 6
    val docs = Seq(
      (1L, "A", "x x x x x"),
      (2L, "B", "a b c d e f")).toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.repetitionScoreOn(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getDouble(2) == 0.75, s"dup2: ${a.getDouble(2)}")       // avg_dup2
    assert(a.getDouble(3) == 0.6667, s"dup3: ${a.getDouble(3)}")     // avg_dup3
    assert(a.getDouble(4) == 1.0)                                    // avg_top_frac
    assert(a.getDouble(5) == 0.0)                                    // avg_entropy
    assert(a.getLong(6) == 1L, "the all-repeat doc must be flagged")
    val b = out("B")
    assert(b.getDouble(2) == 0.0 && b.getDouble(3) == 0.0)
    assert(b.getDouble(4) == 0.1667)
    assert(b.getDouble(5) == BigDecimal(math.log(6.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(b.getLong(6) == 0L)
  }

  test("gopher_rules: each rule trips in isolation on crafted docs") {
    val s = spark
    import s.implicits._
    // one doc per source, each engineered to fail exactly one rule
    // (the synthetic corpus can never trip symbol/alpha — this is the
    // only coverage of those trip points)
    val docs = Seq(
      ("keep", "the of " + Seq.fill(58)("word").mkString(" ")),
      ("short", "the of word"),                                  // 3 words < 50
      ("longwords", "the with " + Seq.fill(58)("abcdefghijklmno").mkString(" ")),
      ("symbols", "the of " + Seq.fill(50)("word").mkString(" ") +
        " " + Seq.fill(8)("#").mkString(" ")),                   // 8/60 > 0.1
      ("digits", "the of " + Seq.fill(40)("word").mkString(" ") +
        " " + Seq.fill(18)("123").mkString(" ")),                // alpha 42/60
      ("nostop", "the " + Seq.fill(59)("word").mkString(" ")),   // 1 stop < 2
      ("empty", "")                                              // multi-fail
    ).zipWithIndex.map { case ((src, t), i) => (i.toLong, src, t) }
      .toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.gopherRulesOn(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    def fails(src: String) =
      (2 to 6).map(out(src).getLong) // words, word_len, symbol, alpha, stopword
    assert(fails("keep") == Seq(0L, 0L, 0L, 0L, 0L))
    assert(out("keep").getLong(7) == 1L && out("keep").getDouble(8) == 1.0)
    assert(fails("short") == Seq(1L, 0L, 0L, 0L, 0L))
    assert(fails("longwords") == Seq(0L, 1L, 0L, 0L, 0L))
    assert(fails("symbols") == Seq(0L, 0L, 1L, 0L, 0L))
    assert(fails("digits") == Seq(0L, 0L, 0L, 1L, 0L))
    assert(fails("nostop") == Seq(0L, 0L, 0L, 0L, 1L))
    // zero tokens: word-count, word-length, alpha, and stop rules all
    // fail; the symbol ratio (0 > 0) must not
    assert(fails("empty") == Seq(1L, 1L, 0L, 1L, 1L))
    assert(out.values.map(_.getLong(7)).sum == 1L, "only 'keep' survives")
  }

  test("c4_rules: line and page rules trip in isolation on crafted docs") {
    val s = spark
    import s.implicits._
    val goodLine = "this line has at least five words."
    // one doc per source, each engineered around exactly one rule (the
    // newline-free synthetic corpus can never produce a kept line, so
    // this is the only coverage of the trip points)
    val docs = Seq(
      // 3 clean sentences on 3 lines -> everything kept
      ("keep", Seq(goodLine, goodLine, goodLine).mkString("\n")),
      // line without terminal punctuation is dropped; page still keeps 3
      ("nopunct", Seq(goodLine, "no terminal punctuation on this line",
        goodLine, goodLine).mkString("\n")),
      // 4-word line dropped even though it ends in '.'
      ("shortline", Seq(goodLine, "only four words here.",
        goodLine, goodLine).mkString("\n")),
      // javascript line dropped (case-insensitive)
      ("js", Seq(goodLine, "please enable JavaScript to continue viewing.",
        goodLine, goodLine).mkString("\n")),
      // two kept sentences < 3 -> page fails min-sentences
      ("twosent", Seq(goodLine, goodLine).mkString("\n")),
      // one kept line carrying three sentences still clears the bar
      ("onelinethree", "one sentence here now. two right after that! is " +
        "this the third one?"),
      ("lorem", Seq(goodLine, "standard Lorem Ipsum filler text goes here.",
        goodLine, goodLine).mkString("\n")),
      ("brace", Seq(goodLine, "function f() { return 1; } is code here.",
        goodLine, goodLine).mkString("\n")),
      ("empty", "")
    ).zipWithIndex.map { case ((src, t), i) => (i.toLong, src, t) }
      .toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.c4RulesOn(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    // columns: source, n_docs, n_lines, n_lines_kept, line_keep_rate,
    //          n_fail_sentences, n_fail_lorem, n_fail_brace, n_keep, keep_rate
    def lines(src: String) = (out(src).getLong(2), out(src).getLong(3))
    def fails(src: String) = (5 to 7).map(out(src).getLong)
    def kept(src: String) = out(src).getLong(8)
    assert(lines("keep") == (3L, 3L) && fails("keep") == Seq(0L, 0L, 0L)
      && kept("keep") == 1L && out("keep").getDouble(9) == 1.0)
    assert(lines("nopunct") == (4L, 3L) && kept("nopunct") == 1L)
    assert(lines("shortline") == (4L, 3L) && kept("shortline") == 1L)
    assert(lines("js") == (4L, 3L) && kept("js") == 1L)
    assert(lines("twosent") == (2L, 2L)
      && fails("twosent") == Seq(1L, 0L, 0L) && kept("twosent") == 0L)
    assert(lines("onelinethree") == (1L, 1L) && kept("onelinethree") == 1L,
      "three sentences on one kept line must clear the page bar")
    assert(fails("lorem") == Seq(0L, 1L, 0L) && kept("lorem") == 0L)
    assert(fails("brace") == Seq(0L, 0L, 1L) && kept("brace") == 0L)
    assert(lines("empty") == (0L, 0L)
      && fails("empty") == Seq(1L, 0L, 0L) && kept("empty") == 0L)
  }

  test("BPE train→apply: learned merges drive the greedy subword count") {
    val ta = graft.operators.TextAnalysis
    val sw = graft.functions.Subword
    import org.apache.spark.unsafe.types.UTF8String
    ta.clearBpeCache()
    val units = ta.learnedUnits(spark, "/root/testdata/sf0.001")
    assert(units.nonEmpty, "the trainer must learn merges")
    assert(units.forall(u => u.length >= 2 && !u.contains("~")),
      "apply units are multi-char and terminator-safe")
    // memoized: the trained table is computed once per (session, sf)
    assert(ta.trainBpe(spark, "/root/testdata/sf0.001")
      .eq(ta.trainBpe(spark, "/root/testdata/sf0.001")))
    val set = sw.closedSet(units)
    // a word that IS a learned unit greedy-counts as ONE token
    val u0 = units.maxBy(_.length)
    assert(sw.count(UTF8String.fromString(u0), set) == 1L, s"unit=$u0")
    // greedy equals an independent reference: longest-prefix-extension
    // simulated per word with a fresh scan
    def refCount(w: String): Long = {
      var i = 0; var n = 0L
      while (i < w.length) {
        var j = i + 1
        while (j < w.length && set.contains(w.substring(i, j + 1))) j += 1
        n += 1; i = j
      }
      n
    }
    val words = Seq("the", "shuffle", "windowing", "zq", "a", u0, u0 + "x")
    words.foreach { w =>
      assert(sw.count(UTF8String.fromString(w), set) == refCount(w), w)
    }
    // and the census consumes it: learned fertility is finite and ≥ 1
    val row = ta.tokFertilityLearned(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(row.getLong(3) >= row.getLong(2),
      "subword tokens can never undercut whitespace words")
  }

  test("winnowing: deque window minima == brute-force window minima") {
    // the monotone-deque selection must equal the definitional form:
    // distinct { min(hs[i..i+w-1 clipped]) : i in 0..max(m-w,0) }
    import org.apache.spark.unsafe.types.UTF8String
    val wh = graft.functions.WordNgramHashes
    val rnd = new scala.util.Random(42)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    for (len <- Seq(0, 1, 2, 3, 4, 5, 7, 16, 61); trial <- 1 to 5) {
      val text = Array.fill(len)(words(rnd.nextInt(words.length))).mkString(" ")
      val u = UTF8String.fromString(text)
      for (n <- Seq(1, 3); w <- Seq(1, 2, 4, 9)) {
        val hs = wh.compute(u, n, sortedDistinct = false)
          .toLongArray()
        val expected =
          if (hs.isEmpty) Set.empty[Long]
          else (0 to math.max(hs.length - w, 0))
            .map(i => hs.slice(i, math.min(i + w, hs.length)).min).toSet
        val got = wh.computeWinnowed(u, n, w).toLongArray()
        assert(got.toSet == expected, s"len=$len n=$n w=$w")
        assert(got.sameElements(got.sorted.distinct), "sorted distinct")
      }
    }
  }

  test("winnowing: locality guarantee, density bound, census counts shared copies") {
    val s = spark
    import s.implicits._
    val ta = graft.operators.TextAnalysis
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "A", s"unique one two three $shared four five six seven"),
      (2L, "A", s"other prefix words here $shared tail words differ nine"),
      (3L, "B", "completely different vocabulary with nothing in common at all")
    ).toDF("doc_id", "source", "text")
    val sel = ta.winnowSelected(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](2).toSet).toMap
    // SIGMOD'03: any shared run of >= w+n-1 tokens (here 10 >= 4+3-1=6)
    // must contribute at least one COMMON selected fingerprint
    assert(sel(1L).intersect(sel(2L)).nonEmpty,
      "docs sharing a 10-token run must share a fingerprint")
    assert(sel(1L).intersect(sel(3L)).isEmpty
      && sel(2L).intersect(sel(3L)).isEmpty,
      "no common grams -> no common fingerprints")
    // every doc selects at least one fingerprint and at most one per window
    val docs01 = Tables(spark, "/root/testdata/sf0.001", "documents")
    ta.winnowSelected(docs01).collect().foreach { r =>
      val n = r.getSeq[Long](2).size
      assert(n >= 1)
    }
    // census: the A-source shared fingerprints are counted as shared
    val census = ta.winnowFingerprintOn(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(census("A").getLong(4) >= 1L, "shared fingerprints must be censused")
    assert(census("B").getLong(4) == 0L)
  }

  test("pii_redact: injected PII is counted and scrubbed in pattern order") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "A", "contact john.doe@example.com or jane@sub.domain.org today"),
      (2L, "A", "server at 192.168.0.1 refused"),
      (3L, "B", "call +1 555 123 4567 now"),
      // an address with an IPv4-shaped local part is ONE email, no IP —
      // the ordered fold must not double-count the span
      (4L, "B", "mail 10.0.0.1@example.com please"),
      (5L, "B", "no pii here at all")).toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.piiRedactOn(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(1) == 2L && a.getLong(2) == 2L, "A: 2 docs, both with pii")
    assert(a.getLong(3) == 2L, s"A emails: ${a.getLong(3)}")
    assert(a.getLong(4) == 1L, s"A ips: ${a.getLong(4)}")
    val b = out("B")
    assert(b.getLong(2) == 2L, "B: exactly 2 of 3 docs carry pii")
    assert(b.getLong(3) == 1L, "the ip-shaped local part is ONE email")
    assert(b.getLong(4) == 0L, "…and no ip")
    assert(b.getLong(5) == 1L, s"B phones: ${b.getLong(5)}")
  }

  test("word_lift: pairs come from the capped vocab, support holds, lift exact") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = operators.TextAnalysis.wordLift(spark, sf).collect()
    assert(out.nonEmpty && out.length <= operators.TextAnalysis.LiftTopK)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be ordered w_a < w_b")
      assert(r.getLong(2) >= operators.TextAnalysis.LiftMinSupport)
      assert(r.getDouble(3) > 0.0)
    }
    // spot-check one pair's lift against hand counts
    val (wa, wb, cab, lift) = (out.head.getString(0), out.head.getString(1),
      out.head.getLong(2), out.head.getDouble(3))
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(
        graft.functions.TextFeatures.toks(lower(col("text")))).as("ws"))
    val n = docs.count()
    val dfa = docs.filter(array_contains(col("ws"), wa)).count()
    val dfb = docs.filter(array_contains(col("ws"), wb)).count()
    val both = docs.filter(array_contains(col("ws"), wa) &&
      array_contains(col("ws"), wb)).count()
    assert(both == cab)
    val want = BigDecimal(cab.toDouble * n / (dfa * dfb))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(lift - want) < 1e-9, s"lift $lift vs $want")
  }

  test("ngram_novelty: planted unique vs fully-duplicated documents") {
    val s = spark
    import s.implicits._
    // planted corpus (advisor, r4 — the promised scenario is now
    // actually exercised): doc 1 is globally unique → novelty 1.0;
    // doc 2 and its verbatim copy doc 3 share every gram → both 0.0;
    // doc 4 borrows doc 1's opening 3-gram, knocking exactly one of
    // doc 1's grams (and one of its own) off the unique list
    val planted = Seq(
      (1L, "a", "alpha beta gamma delta epsilon"),
      (2L, "a", "one two three four five"),
      (3L, "b", "one two three four five"),
      (4L, "b", "alpha beta gamma omega sigma"))
      .toDF("doc_id", "source", "text")
    val out = operators.TextAnalysis.ngramNoveltyOn(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((3L, 2L, 0.6667)), "one of 3 grams shared with doc 4")
    assert(out(2L) == ((3L, 0L, 0.0)), "verbatim-copied doc has no unique gram")
    assert(out(3L) == ((3L, 0L, 0.0)), "the copy drops to 0.0 too")
    assert(out(4L) == ((3L, 2L, 0.6667)))
    // fully-unique corpus boundary: a lone doc scores 1.0
    val lone = operators.TextAnalysis.ngramNoveltyOn(
      Seq((9L, "a", "p q r s t")).toDF("doc_id", "source", "text")).collect()
    assert(lone.head.getDouble(4) == 1.0)
    // corpus-level invariants on real data: rounding law, bounds, and
    // both regimes (shared boilerplate and unique grams) present
    val r = operators.TextAnalysis.ngramNovelty(s, "/root/testdata/sf0.001")
      .collect()
    r.foreach { row =>
      val (n, u, nov) = (row.getLong(2), row.getLong(3), row.getDouble(4))
      assert(n > 0 && u >= 0 && u <= n)
      assert(nov >= 0.0 && nov <= 1.0)
      assert(math.abs(nov - math.round(u.toDouble / n * 10000) / 10000.0) < 1e-9)
    }
    assert(r.exists(_.getLong(3) > 0))
    assert(r.exists(row => row.getLong(3) < row.getLong(2)))
  }

  test("quantile_bins: per-group bin counts balance and ranges tile") {
    val bins = operators.RelationalQueries
      .quantileBins(spark, "/root/testdata/sf0.001").collect()
    bins.groupBy(_.getString(0)).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 4))
      // ntile law: bin sizes differ by at most one, earlier bins larger
      val ns = sorted.map(_.getLong(2))
      assert(ns.max - ns.min <= 1)
      assert(ns.sameElements(ns.sortBy(-_)))
      // equi-depth ranges are ordered (boundary ties may make them touch)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(4) <= b.getDouble(3) ||
          a.getDouble(4) == b.getDouble(4))
        case _ =>
      }
    }
  }

  test("bpe_train: hand-computed merges, list-based run semantics") {
    val s = spark
    import s.implicits._
    // 'aaaa' ×3 pins the canonical list-based apply: round 1 learns
    // (a,a) (6 pairs/doc-word × 3 = 18 — overlapping zip counting),
    // and re-segmentation gives [aa, aa] so round 2 can learn
    // (aa, aa) cnt 3; the string-replace variant would leave
    // [aa, a, a] and learn (aa,a)/(a,a) instead
    val planted = Seq(
      (1L, "x", "aaaa aaaa aaaa lo lo lo lo"),
      (2L, "x", "lo low lower"))
      .toDF("doc_id", "source", "text")
    val out = operators.TextAnalysis.bpeTrainOn(planted).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // word counts: aaaa:3, lo:5, low:1, lower:1 → round-1 pairs:
    // (a,a):3·3=9, (l,o):5+1+1=7, (o,w):2, (w,e):1, (e,r):1
    assert(out(0) == ((1, "a", "a", "aa", 9L)))
    // after [aa,aa] resegmentation: (aa,aa):3 vs (l,o):7 → (l,o) wins
    assert(out(1) == ((2, "l", "o", "lo", 7L)))
    // then (aa,aa):3 beats (lo,w):2
    assert(out(2) == ((3, "aa", "aa", "aaaa", 3L)))
    assert(out(3) == ((4, "lo", "w", "low", 2L)))
    // deterministic under repartitioning (dict cut is a total order)
    val again = operators.TextAnalysis.bpeTrainOn(planted.repartition(7))
      .collect().map(r => r.getString(3))
    assert(again.toSeq == out.map(_._4).toSeq)
  }

  test("bpe_vocab: final segmentation reflects the learned merges") {
    val s = spark
    import s.implicits._
    val planted = Seq(
      (1L, "x", "aaaa aaaa aaaa lo lo lo lo"),
      (2L, "x", "lo low lower"))
      .toDF("doc_id", "source", "text")
    // same corpus as the trainer test: merges (a,a), (l,o), (aa,aa),
    // (lo,w) land within the 12 rounds, so the dictionary segments as
    val out = operators.TextAnalysis.bpeVocabOn(planted).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getLong(3))))
      .toMap
    assert(out("aaaa")._1 == "aaaa" && out("aaaa")._2 == 1)
    assert(out("lo") == (("lo", 1, 5L)))
    assert(out("low") == (("low", 1, 1L)))
    // 'lower': low + e + r unless (low,e)/(e,r) merges fire first —
    // with counts 1 they can; just assert prefix + token arithmetic
    assert(out("lower")._1.replace(" ", "") == "lower")
    assert(out("lower")._2 == out("lower")._1.count(_ == ' ') + 1)
  }

  test("tok_fertility: hand-computed greedy counts, invariants, empty source") {
    val s = spark
    import s.implicits._
    // "the" is one vocab unit; "theand" greedily splits the|and (thea
    // is not in the prefix-closed vocab) -> 3 subtokens over 2 words
    val out = operators.TextAnalysis.tokFertilityOn(
      Seq((1L, "A", "theand the"), (2L, "B", "the the the"), (3L, "C", "   "))
        .toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(2) == 2L && out("A").getLong(3) == 3L,
      s"A words/subtoks: ${out("A")}")
    assert(out("A").getDouble(5) == 1.5 && out("A").getDouble(6) == 3.3333,
      s"A ratios: ${out("A")}")
    assert(out("B").getDouble(5) == 1.0, s"all-vocab words are 1 unit: ${out("B")}")
    // whitespace-only doc: 0 words, 0 subtokens -> NULL ratios, row kept
    assert(out("C").getLong(1) == 1L && out("C").isNullAt(5) && out("C").isNullAt(6),
      s"C must survive with NULL ratios: ${out("C")}")
    // invariants on real data: every word is >= 1 unit, units are >= 1 char
    val real = operators.TextAnalysis.tokFertility(spark, "/root/testdata/sf0.001")
      .collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2), s"subtoks >= words: $r")
      assert(r.getLong(4) >= r.getLong(3), s"chars >= subtoks: $r")
    }
  }

  test("vocab_overlap: crafted pair lattice, zero-overlap pair kept, heaped rank") {
    val s = spark
    import s.implicits._
    // A = {the, and, of}, B = {the, and, xx}, C = {yy, zz} (K=128 ≫ all)
    val out = operators.TextAnalysis.vocabOverlapOn(
      Seq((1L, "A", "the and of"), (2L, "B", "the and xx"), (3L, "C", "yy zz"))
        .toDF("doc_id", "source", "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3, s"3 pairs for 3 sources: ${out.keys}")
    val ab = out(("A", "B"))
    assert(ab.getLong(2) == 3L && ab.getLong(3) == 3L && ab.getLong(4) == 2L, ab.toString)
    assert(ab.getDouble(5) == 0.5 && ab.getDouble(6) == 0.6667, ab.toString)
    val ac = out(("A", "C"))
    assert(ac.getLong(4) == 0L && ac.getDouble(5) == 0.0,
      s"disjoint pair must appear with 0 overlap: $ac")

    // the rank filter must compile to WindowGroupLimit (per-partition
    // K-heaps before the shuffle), not a full per-source sort. Assert
    // on the un-checkpointed subtree: localCheckpoint runs it eagerly,
    // so the registered query's final plan no longer shows it.
    val plan = operators.TextAnalysis.overlapTopK(
      graft.Tables(spark, "/root/testdata/sf0.001", "documents"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"vocab_overlap rank filter must heap, got:\n$plan")
  }

  test("lang_id and quality_score plans tokenize once") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("lang_id", "quality_score")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution
        .optimizedPlan.toString
      assert(!plan.contains("split("),
        s"$q must tokenize via marker_counts, not per-column split: found split( in plan")
    }
  }
}
