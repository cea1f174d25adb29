package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.kmeans.Centroid

/** A point flowing through the streaming K-Means pipeline. */
final case class StreamPoint(pid: Long, x: Double, y: Double)

/** Running per-cluster state: sum of members and count. */
final case class ClusterState(sx: Double, sy: Double, n: Long)

/** An updated centroid emitted per trigger. */
final case class CentroidUpdate(cid: Int, x: Double, y: Double, n: Long)

/** SURVEY.md §2.A streaming surface — Structured Streaming twins of the
  * batch operators:
  *
  *   - [[windowedAgg]]: watermarked tumbling-window event aggregation.
  *     The IDENTICAL plan runs batch or streaming (the `queries` entry
  *     `stream_window_agg` is the batch run, oracle-checked; the
  *     streaming run is exercised in StreamingSpec with a MemoryStream).
  *   - [[streamingKMeans]]: incremental centroid maintenance — points
  *     are keyed by nearest initial centroid (broadcast, codegen'd
  *     distance argmin, same map phase as batch [[graft.kmeans.KMeans]]),
  *     and `mapGroupsWithState` keeps a running (sum, count) per cluster,
  *     emitting the running-mean centroid each trigger. After all data is
  *     seen, the state equals one batch Lloyd step over the whole input —
  *     which is what the oracle-checked `streaming_kmeans` query runs.
  *
  * Scale: state is K rows (one per cluster); each micro-batch shuffles
  * only its own points once, keyed by cid — partial aggregation upstream
  * of the state store keeps per-trigger state updates K-row-sized.
  */
object StreamOps {

  /** Tumbling 1-day windowed aggregation; runs on a batch OR streaming
    * events DataFrame (watermark is a no-op in batch). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** At-ingest quality gate — the deployment shape of the batch
    * model-based filters ([[graft.operators.LangModel]]): artifacts
    * TRAINED in the batch world (the vocabulary cut, the classifier
    * weight table) ship into the stream job as literals, and scoring
    * is then PURE per-row expression work — classifier margin
    * (integer sum over hashed weight buckets), OOV count against the
    * trained vocabulary, token count, keep flag — no streaming state,
    * no join, no shuffle; the scan parallelizes per micro-batch
    * exactly like the batch scan parallelizes per split. Works on a
    * batch OR streaming docs frame (StreamingSpec asserts
    * batch-equality on out-of-order micro-batches); a model refresh
    * is a job restart with new literals, the standard artifact-
    * rollout story. Inputs: docs (doc_id, text); weights = the
    * batch-trained [[graft.operators.LangModel.clfLearnedWeights]]
    * artifact (since round 13 the gate scores the LEARNED weight
    * table, not the fixed reference literals). */
  def streamingQualityGate(docs: DataFrame, vocab: Seq[String],
      weights: Seq[Long]): DataFrame = {
    import graft.operators.LangModel
    val ts = graft.functions.TextFeatures.toks(lower(col("text")))
    val vlit = typedlit(vocab)
    docs.select(
      col("doc_id"),
      // THE shared margin contract (not an inline re-derivation — the
      // two copies had already started to drift per the round-6 advice);
      // the duplicated token subexpression collapses under Spark CSE
      LangModel.marginWith(col("text"), weights).as("margin"),
      size(ts).cast("long").as("n_tokens"),
      size(filter(ts, w => !array_contains(vlit, w))).cast("long").as("n_oov"))
      .withColumn("keep", col("margin") > 0)
  }

  /** At-ingest embedding outlier gate — the deployment shape of
    * [[graft.operators.Similarity.embeddingOutliers]]: the L-row
    * per-label centroid table (batch-trained, exact `MoneySum` means)
    * collects to the driver and ships as LITERALS (arrays of doubles +
    * precomputed norms, the K-row-artifact discipline), so scoring an
    * incoming vector is PURE per-row expression work — look up the
    * label's centroid, sequential-fold cosine ([[graft.functions
    * .DotProduct]], the batch fold), keep = cos ≥ floor — no state, no
    * join, no shuffle; append-safe by construction. A label absent
    * from training scores NULL cosine and keep = false (fail CLOSED: a
    * vector that can't be screened must not enter the corpus
    * silently). Model refresh = restart with re-collected centroids.
    * Inputs: vecs (vec_id, embedding, label) batch or stream;
    * centroids = [[graft.operators.Similarity.labelCentroids]] rows.
    * StreamingSpec asserts batch-equality on out-of-order
    * micro-batches and the fail-closed path. */
  def streamingOutlierGate(vecs: DataFrame,
      centroids: Seq[(Int, Seq[Double], Double)],
      floor: Double): DataFrame = {
    // a deploy with no trained centroids is a broken artifact, not a
    // stream to silently drop — fail loudly at plan time
    require(centroids.nonEmpty,
      "streamingOutlierGate: empty centroid artifact — retrain labelCentroids")
    // MAP literals keyed by label (L entries — the artifact stays
    // L-sized no matter how sparse the label ids); try_element_at
    // returns NULL for an untrained label under ANSI, which the
    // fail-closed coalesce below turns into keep=false
    val cvMap: Map[Int, Seq[Double]] =
      centroids.map(c => c._1 -> c._2).toMap
    val nrmMap: Map[Int, Double] = centroids.map(c => c._1 -> c._3).toMap
    val v = transform(col("embedding"), x => x.cast("double"))
    // the map literal is keyed by Int; an ingest schema with a wider
    // label (long) must still LOOK UP, not fail analysis (ANSI cast
    // throws on overflow) or wrap onto some trained label's key —
    // try_cast turns an overflowing label into NULL → lookup NULL →
    // keep=false (the gate's fail-closed contract)
    val labelKey = col("label").try_cast("int")
    val cv = try_element_at(typedlit(cvMap), labelKey)
    val cnrm = try_element_at(typedlit(nrmMap), labelKey)
    val nrm = graft.functions.DotProduct.norm(v)
    vecs.select(
      col("vec_id"), col("label"),
      // both norms guarded: a zero-norm INPUT vector would make the
      // cosine NaN, and Spark orders NaN above every number, so an
      // unguarded `cos >= floor` would fail OPEN
      when(cnrm =!= 0.0 && nrm =!= 0.0,
        graft.functions.DotProduct(v, cv) / (nrm * cnrm))
        .as("cos"))
      .withColumn("keep", coalesce(col("cos") >= floor, lit(false)))
  }

  /** At-ingest DSIR selection — the deployment shape of
    * [[graft.operators.DataSelection]]: the batch-trained bucket
    * weight table (≤ [[graft.operators.DataSelection.Buckets]] rows,
    * the K-row-artifact discipline) is collected into a literal
    * array, and each incoming document's weight is a PURE per-row
    * fold over its hashed bigram occurrences — no state, no join, no
    * shuffle; append-safe by construction. A bucket the training
    * corpus never saw scores 0 (the neutral log-ratio: the stream is
    * the one place a truly novel bucket can appear — batch scoring
    * can't, since the raw model's domain covers every occurring
    * bucket). keep = weight above zero (more target-like than the raw
    * corpus). Model refresh = restart with a re-collected table.
    * Inputs: docs (doc_id, source, text) batch or stream; weights
    * (bucket, wb) static — [[graft.operators.DataSelection.bucketWeightsOf]]. */
  def streamingDsirGate(docs: DataFrame, weights: DataFrame): DataFrame = {
    import graft.operators.DataSelection.Buckets
    val wMap = weights.select(col("bucket"), col("wb")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val arr: Seq[Long] = (0L until Buckets.toLong).map(wMap.getOrElse(_, 0L))
    docs.select(
      col("doc_id"), col("source"),
      aggregate(
        transform(graft.functions.WordNgramHashes.positional(col("text"), 2),
          h => element_at(typedlit(arr),
            (pmod(h, lit(Buckets.toLong)) + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x).as("w_bits"))
      .withColumn("keep", col("w_bits") > 0)
  }

  /** At-ingest decontamination — the STREAM-STATIC JOIN shape (each
    * output row derives from one stream row plus a static table, so
    * the join is stateless and append-safe): an incoming document's
    * distinct n-gram hashes join the static benchmark gram set, and
    * every match emits a flagged (doc_id, source, gh) row BEFORE the
    * document enters the corpus — the deployment counterpart of the
    * batch [[graft.operators.CorpusOps.decontaminateOn]], which scans
    * the corpus after the fact. The static side broadcasts under every
    * micro-batch; per-document dedup of multi-gram matches is the
    * consumer's compaction (a gram-level match log is what an audit
    * wants anyway). StreamingSpec asserts the flagged DOCUMENT set
    * equals the batch operator's on the same rows. Inputs: docs
    * (doc_id, source, text) batch or stream; bench (gh) static. */
  def streamingDecontaminate(docs: DataFrame, bench: DataFrame): DataFrame =
    docs
      .withColumn("gh", explode(graft.functions.WordNgramHashes(
        col("text"), graft.operators.CorpusOps.DecontamN)))
      .join(broadcast(bench), Seq("gh"))
      .select(col("doc_id"), col("source"), col("gh"))

  /** Stream-stream temporal range join — the at-ingest twin of the
    * batch [[graft.operators.EventAnalytics.clickErrorRange]]: pairs
    * every error with the same user's clicks from the preceding hour,
    * as both sides ARRIVE. Structured Streaming buffers each side in
    * the state store and joins within the watermark horizon; the
    * explicit event-time range predicate (`e_ts` in
    * `[c_ts, c_ts + 1 h]`) plus both watermarks is what lets Spark
    * derive a state-eviction bound for BOTH buffers — an equality-only
    * stream-stream join condition would grow click state forever.
    * State per side ≈ (watermark + range) of recent rows per user,
    * bounded at any stream length; a late row beyond the watermark is
    * dropped rather than joined incompletely (the append-mode
    * contract). Inputs: clicks (user_id, c_ts, c_id), errors
    * (user_id, e_ts, e_id). */
  def streamingRangeJoin(clicks: DataFrame, errors: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withWatermark("c_ts", watermark)
    val e = errors.withColumnRenamed("user_id", "e_user")
      .withWatermark("e_ts", watermark)
    c.join(e,
      col("user_id") === col("e_user") &&
        col("e_ts") >= col("c_ts") &&
        col("e_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("c_id"), col("e_id"),
        col("c_ts"), col("e_ts"))
  }

  private def updateCluster(cid: Int, rows: Iterator[(Int, Double, Double)],
      state: GroupState[ClusterState]): CentroidUpdate = {
    var s = state.getOption.getOrElse(ClusterState(0.0, 0.0, 0L))
    rows.foreach { case (_, x, y) => s = ClusterState(s.sx + x, s.sy + y, s.n + 1) }
    state.update(s)
    CentroidUpdate(cid, s.sx / s.n, s.sy / s.n, s.n)
  }

  /** Incremental K-Means over a stream of points: running-mean centroid
    * per initial-assignment cluster. `cs` is the (broadcast) initial
    * codebook. Works on batch or streaming Datasets; use OutputMode
    * Update when streaming. */
  def streamingKMeans(points: Dataset[StreamPoint],
      cs: Seq[Centroid]): Dataset[CentroidUpdate] = {
    import points.sparkSession.implicits._
    graft.kmeans.KMeans.assign(points.toDF(), cs)
      .select(col("cid").cast("int"), col("x"), col("y"))
      .as[(Int, Double, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateCluster)
  }

  /** OutputMode for the streaming K-Means sink. */
  val KMeansOutputMode: OutputMode = OutputMode.Update()

  /** A streaming heavy-hitter candidate: the word and its Misra-Gries
    * lower-bound count (true count ∈ [lower_bound, lower_bound +
    * N_bucket/(capacity+1)]). */
  final case class HhUpdate(bucket: Int, word: String, lower_bound: Long)

  /** Streaming heavy hitters — the at-ingest twin of the batch
    * `heavy_hitters` candidate pass: a running Misra-Gries summary over
    * an unbounded word stream, emitting each bucket's current candidate
    * set per trigger.
    *
    * State stays bounded two ways: words shard across `buckets` state
    * keys by a hash of the WORD (every occurrence of a word lands in
    * exactly one bucket, so each bucket runs sequential MG over its own
    * sub-stream — the per-bucket error N_bucket/(capacity+1) is ≤ the
    * global N/(capacity+1) bound, i.e. sharding only ever tightens the
    * guarantee), and each bucket's map holds ≤ `capacity` counters
    * under any skew. Total state = buckets × capacity entries, forever,
    * at any stream volume — the property an unbounded exact count
    * cannot give. Bucket count = shuffle parallelism of the state
    * update; capacity = per-bucket memory. Same trade as the batch
    * [[graft.functions.FrequentWords]], whose `mgUpdate` step this
    * shares. */
  def streamingHeavyHitters(words: Dataset[String], buckets: Int = 16,
      capacity: Int = 64): Dataset[HhUpdate] = {
    import words.sparkSession.implicits._
    words.groupByKey(w => math.floorMod(w.hashCode, buckets))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (bucket: Int, ws: Iterator[String],
            state: GroupState[Map[String, Long]]) => {
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(m ++= _)
          ws.foreach(w =>
            graft.functions.FrequentWords.mgUpdate(m, w, capacity))
          state.update(m.toMap)
          m.iterator.map { case (w, c) => HhUpdate(bucket, w, c) }
        })
  }

  /** One maintained line-frequency row: the line's 62-bit PolyHash, how
    * many distinct-consecutive documents carried it so far, and whether
    * it crossed the boilerplate threshold. */
  final case class BoilerUpdate(h: Long, n_docs: Long, boiler: Boolean)

  /** Streaming boilerplate-line detector — the at-ingest twin of
    * [[graft.operators.Dedup.dedupLines]]: maintains per-line
    * doc-frequency counts and announces lines crossing `minDocs`, so an
    * ingest pipeline can start dropping a cookie banner the moment the
    * third distinct document carries it. State per distinct line is 16
    * bytes (count + last doc id), keyed by the same in-scan PolyHash as
    * the batch census — no line text ever reaches the state store or
    * the shuffle.
    *
    * Contract: counts are per distinct document PER BATCH, with one
    * bridge doc suppressed across batches (a doc repeating its own
    * line — the batch operator's within-doc case — counts once; a doc
    * RE-arriving in a later batch counts again unless it was the
    * previous batch's remembered representative). The per-batch update
    * is ORDER-INSENSITIVE — the group's batch rows reduce to a distinct
    * doc-id set and the remembered representative is the max doc id —
    * because `flatMapGroupsWithState` guarantees no row order within a
    * micro-batch: with multi-partition input, rows of two docs carrying
    * the same line can interleave (A, B, A), and the earlier
    * `doc != last` running check double-counted A. Exact distinct-doc
    * semantics would pin unbounded doc-id sets into state; the batch
    * census is the exact surface, this is the bounded-state ingest
    * gate. Output mode Update: each touched line re-emits its row per
    * batch. */
  def streamingBoilerplate(docs: DataFrame,
      minDocs: Long = graft.operators.Dedup.LineMinDocs): Dataset[BoilerUpdate] = {
    import docs.sparkSession.implicits._
    val lines = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(filter(transform(split(col("text"), "\n"), l => trim(l)),
          l => l =!= lit(""))).as("line"))
      .select($"doc_id", graft.functions.PolyHash($"line").as("h"))
      .as[(Long, Long)]
    lines.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (h: Long, rows: Iterator[(Long, Long)],
            state: GroupState[(Long, Long)]) => {
          val (n0, last) = state.getOption.getOrElse((0L, Long.MinValue))
          // order-insensitive batch update: distinct docs this batch,
          // minus the cross-batch bridge representative
          val docs = rows.map(_._1).toSet
          val n = n0 + (docs - last).size
          state.update((n, if (docs.nonEmpty) docs.max else last))
          Iterator.single(BoilerUpdate(h, n, n >= minDocs))
        })
  }

  /** Streaming exact dedup — the at-ingest dedup stage of a streaming
    * corpus pipeline: each document content is emitted once; late
    * re-arrivals within the watermark horizon are dropped. The dedup
    * key is the same (length, [[graft.operators.Dedup.ExactKeyBases]]
    * four-base PolyHash composite) the batch
    * [[graft.operators.Dedup.dedupExact]] shuffles on (birthday-safe at
    * 10^10 docs; adversarial caveat in Dedup's scaladoc), so the state
    * store holds 40 bytes per distinct document instead of its text,
    * and `dropDuplicatesWithinWatermark` expires state once the
    * watermark passes — bounded state at any stream volume, which an
    * unbounded `dropDuplicates` would not give. Input needs (ts, text)
    * columns; all input columns pass through.
    *
    * CHECKPOINT COMPATIBILITY: widening the key from the earlier
    * two-base form changed the state schema — a query restarted from a
    * checkpoint written by the old key fails Spark's state-schema
    * validation AT RESTART TIME. The key is therefore VERSION-GATED:
    * `keyVersion = 1` keeps the legacy two-base key selectable so a
    * deployment holding v1 checkpoints can restart unchanged, then
    * migrate on its own schedule — drain past the watermark horizon
    * (after which the expiring state no longer protects anything),
    * switch to `keyVersion = 2` with a FRESH checkpoint location, and
    * accept re-admitted duplicates only within that horizon. v2 (the
    * default) is the birthday-safe four-base key every batch operator
    * shares. */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour",
      keyVersion: Int = 2): DataFrame = {
    val bases = keyBasesFor(keyVersion)
    // key columns use reserved names so a caller's own n_chars/h31/...
    // columns pass through untouched (the documented contract)
    val keyNames = bases.map(b => s"__dedup_h$b")
    val hashed = bases.foldLeft(docs) { (d, b) =>
      d.withColumn(s"__dedup_h$b", graft.functions.PolyHash(col("text"), b))
    }
    hashed
      .withColumn("__dedup_len", length(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__dedup_len" +: keyNames)
      .drop("__dedup_len" +: keyNames: _*)
  }

  /** A change-log record flowing into [[streamingCdcLatest]]. */
  final case class CdcEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String, value: Double)

  /** The maintained snapshot row per key. */
  final case class CdcSnapshot(user_id: Long, last_event_id: Long,
      last_type: String, last_value: Double)

  private def cdcKey(e: CdcEvent): (Long, Long) =
    (e.ts.getTime / 1000L, e.event_id) // second-truncated + id tie-break

  /** Streaming changelog compaction — the at-ingest twin of the batch
    * [[graft.operators.EventAnalytics.cdcLatest]]: `mapGroupsWithState`
    * maintains ONE record per key (the latest by the SAME
    * second-truncated-time + event_id rule the batch operator and its
    * DuckDB oracle use), emitting each touched key's current snapshot
    * per trigger (OutputMode Update). This is the incrementally-
    * maintained "current state" materialized view a CDC consumer
    * reads, instead of re-running the batch compaction over the full
    * log: state is exactly one record per distinct key forever —
    * bounded by key cardinality, not log volume — and an out-of-order
    * or duplicate change arriving late can never regress the snapshot
    * (max is idempotent and commutative, StreamingSpec). */
  def streamingCdcLatest(events: Dataset[CdcEvent]): Dataset[CdcSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[CdcEvent], state: GroupState[CdcEvent]) =>
          var best = state.getOption.orNull
          it.foreach { e =>
            if (best == null ||
                Ordering[(Long, Long)].compare(cdcKey(e), cdcKey(best)) > 0)
              best = e
          }
          state.update(best)
          // same 4-decimal HALF_UP rounding as the batch twin's round()
          CdcSnapshot(uid, best.event_id, best.event_type,
            BigDecimal(best.value)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
  }

  /** Running per-user feature state for [[streamingUserFeatures]]:
    * fixed-width counters plus the distinct-day set (bounded by the
    * calendar horizon, not event volume). */
  final case class UserFeatState(nEvents: Long, nClick: Long, nError: Long,
      nPurchase: Long, nSignup: Long, nView: Long, days: Seq[Int],
      firstSec: Long, lastSec: Long, purchaseValue: Double)

  /** The maintained feature row per user (schema-matches the batch
    * [[graft.operators.EventAnalytics.userFeatures]]). */
  final case class UserFeatureRow(user_id: Long, n_events: Long,
      n_click: Long, n_error: Long, n_purchase: Long, n_signup: Long,
      n_view: Long, active_days: Long, first_ts: java.sql.Timestamp,
      last_ts: java.sql.Timestamp, purchase_value: Double)

  /** Incrementally-maintained per-user feature matrix — the at-ingest
    * twin of the batch [[graft.operators.EventAnalytics.userFeatures]]
    * aggregation: `mapGroupsWithState` keeps one fixed-width feature
    * buffer per user (counters, first/last second, purchase-value sum)
    * plus the distinct active-day set, whose size is bounded by the
    * CALENDAR — days-in-horizon entries at most — so total state is
    * O(users × horizon-days), never O(events). Every update is
    * commutative and associative (counts, min/max, sum, set-union), so
    * out-of-order arrival cannot corrupt the features — the same
    * argument as [[streamingCdcLatest]], extended to a whole buffer.
    * Emits each touched user's current row per trigger (Update mode);
    * after any prefix of the stream, the emitted row equals the batch
    * aggregation over that prefix (StreamingSpec). The float caveat is
    * real and documented: the running `purchaseValue` sum adds in
    * arrival order, so the last-decimal rounding of the emitted value
    * can differ from the batch plan's partial-aggregation order at the
    * contract precision's edge — the spec compares at the 4-decimal
    * contract like every oracle. */
  def streamingUserFeatures(events: Dataset[CdcEvent])
      : Dataset[UserFeatureRow] = {
    import events.sparkSession.implicits._
    // active-day buckets follow the SESSION timezone — the batch twin's
    // date_trunc('day', ts) does, and a fixed sec/86400 (= UTC days)
    // would silently diverge from it on any non-UTC session (advisor
    // finding, round 4). The zone id is captured at plan construction
    // and ships into the closure as a plain string.
    val zoneId = events.sparkSession.conf.get("spark.sql.session.timeZone")
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[CdcEvent], state: GroupState[UserFeatState]) =>
          val zone = java.time.ZoneId.of(zoneId)
          var s = state.getOption.getOrElse(
            UserFeatState(0, 0, 0, 0, 0, 0, Seq.empty, Long.MaxValue,
              Long.MinValue, 0.0))
          it.foreach { e =>
            val sec = e.ts.getTime / 1000L
            val day = e.ts.toInstant.atZone(zone).toLocalDate.toEpochDay.toInt
            s = UserFeatState(
              s.nEvents + 1,
              s.nClick + (if (e.event_type == "click") 1 else 0),
              s.nError + (if (e.event_type == "error") 1 else 0),
              s.nPurchase + (if (e.event_type == "purchase") 1 else 0),
              s.nSignup + (if (e.event_type == "signup") 1 else 0),
              s.nView + (if (e.event_type == "view") 1 else 0),
              if (s.days.contains(day)) s.days else s.days :+ day,
              math.min(s.firstSec, sec),
              math.max(s.lastSec, sec),
              s.purchaseValue +
                (if (e.event_type == "purchase") e.value else 0.0))
          }
          state.update(s)
          UserFeatureRow(uid, s.nEvents, s.nClick, s.nError, s.nPurchase,
            s.nSignup, s.nView, s.days.size.toLong,
            java.sql.Timestamp.from(
              java.time.Instant.ofEpochSecond(s.firstSec)),
            java.sql.Timestamp.from(
              java.time.Instant.ofEpochSecond(s.lastSec)),
            BigDecimal(s.purchaseValue)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
  }

  /** Dedup-key hash bases by state-schema version — see the
    * [[streamingDedup]] checkpoint-compatibility contract. v1 is the
    * legacy two-base key (checkpoints written before the four-base
    * widening); v2 is [[graft.operators.Dedup.ExactKeyBases]]. */
  def keyBasesFor(keyVersion: Int): Seq[Long] = keyVersion match {
    case 1 => graft.operators.Dedup.ExactKeyBases.take(2)
    case 2 => graft.operators.Dedup.ExactKeyBases
    case v => throw new IllegalArgumentException(
      s"unknown streamingDedup key version $v (valid: 1, 2)")
  }
}
