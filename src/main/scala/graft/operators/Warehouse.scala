package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Warehouse-maintenance operators over the `events` changelog — the
  * SCD2 history build, the MERGE-style upsert apply, and the version
  * diff that a curated 100-TB table needs between ingests. All three
  * treat `events` as a keyed change stream (user_id, ordered by
  * second-truncated ts with event_id tie-break — the same deterministic
  * ordering contract as [[EventAnalytics.cdcLatest]]).
  */
object Warehouse {

  /** The merge cutoff splitting the changelog into "already-applied
    * snapshot" and "incoming delta" for [[mergeUpsert]]/[[tableDiff]] —
    * mid-range of the synthetic data's one-month window. */
  val MergeCutoff = "2024-01-16"

  /** Event types that act as DELETE tombstones in the upsert stream;
    * everything else upserts the user's record. */
  val TombstoneType = "error"

  /** SCD2 (type-2 slowly-changing-dimension) history build: the
    * changelog compressed to one row per STATUS CHANGE, each carrying
    * its validity interval — `valid_from` = the change's timestamp,
    * `valid_to` = the next change's (null = current). The change filter
    * (`event_type <> lag(event_type)`) is what makes this SCD2 rather
    * than a log copy: consecutive same-status events collapse into one
    * version row.
    *
    * Scale: ONE user-keyed shuffle; the change-detect lag, the
    * validity lead, and the version row_number all share the same
    * (user_id | ts, id) sort, and the filter between them preserves
    * partitioning AND order, so Catalyst plans a single exchange with
    * no re-sort for the second window. No per-group arrays — each row
    * carries only its predecessor type / successor timestamp. Output
    * is change-cardinality (≤ log size), partitioned by the same key
    * it arrived on. */
  def scd2History(s: SparkSession, dir: String): DataFrame =
    scd2Core(s, dir).orderBy(col("user_id"), col("version"))

  /** [[scd2History]] without the presentation sort — the form other
    * operators ([[scd2Join]]) consume, so composing doesn't pay a
    * global sort that the next shuffle immediately destroys. */
  def scd2Core(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        date_trunc("second", $"ts").as("ts_sec"))
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .withColumn("valid_to", lead($"ts_sec", 1).over(w))
      .withColumn("version", row_number().over(w))
      .select($"user_id", $"version", $"event_type".as("status"),
        $"ts_sec".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"))
  }

  val scd2HistorySql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |    date_trunc('second', ts) AS ts_sec,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY date_trunc('second', ts), event_id) AS prev_type
      |  FROM events),
      |changes AS (
      |  SELECT user_id, event_id, event_type, ts_sec FROM ordered
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  event_type AS status,
      |  ts_sec AS valid_from,
      |  lead(ts_sec) OVER w AS valid_to,
      |  (lead(ts_sec) OVER w IS NULL) AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** Latest state per user from a changelog slice: the one surviving
    * row per key (WindowGroupLimit prunes to one candidate per key per
    * partition before the exchange), tombstones still present so a
    * caller decides their fate. */
  private def latestState(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec").desc, col("event_id").desc)
    log.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("rk")
  }

  /** MERGE-style upsert apply: materialize the pre-cutoff SNAPSHOT
    * (latest non-tombstone row per user — a user whose last pre-cutoff
    * event was a tombstone is simply absent), then apply the
    * post-cutoff DELTA with latest-wins + tombstone-delete semantics.
    * The merge itself is UNION + one latest-wins window — not a join:
    * a snapshot row and its delta rows land in the same hash partition
    * and the newest wins by the shared (ts, id) order, which is both
    * cheaper than a full-outer MERGE join (one shuffle, WindowGroupLimit
    * pruning) and trivially idempotent under re-application.
    *
    * Correctness anchor: applying the delta to the materialized
    * snapshot must equal replaying the WHOLE log with the same
    * semantics — that replay is exactly what the oracle runs, so the
    * hash gate proves the snapshot/delta decomposition loses nothing
    * (the associativity a real incremental pipeline relies on). */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val log = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        date_trunc("second", $"ts").as("ts_sec"), $"value")
    val cutoff = lit(MergeCutoff).cast("timestamp")
    val snapshot = latestState(log.filter($"ts_sec" < cutoff))
      .filter($"event_type" =!= TombstoneType)
    val delta = log.filter($"ts_sec" >= cutoff)
    latestState(snapshot.unionByName(delta))
      .filter($"event_type" =!= TombstoneType)
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_type"), round($"value", 4).as("last_value"))
      .orderBy($"user_id")
  }

  val mergeUpsertSql: String =
    s"""WITH log AS (
       |  SELECT user_id, event_id, event_type,
       |    date_trunc('second', ts) AS ts_sec, value FROM events),
       |latest AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id
       |    ORDER BY ts_sec DESC, event_id DESC) AS rk FROM log)
       |SELECT user_id, event_id AS last_event_id,
       |  event_type AS last_type, round(value, 4) AS last_value
       |FROM latest
       |WHERE rk = 1 AND event_type <> '$TombstoneType'
       |ORDER BY user_id""".stripMargin

  /** Version diff — the reconciliation report between the pre-cutoff
    * snapshot and the post-merge state: every key classified added /
    * removed / changed / unchanged with both sides' values. Both
    * inputs are key-cardinality states (not logs), so the full-outer
    * join is a key-sized co-partitioned shuffle — the shape that stays
    * cheap when the underlying log is 100 TB but the key space is not.
    * The classification is total: every key in either version appears
    * exactly once. */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val log = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        date_trunc("second", $"ts").as("ts_sec"), $"value")
    val cutoff = lit(MergeCutoff).cast("timestamp")
    val before = latestState(log.filter($"ts_sec" < cutoff))
      .filter($"event_type" =!= TombstoneType)
      .select($"user_id", $"event_id".as("old_event_id"),
        round($"value", 4).as("old_value"))
    val after = latestState(log)
      .filter($"event_type" =!= TombstoneType)
      .select($"user_id", $"event_id".as("new_event_id"),
        round($"value", 4).as("new_value"))
    before.join(after, Seq("user_id"), "full_outer")
      .select($"user_id",
        when($"old_event_id".isNull, lit("added"))
          .when($"new_event_id".isNull, lit("removed"))
          .when($"old_event_id" === $"new_event_id", lit("unchanged"))
          .otherwise(lit("changed")).as("change"),
        $"old_value", $"new_value")
      .orderBy($"user_id")
  }

  val tableDiffSql: String =
    s"""WITH log AS (
       |  SELECT user_id, event_id, event_type,
       |    date_trunc('second', ts) AS ts_sec, value FROM events),
       |before_state AS (
       |  SELECT user_id, event_id AS old_event_id,
       |    round(value, 4) AS old_value
       |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_sec DESC, event_id DESC) AS rk
       |        FROM log WHERE ts_sec < TIMESTAMP '$MergeCutoff')
       |  WHERE rk = 1 AND event_type <> '$TombstoneType'),
       |after_state AS (
       |  SELECT user_id, event_id AS new_event_id,
       |    round(value, 4) AS new_value
       |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
       |          ORDER BY ts_sec DESC, event_id DESC) AS rk FROM log)
       |  WHERE rk = 1 AND event_type <> '$TombstoneType')
       |SELECT coalesce(b.user_id, a.user_id) AS user_id,
       |  CASE WHEN b.old_event_id IS NULL THEN 'added'
       |       WHEN a.new_event_id IS NULL THEN 'removed'
       |       WHEN b.old_event_id = a.new_event_id THEN 'unchanged'
       |       ELSE 'changed' END AS change,
       |  b.old_value, a.new_value
       |FROM before_state b FULL OUTER JOIN after_state a
       |  ON b.user_id = a.user_id
       |ORDER BY user_id""".stripMargin

  /** Point-in-time dimension join — the consumption side of SCD2:
    * every purchase event attaches the dimension version valid AT its
    * timestamp (`valid_from ≤ t < valid_to`, last version open). This
    * is THE query a type-2 dimension exists to answer, and the classic
    * way to write it is the inequality join the oracle runs; at 100 TB
    * an inequality join either range-fans-out or falls to a nested
    * loop, so the Spark side instead reuses the as-of union-sort shape
    * ([[AsOfJoin]]): version-boundary rows and fact rows union into
    * one user-keyed shuffle (beyond the history build's own — a union
    * is not co-partitioned even when both inputs hash the same key),
    * sort by (t, dim-before-fact, version), and a running
    * `last(ignoreNulls)` carries the in-effect version onto each fact
    * row — O(n) per key, no fanout. Because the
    * intervals tile gaplessly (WarehouseSpec), "latest boundary ≤ t"
    * and "interval containing t" are the same version — the hash gate
    * proves the two formulations agree. Fact rows wrap the carried
    * struct in a side-guard so `ignoreNulls` skips them (a struct of
    * null FIELDS is not itself null). */
  def scd2Join(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val facts = Tables(s, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", date_trunc("second", $"ts").as("t"), $"event_id",
        lit(1).as("__side"),
        lit(null).cast("int").as("version"),
        lit(null).cast("string").as("status"))
    val dim = scd2Core(s, dir)
      .select($"user_id", $"valid_from".as("t"),
        lit(null).cast("long").as("event_id"),
        lit(0).as("__side"), $"version", $"status")
    val w = Window.partitionBy($"user_id")
      .orderBy($"t", $"__side", $"version")
      .rowsBetween(Window.unboundedPreceding, 0)
    facts.unionByName(dim)
      .withColumn("asof",
        last(when($"__side" === 0, struct($"version", $"status")),
          ignoreNulls = true).over(w))
      .filter($"__side" === 1)
      .select($"user_id", $"event_id", $"t",
        $"asof.version".as("version"), $"asof.status".as("status"))
      .orderBy($"user_id", $"t", $"event_id")
  }

  val scd2JoinSql: String =
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type,
      |    date_trunc('second', ts) AS ts_sec,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY date_trunc('second', ts), event_id) AS prev_type
      |  FROM events),
      |changes AS (
      |  SELECT user_id, event_id, event_type, ts_sec FROM ordered
      |  WHERE prev_type IS NULL OR prev_type <> event_type),
      |scd AS (
      |  SELECT user_id, event_type AS status, ts_sec AS valid_from,
      |    lead(ts_sec) OVER w AS valid_to,
      |    CAST(row_number() OVER w AS INT) AS version
      |  FROM changes
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
      |p AS (
      |  SELECT user_id, event_id, date_trunc('second', ts) AS t
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.user_id, p.event_id, p.t, s.version, s.status
      |FROM p JOIN scd s ON p.user_id = s.user_id
      |  AND s.valid_from <= p.t
      |  AND (s.valid_to IS NULL OR p.t < s.valid_to)
      |ORDER BY p.user_id, p.t, p.event_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_history" -> (scd2History(_, _)),
    "scd2_join" -> (scd2Join(_, _)),
    "merge_upsert" -> (mergeUpsert(_, _)),
    "table_diff" -> (tableDiff(_, _)))

  def oracles: Map[String, String] = Map(
    "scd2_history" -> scd2HistorySql,
    "scd2_join" -> scd2JoinSql,
    "merge_upsert" -> mergeUpsertSql,
    "table_diff" -> tableDiffSql)
}
