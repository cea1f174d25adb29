package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a 10× dataset (sf1) from the driver's sf0.1 testdata by
  * KEY-OFFSET REPLICATION, for the one-decade-up scale gate (round-4
  * verdict item 8: three cross-scale points all sit below 1 GB; a shape
  * that only breaks GROWING needs a point above them).
  *
  * Each replica `r` shifts every key space by `r × (max_key + 1)`, with
  * FK spaces shifted consistently (orders.o_custkey moves with
  * customer.c_custkey, events.user_id with the customer space,
  * lineitem's order/part/supp keys with their tables), so the join
  * graph, key distributions, and selectivities are preserved at 10×
  * volume. Dimension tables (region, nation) stay fixed — scaling facts
  * against fixed dims is exactly how a real warehouse grows. Document
  * texts get a per-replica suffix token (so the corpus isn't 90% exact
  * duplicates, which would make every dedup family degenerate) —
  * replicas become verbatim-minus-one-token NEAR-dups instead, a hard
  * honest workload for the n-gram family; n_chars is recomputed.
  * Embedding vectors replicate unchanged (exact-duplicate vectors are
  * a legitimate dedup_embedding stress; ANN ties break on vec_id).
  *
  * Events timestamps are written as µs TIMESTAMP (Spark's native type;
  * [[Tables]] reads both the driver's ns-int64 layout and this one).
  * One parquet FILE per table, matching the testdata layout and
  * tools/check.py's `read_parquet('<dir>/<t>.parquet')`.
  *
  * Usage: `sbt "Test/runMain graft.ScaleUp [srcDir] [outDir]"`
  * (defaults /root/testdata/sf0.1 → /tmp/sf1). Deterministic — no RNG.
  */
object ScaleUp {
  val Replicas = 10

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/sf1")
    // PERTURBED-CONTENT SCALE CONTROL (round-13 verdict #8): with mode
    // `perturb`, every non-zero replica mutates every 5th token of each
    // document (deterministic in (token index, replica) — no RNG), so a
    // replica shares only short token runs with its original: ~60 % of
    // word-3-grams differ, cross-replica Jaccard lands ~0.25 < τ=0.5
    // and SimHash Hamming > 3. Duplicate-family OUTPUT then stops being
    // quadratic-in-replicas BY CONSTRUCTION, which makes the verbatim
    // corpus's decade-ratio attributions (minhash/pairs_build/
    // er_link_build superlinearity = output growth, not engine growth)
    // falsifiable against a corpus where the output is linear.
    // Embedding components get a per-replica nudge on one coordinate
    // (breaks bit-identical vectors; cosine stays in the dup band — the
    // label-blocked embedding family is documented as out of this
    // control's scope).
    val perturb = args.drop(2).headOption.contains("perturb")
    val spark = GraftSession.local()
    import spark.implicits._

    def read(name: String): DataFrame = Tables(spark, src, name)
    def keySpan(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head().getLong(0) + 1L

    val (cust, ords, li, sup, part, ev, docs, emb) =
      (read("customer"), read("orders"), read("lineitem"), read("supplier"),
        read("part"), read("events"), read("documents"), read("embeddings"))
    val (cSpan, oSpan, sSpan, pSpan) = (keySpan(cust, "c_custkey"),
      keySpan(ords, "o_orderkey"), keySpan(sup, "s_suppkey"),
      keySpan(part, "p_partkey"))
    val (eSpan, dSpan, vSpan) = (keySpan(ev, "event_id"),
      keySpan(docs, "doc_id"), keySpan(emb, "vec_id"))

    /** Union of [[Replicas]] transformed copies. */
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Replicas).map(r => f(df, r)).reduce(_ unionByName _)
    def shift(c: String, span: Long, r: Int) =
      (col(c) + lit(span * r)).as(c)

    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val partFile = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
      Files.move(partFile, Paths.get(s"$out/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // clear the scratch dir (crc/_SUCCESS leftovers)
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      println(s"[scaleup] $name -> $out/$name.parquet (${df.columns.length} cols)")
    }

    Files.createDirectories(Paths.get(out))
    // fixed dims: copy through unchanged
    write(read("region"), "region")
    write(read("nation"), "nation")
    write(rep(cust) { (d, r) =>
      // per-replica name suffix, for the same reason documents get one
      // (see scaladoc): verbatim name copies would give every customer
      // `replicas − 1` exact clones and make the ER family's output
      // QUADRATIC in replicas (~800M edges at two decades — a
      // replication artifact, not a workload). The doubled digit keeps
      // cross-replica names at edit distance 2 (> MaxEd, never linked)
      // while within-replica serial Hamming-1 neighbors still link, so
      // ER output scales linearly like every other family's.
      val name = if (r == 0) $"c_name" else concat($"c_name", lit(s"~$r$r"))
      d.select(shift("c_custkey", cSpan, r), name.as("c_name"),
        $"c_nationkey", $"c_acctbal", $"c_mktsegment")
    }, "customer")
    write(rep(sup) { (d, r) =>
      d.select(shift("s_suppkey", sSpan, r), $"s_name", $"s_nationkey",
        $"s_acctbal")
    }, "supplier")
    write(rep(part) { (d, r) =>
      d.select(shift("p_partkey", pSpan, r), $"p_name", $"p_brand",
        $"p_type", $"p_size", $"p_retailprice")
    }, "part")
    write(rep(ords) { (d, r) =>
      d.select(shift("o_orderkey", oSpan, r), shift("o_custkey", cSpan, r),
        $"o_orderstatus", $"o_totalprice", $"o_orderdate", $"o_orderpriority")
    }, "orders")
    write(rep(li) { (d, r) =>
      d.select(shift("l_orderkey", oSpan, r), shift("l_partkey", pSpan, r),
        shift("l_suppkey", sSpan, r), $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_tax", $"l_returnflag",
        $"l_linestatus", $"l_shipdate")
    }, "lineitem")
    write(rep(ev) { (d, r) =>
      d.select(shift("event_id", eSpan, r), $"ts",
        shift("user_id", cSpan, r), $"event_type", $"value", $"props")
    }, "events")
    write(rep(docs) { (d, r) =>
      val text =
        if (r == 0) $"text"
        else if (perturb)
          // mutate every 5th token (offset by r so replicas differ from
          // EACH OTHER too, not just from the original): a 3-gram window
          // covers 3 tokens, so a mutation every 5 kills ~3/5 of grams
          expr(s"array_join(zip_with(split(text, ' '), " +
            s"sequence(0, size(split(text, ' ')) - 1), " +
            s"(w, i) -> CASE WHEN (i + $r) % 5 = 0 " +
            s"THEN concat(w, 'q$r') ELSE w END), ' ')")
        else concat($"text", lit(s" qz${r}x"))
      d.select(shift("doc_id", dSpan, r), text.as("text"), $"lang",
        $"source", length(text).cast("long").as("n_chars"))
    }, "documents")
    write(rep(emb) { (d, r) =>
      val vec =
        if (r == 0 || !perturb) $"embedding"
        else expr(s"zip_with(embedding, sequence(0, size(embedding) - 1), " +
          s"(v, i) -> CASE WHEN i = $r % size(embedding) " +
          s"THEN CAST(v + 0.01 * $r AS FLOAT) ELSE v END)")
      d.select(shift("vec_id", vSpan, r), vec.as("embedding"), $"label")
    }, "embeddings")
    spark.stop()
  }
}
