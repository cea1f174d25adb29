package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-feature primitives for the document operators
  * (SURVEY.md §2.C/§2.E): whitespace tokenization and word n-gram
  * shingling, each paired with the DuckDB SQL computing the identical
  * value (the oracle-parity contract, SURVEY.md §5).
  *
  * Everything here is a per-row expression inside whole-stage codegen —
  * the map stage of a 100-TB dedup scan; no shuffle is implied until an
  * operator groups or joins on the derived features.
  */
object TextFeatures {

  /** Non-empty whitespace tokens (caller lowercases first if wanted). */
  def toks(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** DuckDB equivalent of `toks(lower($"text"))`. */
  val duckToks: String =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '')"

  /** Word n-grams joined by single spaces; empty array when the document
    * has fewer than n tokens. */
  def wordNgrams(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB equivalent of `wordNgrams` over token-list expression `t`. */
  def duckNgrams(t: String, n: Int): String = {
    val concat = (1 to n).map(j => s"($t)[i+${j - 1}]").mkString(" || ' ' || ")
    s"CASE WHEN len($t) >= $n THEN list_transform(range(1, len($t) - ${n - 2}), i -> $concat) " +
      s"ELSE CAST([] AS VARCHAR[]) END"
  }
}
