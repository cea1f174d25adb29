package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins (SURVEY.md §4 scale stance).
  *
  * First line of defense is AQE's skew-join splitting (on in
  * [[graft.GraftSession]]); this utility is for the cases AQE can't fix
  * at 100 TB — e.g. one pathological key holding >10% of a fact table,
  * joined against a dimension too large to broadcast:
  *
  *   - the fact side gets a deterministic salt in [0, salts) derived by
  *     hashing a high-cardinality discriminator column, splitting each
  *     hot key's rows across `salts` reducers;
  *   - the dimension side is replicated once per salt (explode of a
  *     salts-length sequence — dim×salts rows, the standard trade);
  *   - the join key becomes (key, salt), so no reducer sees more than
  *     ~1/salts of a hot key.
  *
  * Result equality with the plain join is asserted in SkewSpec.
  */
object Skew {
  /** Join `fact` with `dim` on `key` with `salts`-way salting.
    * `discriminator` is any fact column with per-row variety (an id,
    * an offset) used to derive the deterministic salt. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      discriminator: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn("__salt", pmod(hash(col(discriminator)), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
