package graft.functions

/** The K-Means contract chain's 4-decimal rounding — the ONE `r4`
  * definition every boundary of the chain goes through
  * ([[graft.kmeans.KMeansQueries]]), so driver-side code cannot drift
  * from the DuckDB oracle's `round(v, 4)`.
  *
  * Half away from zero via `Math.round(|v|·10⁴)`, matching DuckDB.
  * Not Spark's `functions.round(v, 4)`: that is BigDecimal HALF_UP on
  * the double's DECIMAL expansion, which can disagree with the
  * multiply-round-divide form on values that are a hair under a
  * half-tie in decimal but land on it in binary (e.g. the double
  * nearest 2.00005 expands to 2.0000500000…128 — BigDecimal rounds it
  * UP where `Math.round(20000.49999…)` stays DOWN). Not
  * `floor(|v|·10⁴ + 0.5)` either: JDK `Math.round` deviates from the
  * floor form on the 0.49999999999999994 adversarial point (the
  * float-add rounds up to 1.0 before floor sees it). Seven rounds of
  * green hash gates pin the chain to `Math.round` semantics.
  */
object Round4 {
  /** Round half-AWAY-FROM-ZERO to 4 decimals — DuckDB `round()`
    * semantics (Scala's bare `math.round` rounds half toward +∞ and
    * would diverge on a negative half-tie). */
  def r4(v: Double): Double =
    math.signum(v) * (math.round(math.abs(v) * 10000) / 10000.0)
}
