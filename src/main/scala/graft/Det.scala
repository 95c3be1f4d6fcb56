package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers (SURVEY.md §2.8).
  *
  * Every declared query must emit engine-stable values so the driver's
  * DuckDB hash-compare sees identical bytes from both engines:
  *   - money/quantity doubles → exact integer cents (BIGINT); FP summation
  *     order then cannot matter (§2.8 rule 3);
  *   - unavoidable real-valued aggregates → ROUND(x, 4) on both sides;
  *   - timestamps → formatted strings or DATE (§2.8 rule 5);
  *   - every aggregate wrapped in an explicit CAST (§2.8 rule 4);
  *   - every query ends in a total ORDER BY (§2.8 rule 1).
  */
object Det {
  /** 2-dp money/qty double → exact integer cents.
    * `round` first (the double product of a 2-dp value × 100 is within
    * 1e-9 of an integer, never exactly half-way), then cast — exact in
    * both Spark and DuckDB: `CAST(ROUND(x*100) AS BIGINT)`. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Arbitrary-precision positive real → exact integer micro-units.
    * Per-row `ROUND(x*1e6)` computes the identical double product and
    * nearest integer in both engines, so windowed/grouped sums over the
    * result are order-independent exact integer arithmetic. */
  def micros(c: Column): Column = round(c * 1000000L, 0).cast("long")

  /** Round a real-valued aggregate to 4 dp, emitted as DOUBLE. */
  def r4(c: Column): Column = round(c.cast("double"), 4)

  /** Timestamp → engine-stable string (oracle: strftime '%Y-%m-%d %H:%M:%S'). */
  def tstr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
