package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Dialect-portable numeric primitives shared by every oracle-matched
  * operator — the ONE owner of the rounding contract, so a future change
  * cannot desynchronize call sites that must agree bit-for-bit.
  */
object Portable {

  /** Half-up 6-decimal rounding as explicit IEEE arithmetic. Engine
    * round() implementations disagree on half-way quotients (HALF_UP over
    * the binary value vs scaled re-rounding — observed at sf0.1:
    * 3.4140895 → 3.414089 vs 3.414090); floor(x·1e6 + 0.5)/1e6 is the
    * same double-op sequence in any engine. For negative inputs the half
    * case rounds toward +infinity — identical in any engine running the
    * same ops, which is the property parity needs.
    */
  def round6(x: Column): Column =
    floor(x * lit(1.0e6) + lit(0.5)) / lit(1.0e6)

  /** The same floor arithmetic rendered as SQL for the DuckDB oracle
    * twins — one owner for both sides of the rounding contract. */
  def round6Sql(x: String): String =
    s"floor(($x) * 1000000.0 + 0.5) / 1000000.0"

  /** The same floor arithmetic as a JVM double op, for custom expressions
    * that must agree bit-for-bit with the Column form (identical IEEE op
    * sequence; |x·1e6| < 2^53 in every rounded domain here). */
  def round6d(x: Double): Double =
    math.floor(x * 1.0e6 + 0.5) / 1.0e6
}
