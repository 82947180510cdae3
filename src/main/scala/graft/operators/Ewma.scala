package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per entity — the recursive
  * time-series smoother (sᵢ = α·xᵢ + (1−α)·sᵢ₋₁, seeded s₁ = x₁) that a
  * rolling mean approximates with a hard window.
  *
  * The recursion cannot be expressed as a window function (a closed-form
  * (1−α)^(i−j) rewrite overflows doubles past a few hundred rows), so this
  * is the documented typed carve-out (the Bpe-encode shape): ONE hash
  * repartition on the entity key, a partition-local secondary sort on
  * (entity, ts, tie), and a streaming fold over the partition iterator —
  * state is ONE double per open entity, rows never materialize as a group,
  * so a million-event entity costs the same memory as a ten-event one.
  *
  * Determinism contract: α must be binary-exact (0.25, 0.5, …) so
  * α·x + (1−α)·s replays identically on any engine — the DuckDB oracle
  * runs the same recursion as a recursive CTE and hash-matches at 6dp
  * (`ewma_smooth`). The (ts, tie) order must be total.
  */
object Ewma {

  /** events-shaped input: (entity: long, ts: timestamp, tie: long,
    * value: double) → (user_id, event_id, value, ewma r6). Null values are
    * excluded before the fold (they would poison the running state).
    */
  def smooth(df: DataFrame, entity: Column, ts: Column, tiebreak: Column,
             value: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"ewma needs alpha in (0, 1], got $alpha")
    require(alpha * 4 == math.rint(alpha * 4),
      s"ewma needs a binary-exact alpha (quarters: 0.25, 0.5, 0.75, 1.0) " +
        s"for cross-engine determinism, got $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha
    val prepared = df
      .select(entity.cast("long").as("__e"), ts.as("__ts"),
        tiebreak.cast("long").as("__tie"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull && col("__ts").isNotNull)
      .repartition(col("__e"))
      .sortWithinPartitions(col("__e"), col("__ts"), col("__tie"))
      .select(col("__e"), col("__tie"), col("__v"))
      .as[(Long, Long, Double)]
    prepared.mapPartitions { iter =>
      var cur = Long.MinValue
      var open = false
      var s = 0.0
      iter.map { case (e, tie, v) =>
        if (!open || e != cur) { cur = e; open = true; s = v }
        else s = alpha * v + beta * s
        (e, tie, v, math.floor(s * 1e6 + 0.5) / 1e6)
      }
    }.toDF("user_id", "event_id", "value", "ewma")
  }

  /** One-sided CUSUM drift detector per entity: sᵢ = max(0, sᵢ₋₁ + xᵢ − k)
    * with alarm when sᵢ ≥ h — the sequential change-point test that fires
    * on a SUSTAINED upward shift long before a per-point z-score does
    * (Page's test). Emits every step with its cumulative statistic and
    * alarm flag; the caller keeps the alarms.
    *
    * Same execution shape and determinism contract as [[smooth]]: one
    * entity-key repartition + streaming fold (one double of state), k and
    * h restricted to binary-exact quarters so the recursion replays
    * identically against the DuckDB recursive-CTE oracle (`cusum_drift`).
    */
  def cusum(df: DataFrame, entity: Column, ts: Column, tiebreak: Column,
            value: Column, k: Double, h: Double): DataFrame = {
    require(h > 0.0, s"cusum needs h > 0, got $h")
    require(k * 4 == math.rint(k * 4) && h * 4 == math.rint(h * 4),
      s"cusum needs binary-exact quarter k/h for cross-engine determinism, got $k/$h")
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(entity.cast("long").as("__e"), ts.as("__ts"),
        tiebreak.cast("long").as("__tie"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull && col("__ts").isNotNull)
      .repartition(col("__e"))
      .sortWithinPartitions(col("__e"), col("__ts"), col("__tie"))
      .select(col("__e"), col("__tie"), col("__v"))
      .as[(Long, Long, Double)]
    prepared.mapPartitions { iter =>
      var cur = Long.MinValue
      var open = false
      var s = 0.0
      iter.map { case (e, tie, v) =>
        if (!open || e != cur) { cur = e; open = true; s = 0.0 }
        s = math.max(0.0, s + v - k)
        (e, tie, v, math.floor(s * 1e6 + 0.5) / 1e6, s >= h)
      }
    }.toDF("user_id", "event_id", "value", "cusum", "alarm")
  }

  /** Holt's linear (double-exponential) smoother per entity: EWMA plus an
    * explicit trend state, so a steadily climbing series is tracked
    * instead of lagged — lᵢ = α·xᵢ + (1−α)(lᵢ₋₁ + bᵢ₋₁),
    * bᵢ = β(lᵢ − lᵢ₋₁) + (1−β)bᵢ₋₁, seeded l₁ = x₁, b₁ = 0. Emits level,
    * trend and the one-step-ahead forecast lᵢ + bᵢ (the value the NEXT
    * point is judged against — the forecast-residual anomaly input).
    *
    * Same execution shape and determinism contract as [[smooth]]: one
    * entity-key repartition + streaming fold with TWO doubles of state;
    * α/β restricted to binary-exact quarters and the update expressions
    * kept to a fixed operation tree, so the recursion replays
    * bit-identically against the DuckDB two-accumulator recursive-CTE
    * oracle (`holt_linear`).
    */
  def holtLinear(df: DataFrame, entity: Column, ts: Column, tiebreak: Column,
                 value: Column, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"holt needs alpha in (0, 1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"holt needs beta in [0, 1], got $beta")
    require(alpha * 4 == math.rint(alpha * 4) && beta * 4 == math.rint(beta * 4),
      s"holt needs binary-exact quarter alpha/beta for cross-engine " +
        s"determinism, got $alpha/$beta")
    val spark = df.sparkSession
    import spark.implicits._
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    val prepared = df
      .select(entity.cast("long").as("__e"), ts.as("__ts"),
        tiebreak.cast("long").as("__tie"), value.cast("double").as("__v"))
      .filter(col("__v").isNotNull && col("__ts").isNotNull)
      .repartition(col("__e"))
      .sortWithinPartitions(col("__e"), col("__ts"), col("__tie"))
      .select(col("__e"), col("__tie"), col("__v"))
      .as[(Long, Long, Double)]
    prepared.mapPartitions { iter =>
      var cur = Long.MinValue
      var open = false
      var l = 0.0
      var tr = 0.0
      iter.map { case (e, tie, v) =>
        if (!open || e != cur) { cur = e; open = true; l = v; tr = 0.0 }
        else {
          val lPrev = l
          l = alpha * v + ca * (l + tr)
          tr = beta * (l - lPrev) + cb * tr
        }
        def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        (e, tie, v, r6(l), r6(tr), r6(l + tr))
      }
    }.toDF("user_id", "event_id", "value", "level", "trend", "forecast")
  }
}
