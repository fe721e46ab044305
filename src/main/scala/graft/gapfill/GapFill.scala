package graft.gapfill

import graft.model.Tier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear-interpolation gap-fill over a tier's window grid (north rule;
  * nearest reference analogue: the null-measurement "hole" tolerance at
  * `IoTDBWriter.java:175-178` — the engine upgrades holes to
  * interpolated points).
  *
  * Fully declarative: `lead()` pairs each present window with its
  * successor, `sequence()` + `explode` generate the missing grid points,
  * and the interpolation formula is plain column arithmetic — the whole
  * operator stays inside WholeStageCodegen with ONE shuffle (the window
  * partition by conv_id, same key as the rollup that produced the
  * input). No typed closure, no driver loop — scales with conversations.
  */
object GapFill {

  /** Fill missing windows of `valueCol` per conversation between each
    * pair of consecutive present windows, linearly interpolating.
    * Returns (conv_id, window_start, value, filled) — present rows
    * carry `filled=false` and their original value.
    */
  def linear(rollup: DataFrame, tier: Tier, valueCol: String): DataFrame =
    fill(rollup, tier, valueCol) { gaps =>
      gaps.withColumn(
          "frac",
          (unix_timestamp(col("gs").cast("timestamp")) -
            unix_timestamp(col("window_start").cast("timestamp"))).cast("double") /
            (unix_timestamp(col("next_ws").cast("timestamp")) -
              unix_timestamp(col("window_start").cast("timestamp"))).cast("double"))
        .withColumn("fill_value",
          col("value") + (col("next_v") - col("value")) * col("frac"))
    }

  /** Last-observation-carried-forward fill — the step-function sibling
    * of [[linear]] for series where interpolation fabricates values
    * that never existed (states, counters between scrapes, settings):
    * each missing window repeats the PREVIOUS present value. Same grid,
    * same single conv_id exchange, same output contract.
    */
  def locf(rollup: DataFrame, tier: Tier, valueCol: String): DataFrame =
    fill(rollup, tier, valueCol)(_.withColumn("fill_value", col("value")))

  /** Shared grid machinery: lead-pair present windows, explode the
    * missing grid points, let `fillExpr` define the gap value as
    * `fill_value` from (value, next_v, window_start, next_ws, gs).
    */
  private def fill(rollup: DataFrame, tier: Tier, valueCol: String)(
      fillExpr: DataFrame => DataFrame): DataFrame = {
    val step = expr(s"INTERVAL ${tier.windowSeconds} SECONDS")
    val byConv = Window.partitionBy(col("conv_id")).orderBy(col("window_start"))
    val paired = rollup
      .select(col("conv_id"), col("window_start"), col(valueCol).cast("double").as("value"))
      .withColumn("next_ws", lead(col("window_start"), 1).over(byConv))
      .withColumn("next_v", lead(col("value"), 1).over(byConv))
    val gaps = fillExpr(
      paired
        .filter(col("next_ws").isNotNull &&
          col("next_ws") > col("window_start") + step)
        .withColumn(
          "gs",
          explode(sequence(col("window_start") + step, col("next_ws") - step, step))))
      .select(
        col("conv_id"),
        col("gs").as("window_start"),
        col("fill_value").as("value"),
        lit(true).as("filled"))
    paired
      .select(col("conv_id"), col("window_start"), col("value"), lit(false).as("filled"))
      .unionByName(gaps)
  }
}
