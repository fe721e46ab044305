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
    * pair of consecutive present windows. Returns
    * (conv_id, window_start, value, filled) — present rows carry
    * `filled=false` and their original value.
    */
  def linear(rollup: DataFrame, tier: Tier, valueCol: String): DataFrame = {
    val step = expr(s"INTERVAL ${tier.windowSeconds} SECONDS")
    val byConv = Window.partitionBy(col("conv_id")).orderBy(col("window_start"))
    val paired = rollup
      .select(col("conv_id"), col("window_start"), col(valueCol).cast("double").as("value"))
      .withColumn("next_ws", lead(col("window_start"), 1).over(byConv))
      .withColumn("next_v", lead(col("value"), 1).over(byConv))
    val gaps = paired
      .filter(col("next_ws").isNotNull &&
        col("next_ws") > col("window_start") + step)
      .withColumn(
        "gs",
        explode(sequence(col("window_start") + step, col("next_ws") - step, step)))
      .withColumn(
        "frac",
        (unix_timestamp(col("gs").cast("timestamp")) -
          unix_timestamp(col("window_start").cast("timestamp"))).cast("double") /
          (unix_timestamp(col("next_ws").cast("timestamp")) -
            unix_timestamp(col("window_start").cast("timestamp"))).cast("double"))
      .select(
        col("conv_id"),
        col("gs").as("window_start"),
        (col("value") + (col("next_v") - col("value")) * col("frac")).as("value"),
        lit(true).as("filled"))
    paired
      .select(col("conv_id"), col("window_start"), col("value"), lit(false).as("filled"))
      .unionByName(gaps)
  }
}
