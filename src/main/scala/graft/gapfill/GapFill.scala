package graft.gapfill

import graft.model.Tier
import org.apache.spark.sql.{Column, DataFrame}
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
    fill(rollup, tier, valueCol) { gs =>
      val frac =
        (unix_timestamp(gs.cast("timestamp")) -
          unix_timestamp(col("window_start").cast("timestamp"))).cast("double") /
          (unix_timestamp(col("next_ws").cast("timestamp")) -
            unix_timestamp(col("window_start").cast("timestamp"))).cast("double")
      col("value") + (col("next_v") - col("value")) * frac
    }

  /** Last-observation-carried-forward fill — the step-function sibling
    * of [[linear]] for series where interpolation fabricates values
    * that never existed (states, counters between scrapes, settings):
    * each missing window repeats the PREVIOUS present value. Same grid,
    * same single conv_id exchange, same output contract.
    */
  def locf(rollup: DataFrame, tier: Tier, valueCol: String): DataFrame =
    fill(rollup, tier, valueCol)(_ => col("value"))

  /** Shared grid machinery: lead-pair present windows, then emit each
    * present point AND its trailing gap points from ONE explode —
    * `fillExpr(gs)` defines the gap value from (value, next_v,
    * window_start, next_ws) and the grid point `gs`.
    *
    * Single-pass shape (guide §2.4): the original formulation unioned
    * a present-rows branch with a gap-rows branch, and since both
    * branches hang below the union, the ENTIRE upstream pipeline —
    * rollup scan, aggregation exchange, conv_id window — was executed
    * twice (exchange reuse does not cover the post-exchange window
    * compute). Emitting `array(present) ++ gap points` per row and
    * exploding once keeps the upstream single-execution: one scan, one
    * rollup exchange, one window, no union. Output rows are identical
    * (present rows carry filled=false and their original value; grid
    * points carry fillExpr and filled=true).
    */
  private def fill(rollup: DataFrame, tier: Tier, valueCol: String)(
      fillExpr: Column => Column): DataFrame = {
    val step = expr(s"INTERVAL ${tier.windowSeconds} SECONDS")
    val byConv = Window.partitionBy(col("conv_id")).orderBy(col("window_start"))
    val paired = rollup
      .select(col("conv_id"), col("window_start"), col(valueCol).cast("double").as("value"))
      .withColumn("next_ws", lead(col("window_start"), 1).over(byConv))
      .withColumn("next_v", lead(col("value"), 1).over(byConv))
    // grid points as a BARE timestamp array — the row's own window
    // plus its trailing gap grid — so the explode stays a codegen'd
    // Generate over sequence/concat built-ins, and the fill value is
    // computed AFTER the explode as plain column arithmetic. (An
    // earlier r6 attempt built array<struct> via transform lambdas:
    // single-pass, but every gap point went through an interpreted
    // higher-order function — measured ~2× slower than even the
    // two-branch union it replaced. The round-1 union form paid the
    // whole upstream rollup + window twice instead.)
    val gapSeq = when(
      col("next_ws").isNotNull && col("next_ws") > col("window_start") + step,
      sequence(col("window_start") + step, col("next_ws") - step, step))
      // empty array of the input's own timestamp flavor (`when`
      // without otherwise yields NULL, which concat propagates —
      // dropping the present row)
      .otherwise(slice(array(col("window_start")), 1, 0))
    val gs = col("gs")
    paired
      .select(col("conv_id"), col("window_start"), col("value"),
        col("next_ws"), col("next_v"),
        explode(concat(array(col("window_start")), gapSeq)).as("gs"))
      .select(
        col("conv_id"),
        gs.as("window_start2"),
        when(gs > col("window_start"), fillExpr(gs)).otherwise(col("value"))
          .as("value2"),
        // coalesce pins BOTH the round-5 contract points a bare
        // comparison would change: a NULL-window row (null ts grouped
        // by the rollup — nothing is filtered upstream) is a PRESENT
        // row and must read filled=false, not NULL; and the column
        // stays NON-NULLABLE like the old union of boolean literals
        // (schema nullability is part of the output contract)
        coalesce(gs > col("window_start"), lit(false)).as("filled"))
      .select(col("conv_id"), col("window_start2").as("window_start"),
        col("value2").as("value"), col("filled"))
  }
}
