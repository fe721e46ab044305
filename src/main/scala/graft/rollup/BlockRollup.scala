package graft.rollup

import graft.codec.BlockAgg
import graft.model.Tier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Encoded-block tier of the rollup output: for each (conv_id, window)
  * the raw per-turn series (here: char length over time) packed into
  * delta-of-delta + Gorilla binary columns, with a pruning header
  * (count, min_ts, max_ts). FIXTURES.md §2 `ts_block`/`value_block`/
  * `block_meta`.
  *
  * At 100 TB this is the column that makes the raw tier droppable:
  * after retention expiry the 1m/1h blocks still answer point-level
  * queries within their window without re-scanning raw turns.
  */
object BlockRollup {

  /** Pack each (conv, window) group's (ts, char_len) points into blocks.
    * Single shuffle on the same key as the metric rollup — at scale the
    * two aggregations share one `repartition($"conv_id")` exchange when
    * written in the same job.
    */
  def encode(transcripts: DataFrame, tier: Tier): DataFrame =
    transcripts
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("value", length(col("text")).cast("double"))
      // null-measurement "hole" tolerance (`IoTDBWriter.java:175-178`):
      // a null point (text=null → null char_len) is SKIPPED, not
      // encoded — the typed Pt(Long, Double) aggregator would otherwise
      // crash the whole tier on one null ('Null value appeared in
      // non-nullable field'), while the metric tiers shrug it off
      .filter(col("ts_us").isNotNull && col("value").isNotNull)
      .groupBy(
        col("conv_id"),
        window(col("ts"), tier.windowExpr).getField("start").as("window_start"))
      .agg(BlockAgg(col("ts_us"), col("value")).as("block"))
      .select(
        col("conv_id"),
        col("window_start"),
        col("block").getField("ts_block").as("ts_block"),
        col("block").getField("value_block").as("value_block"),
        struct(
          col("block").getField("count").as("count"),
          col("block").getField("min_ts").as("min_ts"),
          col("block").getField("max_ts").as("max_ts")).as("block_meta"))

  /** Unpack blocks back to (conv_id, ts, value) points — the read /
    * verification path proving `decode(encode(x)) == x` through the
    * real distributed surface.
    */
  def decode(blocks: DataFrame): DataFrame =
    blocks
      .select(
        col("conv_id"),
        explode(BlockAgg.decode(col("ts_block"), col("value_block"))).as("pt"))
      .select(
        col("conv_id"),
        timestamp_micros(col("pt.ts_us")).cast("timestamp_ntz").as("ts"),
        col("pt.value").as("value"))
}
