package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the timeseries enrichment operator: each left row picks
  * the LATEST right row of the same key with `right.ts <= left.ts`
  * (state lookup at event time; the classic example joins trades to the
  * prevailing quote).
  *
  * Spark has no asof operator, and the naive formulation
  * (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-per-left) is a
  * RANGE join — O(|l|·|r|) per key, quadratic on dense keys. This
  * implementation is the union-sort form: tag both sides, union them,
  * sort per key by (ts, side) and carry the latest right payload
  * forward with `last(ignoreNulls)` — ONE shuffle on the key, linear
  * work, and the sort is per-key (the same (key, ts) clustering the
  * tier tables already store, so on warehouse reads the exchange is
  * the only cost).
  *
  * Semantics, pinned by the DuckDB `ASOF JOIN` oracle (q17):
  *
  *  - ties (`right.ts == left.ts`) MATCH — the right row sorts before
  *    the left row at equal ts (`side` tiebreak), so `<=` holds;
  *  - the right payload rides as ONE struct, so a null payload COLUMN
  *    never makes `last(ignoreNulls)` skip past the latest right ROW;
  *  - left rows before any right row get null payload (left-join
  *    behavior);
  *  - the right side must be unique per (key, ts) — with duplicates
  *    "the latest row" is not well-defined (DuckDB picks one
  *    arbitrarily); callers join against aggregated/rolled-up state,
  *    which is unique by construction.
  *
  * Output: every left column, then each right column EXCEPT the key
  * suffixed `_asof` — the right timestamp is deliberately part of the
  * payload (`<rightTs>_asof`), since "when was the matched state
  * observed" is half the point of an as-of lookup.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    TimeArith.requireUtcForNtz(left, leftTs)
    TimeArith.requireUtcForNtz(right, rightTs)
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    val lCols = left.columns.toSeq
    // fail fast (same contract as RangeJoin.intervalJoin): a caller
    // column named like an internal one would be silently clobbered
    // deep in the union plan, and a left column colliding with a
    // generated <col>_asof name would duplicate in the output
    val reserved = Seq("_t", "_side", "_r", "_latest")
    val resClash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(resClash.isEmpty,
      s"asofJoin: ${resClash.mkString(", ")} reserved for internal use; rename first")
    val outClash = payloadCols.map(c => s"${c}_asof").toSet intersect left.columns.toSet
    require(outClash.isEmpty,
      s"asofJoin: left column(s) collide with generated output names: ${outClash.mkString(", ")}")
    val rStruct = struct(payloadCols.map(c => col(c).as(c)): _*)
    val rTagged = right.select(
      col(key), col(rightTs).cast("timestamp").as("_t"),
      lit(0).as("_side"), rStruct.as("_r"))
    val lTagged = left.select(
      col(key) +: col(leftTs).cast("timestamp").as("_t") +:
        lit(1).as("_side") +:
        lit(null).cast(rTagged.schema("_r").dataType).as("_r") +:
        lCols.filterNot(_ == key).map(col): _*)
    // align columns for the union (right side lacks the left payload) —
    // ONE projection: null-literals for the missing columns in the
    // target order, instead of O(columns) nested withColumn projections
    val rTaggedCols = rTagged.columns.toSet
    val rAligned = rTagged.select(lTagged.columns.toSeq.map { c =>
      if (rTaggedCols(c)) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)
    }: _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.union(rAligned)
      .withColumn("_latest", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(lCols.map(col) ++
        payloadCols.map(c => col(s"_latest.$c").as(s"${c}_asof")): _*)
  }
}
