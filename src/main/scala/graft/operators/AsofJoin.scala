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

  /** Direction of the as-of lookup: `Backward` (default) matches the
    * LATEST right row with `right.ts <= left.ts`; `Forward` matches
    * the EARLIEST right row with `right.ts >= left.ts` (the pandas
    * `merge_asof` direction axis — "next scheduled state" lookups).
    * Ties match in both directions.
    */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      /** [[Backward]] or [[Forward]]. */
      direction: Direction = Backward,
      /** Max staleness in seconds (pandas `merge_asof(tolerance=...)`):
        * a match farther than this from the left ts yields null payload
        * instead — enforced on the MATCHED row's timestamp after the
        * union-sort, so the plan shape is unchanged. None = unbounded.
        */
      toleranceSeconds: Option[Long] = None): DataFrame = {
    TimeArith.requireUtcForNtz(left, leftTs)
    TimeArith.requireUtcForNtz(right, rightTs)
    toleranceSeconds.foreach(t =>
      require(t >= 0, s"asofJoin: tolerance must be non-negative, got $t"))
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
    // tie handling via the side tag: the matching right row must fall
    // INSIDE the left row's window frame at equal ts — backward frames
    // look back, so right sorts BEFORE left; forward frames look
    // ahead, so right sorts AFTER left
    val (rSide, lSide) = direction match {
      case Backward => (0, 1)
      case Forward => (1, 0)
    }
    val rStruct = struct(payloadCols.map(c => col(c).as(c)): _*)
    val rTagged = right.select(
      col(key), col(rightTs).cast("timestamp").as("_t"),
      lit(rSide).as("_side"), rStruct.as("_r"))
    val lTagged = left.select(
      col(key) +: col(leftTs).cast("timestamp").as("_t") +:
        lit(lSide).as("_side") +:
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

    // backward: latest right row at or before me; forward: earliest at
    // or after me. BOTH run the same O(n) RUNNING frame
    // [unboundedPreceding, currentRow] — forward just reverses the sort
    // (desc _t, desc _side keeps right-before-left at ties, matching
    // the swapped side tags). A [currentRow, unboundedFollowing] frame
    // would compile to WindowExec's unbounded-following evaluator,
    // which RE-aggregates the remaining partition per output row —
    // O(n²) on dense keys, the exact cliff the union-sort form exists
    // to avoid (review catch).
    val ordered = direction match {
      case Backward => Window.partitionBy(col(key))
        .orderBy(col("_t").asc, col("_side").asc)
      case Forward => Window.partitionBy(col(key))
        .orderBy(col("_t").desc, col("_side").desc)
    }
    val frame = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedTs = col(s"_latest.$rightTs").cast("timestamp")
    val withinTolerance = toleranceSeconds match {
      case None => lit(true)
      case Some(tol) =>
        val tolUs = tol * 1000000L
        val dUs = unix_micros(matchedTs) - unix_micros(col("_t"))
        direction match {
          case Backward => -dUs <= tolUs
          case Forward => dUs <= tolUs
        }
    }
    // null-timestamp contract (pandas merge_asof refuses null keys;
    // this engine defines them away instead of failing the batch):
    // a right row with null ts is MEANINGLESS state — dropped, or the
    // nulls-first sort order would make it a universal fallback match;
    // a left row with null ts passes through with null payload (its
    // lookup instant does not exist), tolerance or not
    lTagged.union(rAligned.filter(col("_t").isNotNull))
      .withColumn("_latest", last(col("_r"), ignoreNulls = true).over(frame))
      .filter(col("_side") === lSide)
      .withColumn("_latest",
        when(col("_t").isNotNull && withinTolerance, col("_latest")))
      .select(lCols.map(col) ++
        payloadCols.map(c => col(s"_latest.$c").as(s"${c}_asof")): _*)
  }
}
