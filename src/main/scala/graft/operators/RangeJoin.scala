package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — the second timeseries join Spark lacks
  * natively: each left event matches every right interval of the same
  * key with `start <= ts <= end` (maintenance windows, sessions,
  * validity ranges).
  *
  * The naive formulation (`l JOIN r ON l.k = r.k AND r.start <= l.ts
  * AND l.ts <= r.end`) plans a key-equi join whose per-key matching is
  * O(|l|·|r|) — quadratic on dense keys, the classic range-join trap.
  * This implementation buckets time into fixed grid cells: an interval
  * explodes to the cells it overlaps, an event maps to its single
  * cell, candidates come from an EQUI-join on (key, cell), and the
  * exact inequality filters the candidates. One shuffle; work is
  * linear in events + interval-cell expansions.
  *
  * Tuning `cellSeconds`: each interval emits `length/cellSeconds + 1`
  * cell rows, and each event meets only the intervals overlapping its
  * own cell — pick the typical interval length, so expansion stays
  * O(1) per interval while a cell rarely holds unrelated intervals.
  * Degenerate long intervals expand to many cells (cost is visible and
  * linear, never quadratic matching).
  *
  * Output: every left column, then each right column except the key.
  * Left rows matching no interval are dropped (inner semantics, like
  * the SQL form the oracle runs); ends are inclusive.
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, startCol: String, endCol: String,
      cellSeconds: Long = 3600L): DataFrame = {
    require(cellSeconds > 0, "cellSeconds must be positive")
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / (cellSeconds * 1000000L))
    val rCols = right.columns.filterNot(_ == key).toSeq
    val rCells = right.withColumn("_cell",
      explode(sequence(cellOf(col(startCol)), cellOf(col(endCol)))))
    val lCells = left.withColumn("_cell", cellOf(col(leftTs)))
    lCells.join(rCells, Seq(key, "_cell"))
      .filter(col(startCol) <= col(leftTs) && col(leftTs) <= col(endCol))
      .drop("_cell")
      .select(left.columns.map(col) ++ rCols.map(col): _*)
  }
}
