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
    // fail fast instead of AnalysisException-ing deep inside the plan
    // (or silently clobbering a caller's column with the internal one):
    // the unqualified post-join references require disjoint names
    val shared = left.columns.toSet intersect right.columns.filterNot(_ == key).toSet
    require(shared.isEmpty,
      s"intervalJoin: rename shared non-key columns first: ${shared.mkString(", ")}")
    require(!left.columns.contains("_cell") && !right.columns.contains("_cell"),
      "intervalJoin: '_cell' is reserved")
    TimeArith.requireUtcForNtz(left, leftTs)
    TimeArith.requireUtcForNtz(right, startCol)
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / (cellSeconds * 1000000L))
    val rCols = right.columns.filterNot(_ == key).toSeq
    // inverted intervals (end < start) match nothing BY DEFINITION —
    // drop them before cell expansion, or one corrupt year-wide
    // inverted row explodes to thousands of candidate cells that the
    // inequality then discards at full shuffle cost
    val rCells = right.filter(col(startCol) <= col(endCol))
      .withColumn("_cell",
        explode(sequence(cellOf(col(startCol)), cellOf(col(endCol)))))
    val lCells = left.withColumn("_cell", cellOf(col(leftTs)))
    lCells.join(rCells, Seq(key, "_cell"))
      .filter(col(startCol) <= col(leftTs) && col(leftTs) <= col(endCol))
      .drop("_cell")
      .select(left.columns.map(col) ++ rCols.map(col): _*)
  }
}

/** Shared timestamp-arithmetic guard for the timeseries operators. */
private[graft] object TimeArith {
  /** Gap/cell arithmetic casts TIMESTAMP_NTZ through the SESSION
    * timezone; any zone with DST would warp wall-clock differences
    * across transitions (a 15-minute gap spanning fall-back reads as
    * 75). The engine pins UTC everywhere — enforce it where the
    * arithmetic happens instead of relying on a comment.
    */
  def requireUtcForNtz(df: DataFrame, c: String): Unit =
    if (df.schema(c).dataType == org.apache.spark.sql.types.TimestampNTZType) {
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
      require(isUtc(tz),
        s"column '$c' is TIMESTAMP_NTZ and the session timezone is '$tz': " +
          "timestamp arithmetic on zoneless values requires spark.sql.session.timeZone=UTC")
    }

  /** The stricter guard for CALENDAR-FIELD extraction (dayofweek, hour):
    * unlike epoch-µs arithmetic — timezone-independent on TimestampType,
    * which is why [[requireUtcForNtz]] only fires for NTZ — field
    * extraction reads the SESSION zone for BOTH timestamp types. An
    * operator whose contract says "in UTC" must pin the session zone
    * unconditionally or silently emit local-time cells.
    */
  def requireUtcForCalendar(df: DataFrame, c: String): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(isUtc(tz),
      s"calendar-field extraction on '$c' is session-timezone-dependent " +
        s"for every timestamp type and the session timezone is '$tz': " +
        "this operator's UTC contract requires spark.sql.session.timeZone=UTC")
  }

  /** Zone-ID-aware UTC check: a bare string equality would reject
    * 'Etc/UTC' — the JVM default on many hosts and therefore Spark's
    * default session zone — crashing jobs that ARE running in UTC
    * (measured: an unpinned spark-submit on this host reports
    * 'Etc/UTC'). Any zone that normalizes to the zero fixed offset
    * (UTC, Etc/UTC, GMT, Z, +00:00) has identical extraction rules.
    * Unknown zone ids fail closed.
    */
  private def isUtc(tz: String): Boolean =
    try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
    catch { case _: java.time.DateTimeException => false }
}
