package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across suites (getOrCreate) with the
  * engine's production confs: UTC, AQE on, local-sized shuffle
  * partitions.
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Frames equal as multisets of rows (string-rendered for NaN safety). */
  def assertSameRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
    val ca = a.columns.sorted
    val as = a.select(ca.head, ca.tail: _*).collect().map(_.toString).sorted
    val bs = b.select(ca.head, ca.tail: _*).collect().map(_.toString).sorted
    assert(as.length == bs.length, s"row counts differ: ${as.length} vs ${bs.length}")
    as.zip(bs).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs:\n  $x\n  $y")
    }
  }
}
