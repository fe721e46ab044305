package graft.table

import org.apache.spark.sql.SparkSession

/** Driver-side parquet row counts from FOOTER metadata only — no Spark
  * job at all (a `count()` costs a full job-schedule round trip, and on
  * a shared cluster a queue wait). Used by [[SnapshotTable.rowCount]]
  * for manifest-listed files and by callers that need a row-count hint
  * for a plain parquet path (e.g. sizing the IVF training sample —
  * `Similarity.trainingSample`'s `totalHint`).
  */
object ParquetFooters {

  def fileRowCount(path: String,
      conf: org.apache.hadoop.conf.Configuration): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Total rows under `path` (a parquet file or a directory tree). */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        total += fileRowCount(f.getPath.toString, conf)
    }
    total
  }
}
