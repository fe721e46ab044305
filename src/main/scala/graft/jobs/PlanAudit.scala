package graft.jobs

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries — the
  * plan-shape audit behind BENCH/BASELINE.md §plans (pushdown reaching
  * the scan, WholeStageCodegen spans, single-shuffle rollup, broadcast
  * semi-join).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(1) match {
      case Array() => Seq("q02_rollup_1m", "q13_replay_semijoin", "q26_knn_bruteforce")
      case more => more.toSeq
    }) {
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
