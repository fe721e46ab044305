package graft.streaming

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkTestBase {

  test("streaming exact dedup drops duplicates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Timestamp)]
    val stream = ms.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.exact(stream, watermarkDelay = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup")
      .start()
    try {
      val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
      def at(min: Int) = Timestamp.valueOf(f"2024-03-01 10:$min%02d:00")
      // batch 1: in-batch duplicate of "aaa"
      ms.addData((1L, "aaa", t0), (2L, "bbb", t0), (3L, "aaa", at(1)))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate of "aaa" (within watermark) + new doc
      ms.addData((4L, "aaa", at(5)), (5L, "ccc", at(5)))
      q.processAllAvailable()
      val out = spark.table("sdedup").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      assert(out.length == 3, s"got ${out.toSeq}")
      assert(out.map(_._2).sorted.toSeq == Seq("aaa", "bbb", "ccc"))
      // the FIRST occurrence is the one kept
      assert(out.toMap.get(1L).contains("aaa") && !out.map(_._1).contains(3L)
        && !out.map(_._1).contains(4L))
    } finally q.stop()
  }
}
