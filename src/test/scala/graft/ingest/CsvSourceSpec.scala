package graft.ingest

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

/** Mirrors the reference's scenario fixtures
  * (`/root/reference/tests/` scenario CSVs) retargeted to the transcript
  * schema: standard, different_delimiter, quoted_values, the three
  * timestamp formats, invalid_data_types, missing_values,
  * extra_columns, missing declared column, empty_csv.
  */
class CsvSourceSpec extends SparkTestBase {

  private def write(name: String, content: String): String = {
    val p = Paths.get(tmpDir(name), s"$name.csv")
    Files.writeString(p, content)
    p.toString
  }

  test("standard: header + typed parse, ISO timestamps") {
    val path = write("std",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,hello,,2024-03-01T10:00:00
        |c1,1,assistant,hi there,search,2024-03-01T10:00:30
        |c2,0,user,question,,2024-03-01T11:00:00""".stripMargin)
    val (valid, rejects) = CsvSource.read(spark, path)
    assert(valid.count() == 3 && rejects.count() == 0)
    val r = valid.orderBy("conv_id", "turn_idx").collect()
    assert(r(0).getAs[String]("conv_id") == "c1" && r(0).getAs[Int]("turn_idx") == 0)
    assert(r(1).getAs[String]("tool") == "search")
    assert(r(0).getAs[java.sql.Timestamp]("ts").toInstant.toString == "2024-03-01T10:00:00Z")
  }

  test("different delimiter and quoted values containing it") {
    val path = write("delim",
      """conv_id;turn_idx;role;text;tool;ts
        |c1;0;user;"hello; world";;2024-03-01T10:00:00
        |c1;1;assistant;"say ""hi"" twice";;2024-03-01T10:01:00""".stripMargin)
    val (valid, rejects) = CsvSource.read(spark, path, CsvSource.Options(delimiter = ";"))
    assert(valid.count() == 2 && rejects.count() == 0)
    val texts = valid.orderBy("turn_idx").collect().map(_.getAs[String]("text"))
    assert(texts(0) == "hello; world")
    assert(texts(1) == "say \"hi\" twice")
  }

  test("unix timestamps are SECONDS multiplied to millis (CsvColumn.java:121)") {
    val path = write("unix",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,x,,1709287200""".stripMargin)
    val (valid, _) = CsvSource.read(spark, path, CsvSource.Options(tsFormat = CsvSource.Unix))
    assert(valid.head().getAs[java.sql.Timestamp]("ts").getTime == 1709287200000L)
  }

  test("custom timestamp pattern, pinned UTC") {
    val path = write("custom",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,x,,01/03/2024 10:00""".stripMargin)
    val (valid, _) = CsvSource.read(spark, path,
      CsvSource.Options(tsFormat = CsvSource.Custom("dd/MM/yyyy HH:mm")))
    assert(valid.head().getAs[java.sql.Timestamp]("ts").toInstant.toString == "2024-03-01T10:00:00Z")
  }

  test("custom pattern with a declared deployment zone lands at the zone's instant") {
    // the explicit-knob form of the reference's ZoneId.systemDefault()
    // (CsvColumn.java:128-131): wall-clock values from a Paris
    // deployment convert through tzdb rules — +01:00 in winter, +02:00
    // across the DST switch — instead of being pinned UTC
    val path = write("customzone",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,winter,,01/03/2024 10:00
        |c1,1,user,summer,,01/07/2024 10:00""".stripMargin)
    val (valid, _) = CsvSource.read(spark, path,
      CsvSource.Options(tsFormat = CsvSource.Custom("dd/MM/yyyy HH:mm", "Europe/Paris")))
    val byText = valid.collect()
      .map(r => r.getAs[String]("text") ->
        r.getAs[java.sql.Timestamp]("ts").toInstant.toString).toMap
    assert(byText == Map(
      "winter" -> "2024-03-01T09:00:00Z",
      "summer" -> "2024-07-01T08:00:00Z"), s"got $byText")
    // bad zone ids fail at PLAN time, not as task failures mid-batch
    intercept[IllegalArgumentException](CsvSource.read(spark, path,
      CsvSource.Options(tsFormat = CsvSource.Custom("dd/MM/yyyy HH:mm", "Not/AZone"))))
  }

  test("invalid values reject the ROW, never the batch (CSVReader.java:199-204)") {
    val path = write("badvals",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,good,,2024-03-01T10:00:00
        |c1,not_a_number,user,bad idx,,2024-03-01T10:01:00
        |c1,2,user,bad ts,,invalid_timestamp
        |,3,user,null conv,,2024-03-01T10:03:00""".stripMargin)
    val (valid, rejects) = CsvSource.read(spark, path)
    assert(valid.count() == 1)
    val why = rejects.collect().map(_.getAs[String]("reject_reason")).sorted
    assert(why.toSeq == Seq("bad ts", "bad turn_idx", "null conv_id"))
  }

  test("ISO acceptance is pinned to ISO_DATE_TIME shapes (CsvColumn.java:123-126)") {
    // date-only and space-separated forms parse under Spark's bare
    // try_to_timestamp but are REJECTED rows in the reference — the
    // valid/reject split must match the reference contract
    val path = write("isopin",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,t-form,,2024-03-01T10:00:00
        |c1,1,user,fraction,,2024-03-01T10:00:00.123
        |c1,2,user,offset,,2024-03-01T10:00:00+01:00
        |c1,3,user,zulu,,2024-03-01T10:00:00Z
        |c1,4,user,minutes-only,,2024-03-01T10:00
        |c1,5,user,date-only,,2024-03-01
        |c1,6,user,space-form,,2024-03-01 10:00:00
        |c1,7,user,hour-offset,,2024-03-01T10:00:00+01
        |c1,8,user,sec-offset,,2024-03-01T10:00:00+01:00:30""".stripMargin)
    val (valid, rejects) = CsvSource.read(spark, path)
    assert(valid.count() == 7, s"want 7 accepted, got ${valid.count()}")
    val rej = rejects.collect().map(r => r.getAs[String]("text") -> r.getAs[String]("reject_reason"))
    assert(rej.toSet == Set("date-only" -> "bad ts", "space-form" -> "bad ts"), s"got ${rej.toSeq}")
    // the offset form lands at the correct UTC instant
    val off = valid.filter(org.apache.spark.sql.functions.col("text") === "offset").head()
    assert(off.getAs[java.sql.Timestamp]("ts").toInstant.toString == "2024-03-01T09:00:00Z")
  }

  test("zone-region suffix [Europe/Paris] parses at the OFFSET's instant (ISO_DATE_TIME parity)") {
    // DateTimeFormatter.ISO_DATE_TIME accepts `...+01:00[Europe/Paris]`
    // (CsvColumn.java:123-126): the bracket section rides after an
    // offset-id (so the instant is fully determined by the offset) and
    // is stripped here — a migration from zoned ISO data ingests the
    // same rows the reference does. The region NAME is tzdb-validated
    // like the formatter's appendZoneRegionId(): a corrupt suffix
    // (`[No/Such_Zone]`) REJECTS the row instead of silently
    // ingesting data the reference would have quarantined; a bare
    // bracket with no offset is not an ISO_DATE_TIME shape and still
    // rejects.
    val path = write("isozone",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,plain-offset,,2024-03-01T10:00:00+01:00
        |c1,1,user,zone-region,,2024-03-01T10:00:00+01:00[Europe/Paris]
        |c1,2,user,zulu-region,,2024-03-01T10:00:00Z[Europe/Paris]
        |c1,3,user,no-offset-region,,2024-03-01T10:00:00[Europe/Paris]
        |c1,4,user,bad-region,,2024-03-01T10:00:00+01:00[No/Such_Zone]""".stripMargin)
    val (valid, rejects) = CsvSource.read(spark, path)
    val byText = valid.collect()
      .map(r => r.getAs[String]("text") ->
        r.getAs[java.sql.Timestamp]("ts").toInstant.toString).toMap
    assert(byText("zone-region") == "2024-03-01T09:00:00Z",
      s"region suffix must honor the offset: $byText")
    assert(byText("zone-region") == byText("plain-offset"))
    assert(byText("zulu-region") == "2024-03-01T10:00:00Z")
    val rej = rejects.collect().map(r => r.getAs[String]("text") -> r.getAs[String]("reject_reason"))
    assert(rej.toSet == Set("no-offset-region" -> "bad ts",
      "bad-region" -> "bad ts"), s"got ${rej.toSeq}")
  }

  test("absurd unix epoch overflows to a REJECTED row, not a failed batch (ANSI)") {
    // try_cast('999999999999999999' AS long) succeeds (~1e18) but the
    // ×1000 overflows long — under Spark 4's default ANSI a plain
    // multiply THROWS and kills the batch; try_multiply nulls it and
    // the ROW rejects (documented deviation: the reference's
    // Long.parseLong(v) * 1000 silently WRAPS to a garbage timestamp)
    val path = write("overflow",
      """conv_id,turn_idx,role,text,tool,ts
        |c1,0,user,ok,,1709286400
        |c1,1,user,huge,,999999999999999999""".stripMargin)
    val (valid, rejects) = CsvSource.read(spark, path,
      CsvSource.Options(tsFormat = CsvSource.Unix))
    assert(valid.count() == 1, s"got ${valid.count()} valid")
    val rej = rejects.collect()
    assert(rej.length == 1 && rej.head.getAs[String]("text") == "huge")
  }

  test("missing optional values tolerated; extra undeclared columns ignored") {
    val path = write("extra",
      """conv_id,turn_idx,role,text,tool,ts,undeclared1,undeclared2
        |c1,0,user,,,2024-03-01T10:00:00,junk,morejunk""".stripMargin)
    val (valid, rejects) = CsvSource.read(spark, path)
    assert(valid.count() == 1 && rejects.count() == 0)
    val r = valid.head()
    assert(r.getAs[String]("text") == null && r.getAs[String]("tool") == null)
    assert(!valid.columns.contains("undeclared1"))
  }

  test("missing declared column fails fast (ConfigValidator-style)") {
    val path = write("missingcol",
      """conv_id,turn_idx,role,text,ts
        |c1,0,user,x,2024-03-01T10:00:00""".stripMargin)
    val e = intercept[IllegalArgumentException](CsvSource.read(spark, path))
    assert(e.getMessage.contains("tool"))
  }

  test("empty csv (header only) yields zero rows on both sides") {
    val path = write("empty", "conv_id,turn_idx,role,text,tool,ts\n")
    val (valid, rejects) = CsvSource.read(spark, path)
    assert(valid.count() == 0 && rejects.count() == 0)
  }
}
