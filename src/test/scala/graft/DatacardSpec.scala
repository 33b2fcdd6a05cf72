package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Datacard

/** r7 additions: the datacard release artifact — exact stats, JSON
  * escaping, null conventions, order stability, source valve. */
class DatacardSpec extends SparkSuite {
  import spark.implicits._

  test("datacard: exact per-source line, header, ordering") {
    val dir = Files.createTempDirectory("graftdc").toString
    val docs = Seq(
      ("a", "xxxx", "en"), ("a", "xx", "en"), ("a", null, "de"),
      ("b", "yyy", "de")).toDF("source", "text", "lang")
    val out = Datacard.export(docs, "source", "text", "lang", dir)
      .orderBy("line_no").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("line") ==
      """{"datacard":"graft","n_sources":2,"n_docs":4}""")
    // source a: 3 docs, 1 null text, lens {2,4}: med2 = 6, top en 2/3
    assert(out(1).getAs[String]("line") ==
      """{"source":"a","n_docs":3,"null_text":1,"total_chars":6,""" +
      """"min_len":2,"med2_len":6,"max_len":4,"top_lang":"en",""" +
      """"top_lang_ppm":666666}""")
    assert(out(2).getAs[String]("line").startsWith("""{"source":"b""""))
  }

  test("datacard: odd-count median doubles the middle; quote escaping") {
    val dir = Files.createTempDirectory("graftdc2").toString
    val docs = Seq(
      ("s\"1", "a", "en"), ("s\"1", "bbb", "en"), ("s\"1", "ccccc", "en"))
      .toDF("source", "text", "lang")
    val out = Datacard.export(docs, "source", "text", "lang", dir)
      .orderBy("line_no").collect()
    val line = out(1).getAs[String]("line")
    assert(line.contains(""""source":"s\"1""""))
    assert(line.contains(""""med2_len":6""")) // middle len 3 doubled
  }

  test("datacard: all-null source column -> empty body; valve refuses") {
    val dir = Files.createTempDirectory("graftdc3").toString
    val docs = Seq((Option.empty[String], "t", "en"))
      .toDF("source", "text", "lang")
    val out = Datacard.export(docs, "source", "text", "lang", dir)
      .collect()
    assert(out.length == 1) // header only, 0 sources
    val many = spark.range(200).select(col("id").cast("string")
      .as("source"), lit("t").as("text"), lit("en").as("lang"))
    intercept[IllegalArgumentException] {
      Datacard.export(many, "source", "text", "lang", dir,
        maxSources = 100L)
    }
  }
}
