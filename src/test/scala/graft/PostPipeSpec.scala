package graft

import org.apache.spark.sql.functions._
import graft.sources.PostPipe

/** post() at the process boundary: wire-protocol pipe through external
  * executors — identity via cat, a real decode-transform-encode worker,
  * lock-step batching, and failure propagation. */
class PostPipeSpec extends SparkSuite {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toString, s"text-$i", s"s${i % 3}"))
      .toDF("id", "text", "src").repartition(3)

  private def workerCmd: Seq[String] = Seq(
    s"${System.getProperty("java.home")}/bin/java",
    "-cp", System.getProperty("java.class.path"),
    "graft.sources.PostWorker")

  test("identity through cat: frames echo back losslessly") {
    val out = PostPipe.post(docs(100), Seq("cat"), batchSize = 16)
    assert(out.count() == 100)
    val row = out.where(col("id") === "42")
      .select(col("text"), col("tags")("src")).collect()(0)
    assert(row.getString(0) == "text-42" && row.getString(1) == "s0")
  }

  test("real executor process: decode, transform, re-encode") {
    val out = PostPipe.post(docs(50), workerCmd, batchSize = 7,
      env = Map("GRAFT_POST_UPPER" -> "1"))
    val rows = out.select("id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == 50)
    assert(rows("7") == "TEXT-7")
    // non-text fields survive the decode/encode loop
    assert(PostPipe.post(docs(50), workerCmd, batchSize = 7)
      .where(col("tags")("src") === "s1").count() == 17)
  }

  test("failing executor fails the job") {
    val e = intercept[org.apache.spark.SparkException] {
      PostPipe.post(docs(10), Seq("false")).count()
    }
    assert(e.getMessage != null)
  }

  test("empty partitions spawn no process; batch edges are exact") {
    val one = Seq(("a", "t", "s")).toDF("id", "text", "src").repartition(8)
    assert(PostPipe.post(one, Seq("cat"), batchSize = 1).count() == 1)
    // batchSize larger than the partition
    assert(PostPipe.post(docs(5), Seq("cat"), batchSize = 100).count() == 5)
  }
}
