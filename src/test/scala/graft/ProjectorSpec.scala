package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Projector

/** TensorBoard projector export: file shapes per the projector format
  * rules, metadata header behavior, valve refusal, layout invariance,
  * and the read-back audit being the actual on-disk bytes. */
class ProjectorSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("projspec").toString

  private val docs = Seq(
    (3L, Seq(0.25f, -1.5f), "en", "web"),
    (1L, Seq(1.0f, 2.0f), "de", "book"),
    (2L, Seq(0.0f, 0.5f), "en", "web")).toDF("id", "vec", "lang", "src")

  test("single label column: no metadata header; rows ordered by id") {
    val dir = tmp()
    val out = Projector.exportEmbeddings(docs, "id", "vec", Seq("lang"),
      dir, quantPpm = true)
    val vec = out.where(col("file") === "vectors.tsv")
      .orderBy("line_no").select("line").as[String].collect().toSeq
    assert(vec == Seq("1000000\t2000000", "0\t500000", "250000\t-1500000"))
    val meta = out.where(col("file") === "metadata.tsv")
      .orderBy("line_no").select("line").as[String].collect().toSeq
    assert(meta == Seq("de", "en", "en")) // id order, NO header
    val cfg = new String(Files.readAllBytes(
      Paths.get(dir, "projector_config.pbtxt")))
    assert(cfg.contains("tensor_path: \"vectors.tsv\"") &&
      cfg.contains("metadata_path: \"metadata.tsv\""))
  }

  test("multiple label columns get a tab-joined header row") {
    val out = Projector.exportEmbeddings(docs, "id", "vec",
      Seq("lang", "src"), tmp())
    val meta = out.where(col("file") === "metadata.tsv")
      .orderBy("line_no").select("line").as[String].collect().toSeq
    assert(meta == Seq("lang\tsrc", "de\tbook", "en\tweb", "en\tweb"))
  }

  test("default mode writes the float's string repr; layout-invariant") {
    val dir = tmp()
    val a = Projector.exportEmbeddings(docs, "id", "vec", Seq("lang"), dir)
      .collect().toSet
    val firstVec = a.find(r =>
      r.getString(0) == "vectors.tsv" && r.getInt(1) == 1).get.getString(2)
    assert(firstVec == "1.0\t2.0")
    val b = Projector.exportEmbeddings(docs.repartition(5), "id", "vec",
      Seq("lang"), tmp()).collect().toSet
    assert(a == b)
  }

  test("the maxRows valve refuses an over-bound export loudly") {
    val e = intercept[IllegalArgumentException] {
      Projector.exportEmbeddings(docs, "id", "vec", Seq("lang"), tmp(),
        maxRows = 2)
    }
    assert(e.getMessage.contains("sample/coreset"))
  }

  test("readBack returns the bytes on disk, not the plan's view") {
    val dir = tmp()
    Projector.exportEmbeddings(docs, "id", "vec", Seq("lang"), dir,
      quantPpm = true)
    // tamper with the artifact; readBack must see the tampered line
    Files.write(Paths.get(dir, "metadata.tsv"), "XX\nYY\nZZ\n".getBytes)
    val meta = Projector.readBack(spark, dir)
      .where(col("file") === "metadata.tsv")
      .orderBy("line_no").select("line").as[String].collect().toSeq
    assert(meta == Seq("XX", "YY", "ZZ"))
  }

  test("null vectors drop; facade wires idCol through") {
    val withNull = docs.unionByName(
      Seq((9L, null.asInstanceOf[Seq[Float]], "fr", "web"))
        .toDF("id", "vec", "lang", "src"))
    val out = DocArray(withNull, idCol = "id")
      .exportProjector(tmp(), Seq("lang"), vecCol = "vec")
    assert(out.where(col("file") === "vectors.tsv").count() == 3)
  }
}
