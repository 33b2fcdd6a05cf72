package graft

import org.apache.spark.sql.functions._
import graft.sources.Registry

/** File-based artifact registry (push/pull): versioned publish, readers
  * see only published versions, counts from shard headers, prune/delete. */
class RegistrySpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-registry-spec").toString

  private def docs(n: Int, tag: String) =
    (0 until n).map(i => (i.toString, s"text-$i", tag)).toDF("id", "text", "src")

  test("push/pull roundtrip: core fields survive, extras become tags") {
    val root = freshRoot()
    val a = Registry.push(docs(25, "v1"), root, "corpus")
    assert(a.name == "corpus" && a.version == 1 && a.count == 25)
    val back = Registry.pull(spark, root, "corpus")
    assert(back.count() == 25)
    val row = back.where(col("id") === "7")
      .select(col("text"), col("tags")("src")).collect()(0)
    assert(row.getString(0) == "text-7" && row.getString(1) == "v1")
  }

  test("versioning: second push publishes v2, pull defaults to latest") {
    val root = freshRoot()
    Registry.push(docs(10, "v1"), root, "corpus")
    val a2 = Registry.push(docs(20, "v2"), root, "corpus")
    assert(a2.version == 2 && a2.count == 20)
    assert(Registry.pull(spark, root, "corpus").count() == 20)
    assert(Registry.pull(spark, root, "corpus", version = 1).count() == 10)
    val arts = Registry.list(spark, root)
    assert(arts.map(a => (a.name, a.version, a.count)) ==
      Seq(("corpus", 1, 10L), ("corpus", 2, 20L)))
  }

  test("unpublished versions are invisible and never overwritten") {
    val root = freshRoot()
    Registry.push(docs(5, "v1"), root, "corpus")
    // simulate a push killed before its _meta.json: bare v00002 dir
    val dead = new java.io.File(s"$root/corpus/v00002")
    assert(dead.mkdirs())
    // readers skip it; the next push does NOT reuse the dead number
    assert(Registry.pull(spark, root, "corpus").count() == 5)
    val a = Registry.push(docs(7, "v3"), root, "corpus")
    assert(a.version == 3)
    assert(Registry.pull(spark, root, "corpus").count() == 7)
    assert(Registry.list(spark, root).map(_.version) == Seq(1, 3))
  }

  test("prune keeps the newest versions; delete removes the name") {
    val root = freshRoot()
    for (i <- 1 to 4) Registry.push(docs(i, s"v$i"), root, "corpus")
    Registry.prune(spark, root, "corpus", keep = 2)
    assert(Registry.list(spark, root).map(_.version) == Seq(3, 4))
    assert(Registry.pull(spark, root, "corpus", version = 4).count() == 4)
    Registry.delete(spark, root, "corpus")
    assert(Registry.list(spark, root).isEmpty)
    intercept[IllegalArgumentException] {
      Registry.pull(spark, root, "corpus")
    }
  }

  test("artifact names are validated against path tricks") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      Registry.push(docs(1, "x"), root, "../escape")
    }
    intercept[IllegalArgumentException] {
      Registry.push(docs(1, "x"), root, "a/b")
    }
  }
}
