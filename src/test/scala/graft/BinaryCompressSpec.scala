package graft

import java.nio.file.{Files, Paths}

import graft.schema.Doc
import graft.sources.BinaryCodec

/** r7 binary-format extensions: protobuf-array protocol, gzip/zlib
  * compression (the JDK-native subset of the reference's compress set),
  * and the `name.$protocol[.$compress]` filename convention. */
class BinaryCompressSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    Doc(id = "a", text = "hello", weight = 0.5f,
      embedding = Seq(1.0f, -2.0f), tags = Map("k" -> "v")),
    Doc(id = "b", parent_id = "a", granularity = 1, text = "world"))
    .toDF()

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(7))).toSet

  test("protobuf-array round-trips; repeated field 1 framing") {
    val bytes = BinaryCodec.toBytesArray(docs)
    // no stream header: first byte is the field-1 LEN tag 0x0A
    assert(bytes(0) == 0x0A)
    val back = BinaryCodec.fromBytesArray(spark, bytes)
    assert(key(back) == Set(("a", "hello"), ("b", "world")))
  }

  test("gzip and zlib round-trip on both protocols") {
    for (algo <- Seq("gzip", "zlib")) {
      val arr = BinaryCodec.toBytesArray(docs, Some(algo))
      assert(key(BinaryCodec.fromBytesArray(spark, arr, Some(algo))) ==
        Set(("a", "hello"), ("b", "world")), s"array/$algo")
      val stream = BinaryCodec.toBytes(docs, Some(algo))
      // stream header stays UNCOMPRESSED; frames compress individually
      assert(stream(0) == 1.toByte, s"stream/$algo header")
      val dir = Files.createTempDirectory("bc").toString
      val p = Paths.get(dir, s"arr.protobuf.$algo")
      Files.write(p, stream)
      assert(key(BinaryCodec.loadBinaryAuto(spark, p.toString)) ==
        Set(("a", "hello"), ("b", "world")), s"stream/$algo")
    }
  }

  test("filename convention picks protocol and compression") {
    val dir = Files.createTempDirectory("bc2").toString
    val cases = Seq(
      ("arr.protobuf", "protobuf", None),
      ("arr.protobuf.gzip", "protobuf", Some("gzip")),
      ("arr.protobuf-array", "protobuf-array", None),
      ("arr.protobuf-array.zlib", "protobuf-array", Some("zlib")),
      ("plain.bin", "protobuf", None))
    for ((name, _, _) <- cases.take(4)) {
      val p = Paths.get(dir, name).toString
      BinaryCodec.saveBinaryAuto(docs, p)
      assert(key(BinaryCodec.loadBinaryAuto(spark, p)) ==
        Set(("a", "hello"), ("b", "world")), name)
    }
    // unknown extension falls back to the uncompressed framed stream
    val p = Paths.get(dir, "plain.bin").toString
    BinaryCodec.saveBinaryAuto(docs, p)
    assert(Files.readAllBytes(Paths.get(p))(0) == 1.toByte)
  }

  test("unsupported algorithms refuse loudly, never misparse") {
    for (algo <- Seq("lz4", "bz2", "lzma")) {
      val e = intercept[IllegalArgumentException] {
        BinaryCodec.toBytes(docs, Some(algo))
      }
      assert(e.getMessage.contains("unsupported compress"), algo)
    }
  }

  test("compressed payloads are real compression, not passthrough") {
    val big = Seq(Doc(id = "x", text = "ab" * 4000)).toDF()
    val raw = BinaryCodec.toBytesArray(big)
    val gz = BinaryCodec.toBytesArray(big, Some("gzip"))
    assert(gz.length < raw.length / 10) // highly repetitive text
    // and an independently-gzipped whole blob decodes (JDK gzip both
    // sides, but placement — whole message vs frames — is what's tested)
    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write(raw); g.close()
    assert(key(BinaryCodec.fromBytesArray(spark, out.toByteArray,
      Some("gzip"))).contains(("x", "ab" * 4000)))
  }
}
