package graft

import graft.schema.{Doc, NamedScore}
import graft.sources.BinaryCodec

/** Wire-spec fixtures for the binary codec: the expected bytes below are
  * HAND-DERIVED from the public protobuf wire format specification
  * (https://protobuf.dev/programming-guides/encoding/ — varint tags
  * `(field<<3)|wire`, little-endian fixed32/64, length-delimited
  * submessages) plus the reference's field numbers
  * (docarray/proto/docarray.proto:63-123) and stream framing
  * (io/binary.py:114-118, porting.py:169-177). They are NOT produced by
  * the codec under test, so writer and reader are each validated against
  * an independent encoding of the spec — the closest available substitute
  * for reference-written bytes while `google.protobuf` is absent from the
  * container (retried and documented every round).
  */
class WireFixtureSpec extends SparkSuite {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  // DocumentProto for Doc(id="a", text="hi", granularity=1,
  // parent_id="p", weight=0.5, embedding=[1.0,-2.0], tags={"k":"v"}),
  // fields in the writer's emission order (ascending field number):
  private val doc1 = hex(
    // id=1, wire 2 (LEN): tag 0x0A, len 1, "a"
    "0A 01 61 " +
    // text=4, wire 2: tag 0x22, len 2, "hi"
    "22 02 68 69 " +
    // granularity=5, wire 0 (VARINT): tag 0x28, value 1
    "28 01 " +
    // parent_id=7, wire 2: tag 0x3A, len 1, "p"
    "3A 01 70 " +
    // weight=8, wire 5 (I32): tag 0x45, 0.5f little-endian
    "45 00 00 00 3F " +
    // embedding=16, wire 2: tag is the 2-byte varint 0x82 0x01
    // ((16<<3)|2 = 130); NdArrayProto{ dense=1 { buffer=1 (8 bytes:
    // 1.0f, -2.0f LE), shape=2 varint 2, dtype=3 "float32" } }
    "82 01 17 " +
    "0A 15 " +
    "0A 08 00 00 80 3F 00 00 00 C0 " +
    "10 02 " +
    "1A 07 66 6C 6F 61 74 33 32 " +
    // tags=17 google.protobuf.Struct: tag 0x8A 0x01 ((17<<3)|2 = 138);
    // Struct{ fields=1 entry{ key=1 "k", value=2 Value{ string_value=3
    // "v" } } }
    "8A 01 0A " +
    "0A 08 " +
    "0A 01 6B " +
    "12 03 1A 01 76")

  // stream framing: 1-byte version, 8-byte big-endian doc count, then
  // per doc a 4-byte big-endian length prefix
  private val stream1 =
    hex("01 00 00 00 00 00 00 00 01 00 00 00 38") ++ doc1

  test("writer emits the hand-derived wire bytes exactly") {
    val df = Seq(Doc(id = "a", parent_id = "p", granularity = 1,
      text = "hi", weight = 0.5f, embedding = Seq(1.0f, -2.0f),
      tags = Map("k" -> "v"))).toDF()
    val got = BinaryCodec.toBytes(df)
    assert(got.length == stream1.length,
      s"length ${got.length} != ${stream1.length}")
    assert(got.sameElements(stream1),
      s"byte mismatch at ${got.zip(stream1).indexWhere(p => p._1 != p._2)}")
  }

  test("reader accepts a spec-valid stream the writer would never emit") {
    // Same spec, adversarial encoding: fields out of order, an unknown
    // field to skip, a multi-byte varint, NON-packed repeated fixed32
    // location entries, a float64 NdArray buffer, a numeric Struct
    // value, and a NamedScore map entry.
    val doc2 = hex(
      // unknown field 25, wire 2 ((25<<3)|2 = 202 → 0xCA 0x01): skipped
      "CA 01 03 AA BB CC " +
      // parent_id BEFORE id (field order is not semantic in protobuf)
      "3A 01 70 " +
      "0A 01 61 " +
      // adjacency=6 varint 300 (0xAC 0x02 — multi-byte)
      "30 AC 02 " +
      // blob=2 (content oneof), 2 bytes
      "12 02 DE AD " +
      // location=13 as UNPACKED repeated fixed32 ((13<<3)|5 = 0x6D):
      // 1.5f then 2.5f
      "6D 00 00 C0 3F 6D 00 00 20 40 " +
      // embedding=16: dense buffer dtype float64 (values 0.25, -1.0 as
      // LE doubles; reader converts to float)
      "82 01 1F " +
      "0A 1D " +
      "0A 10 00 00 00 00 00 00 D0 3F 00 00 00 00 00 00 F0 BF " +
      "10 02 " +
      "1A 07 66 6C 6F 61 74 36 34 " +
      // tags=17 Struct with Value.number_value=2 (wire 1, fixed64
      // double 3.0) under key "n" — stringified to "3" on read
      "8A 01 10 " +
      "0A 0E " +
      "0A 01 6E " +
      "12 09 11 00 00 00 00 00 00 08 40 " +
      // scores=18 ((18<<3)|2 = 146 → 0x92 0x01): key "s", NamedScore{
      // value=1 fixed32 1.0f, op_name=2 "o" }
      "92 01 0D " +
      "0A 01 73 " +
      "12 08 0D 00 00 80 3F 12 01 6F")
    val stream2 =
      hex("01 00 00 00 00 00 00 00 01") ++
      hex(f"00 00 00 ${doc2.length}%02X") ++ doc2
    val b64 = java.util.Base64.getEncoder.encodeToString(stream2)
    val rows = BinaryCodec.fromBase64(spark, b64).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "a" && r.getString(1) == "p")
    assert(r.getInt(3) == 300) // adjacency
    assert(r.getAs[Array[Byte]](4).sameElements(Array(0xDE.toByte, 0xAD.toByte)))
    assert(r.getSeq[Float](13) == Seq(1.5f, 2.5f)) // location
    assert(r.getSeq[Float](14) == Seq(0.25f, -1.0f)) // embedding (f64→f32)
    assert(r.getMap[String, String](10) == Map("n" -> "3")) // tags
    val s = r.getMap[String, org.apache.spark.sql.Row](17)("s")
    assert(s.getFloat(0) == 1.0f && s.getString(1) == "o")
  }

  // GOLDEN multi-doc fixture (r7, the closest substitute for
  // reference-produced bytes while google.protobuf stays uninstallable —
  // pip retried r7: zero egress, Name or service not known): one stream
  // exercising every structural feature of docarray.proto at once —
  // TWO framed top-level docs, a NESTED chunk (field 14 recursion), a
  // SPARSE COO embedding (SparseNdArrayProto: [N,ndims] int64 indices +
  // values + shape, python-protobuf PACKED repeated uint32), a scores
  // map entry with ref_id, and an evaluations map entry. Every length
  // byte below was derived by hand from the wire spec, bottom-up.
  private val goldenDocA = hex(
    "0A 02 78 31 " + // id "x1"
    "22 02 61 62 " + // text "ab"
    "72 49 " +       // chunks (field 14), nested DocumentProto len 73
      "0A 02 63 31 " +   // chunk id "c1"
      "28 01 " +         // granularity 1
      "3A 02 78 31 " +   // parent_id "x1"
      "82 01 3C " +      // embedding: NdArrayProto len 60
        "12 3A " +       //   sparse: SparseNdArrayProto len 58
          "0A 1D " +     //     indices: DenseNdArrayProto len 29
            "0A 10 00 00 00 00 00 00 00 00 03 00 00 00 00 00 00 00 " +
            "12 02 02 01 " +          // shape packed [2,1] = [N,ndims]
            "1A 05 69 6E 74 36 34 " + // dtype "int64"
          "12 16 " +     //     values: DenseNdArrayProto len 22
            "0A 08 00 00 C0 3F 00 00 00 C0 " + // [1.5f, -2.0f]
            "12 01 02 " +                      // shape packed [2]
            "1A 07 66 6C 6F 61 74 33 32 " +    // dtype "float32"
          "1A 01 04 " +  //     sparse shape packed [4]
    "92 01 16 " +    // scores (field 18) map entry len 22
      "0A 03 72 65 6C " + // key "rel"
      "12 0F " +          // NamedScoreProto len 15
        "0D 00 00 80 3E " +    // value 0.25f
        "12 04 62 6D 32 35 " + // op_name "bm25"
        "22 02 78 32")         // ref_id "x2"

  private val goldenDocB = hex(
    "0A 02 78 32 " + // id "x2"
    "12 02 01 02 " + // blob (content oneof) 2 bytes
    "82 01 14 " +    // embedding: NdArrayProto len 20
      "0A 12 " +     //   dense: DenseNdArrayProto len 18
        "0A 04 00 00 00 3F " +          // [0.5f]
        "12 01 01 " +                   // shape packed [1]
        "1A 07 66 6C 6F 61 74 33 32 " + // dtype "float32"
    "9A 01 0F " +    // evaluations (field 19) map entry len 15
      "0A 03 70 40 31 " + // key "p@1"
      "12 08 " +          // NamedScoreProto len 8
        "0D 00 00 80 3F " + // value 1.0f
        "1A 01 64")         // description "d"

  private val goldenStream =
    hex("01 00 00 00 00 00 00 00 02") ++  // version 1, count 2 (BE)
    hex("00 00 00 6C") ++ goldenDocA ++   // frame length 108 (BE)
    hex("00 00 00 31") ++ goldenDocB      // frame length 49 (BE)

  test("golden multi-doc stream: nested chunk + sparse COO + score maps") {
    assert(goldenDocA.length == 0x6C && goldenDocB.length == 0x31)
    val dir = java.nio.file.Files.createTempDirectory("golden").toFile
    val f = new java.io.File(dir, "golden.bin")
    val out = new java.io.FileOutputStream(f)
    out.write(goldenStream); out.close()
    val rows = BinaryCodec.loadBinary(spark, f.getAbsolutePath)
      .orderBy("id").collect()
    assert(rows.length == 3) // x1, c1 (normalized child row), x2
    val Array(c1, x1, x2) = rows
    assert(x1.getString(0) == "x1" && x1.getString(7) == "ab")
    val sc = x1.getMap[String, org.apache.spark.sql.Row](17)("rel")
    assert(sc.getFloat(0) == 0.25f && sc.getString(1) == "bm25" &&
      sc.getString(3) == "x2")
    assert(c1.getString(0) == "c1" && c1.getString(1) == "x1" &&
      c1.getInt(2) == 1)
    // sparse COO [N=2,ndims=1] indices (0,3), values (1.5,-2) over [4]
    assert(c1.getSeq[Float](14) == Seq(1.5f, 0.0f, 0.0f, -2.0f))
    assert(x2.getString(0) == "x2" &&
      x2.getAs[Array[Byte]](4).sameElements(Array(1.toByte, 2.toByte)))
    assert(x2.getSeq[Float](14) == Seq(0.5f))
    val ev = x2.getMap[String, org.apache.spark.sql.Row](16)("p@1")
    assert(ev.getFloat(0) == 1.0f && ev.getString(2) == "d")
    // and the writer round-trips the golden semantics (not bytes — the
    // writer re-nests children and packs differently)
    val again = BinaryCodec.fromBase64(spark,
      java.util.Base64.getEncoder.encodeToString(BinaryCodec.toBytes(
        BinaryCodec.loadBinary(spark, f.getAbsolutePath))))
    assert(again.count() >= 2) // top-levels survive re-encode
  }

  test("hand-derived stream round-trips through read → write → read") {
    // the reader's output re-encoded must parse to the same flat row
    // (byte identity is NOT required — the writer packs location and
    // re-encodes float32 — but the semantics must be stable)
    val df = BinaryCodec.fromBase64(spark,
      java.util.Base64.getEncoder.encodeToString(stream1))
    val again = BinaryCodec.fromBase64(spark,
      java.util.Base64.getEncoder.encodeToString(BinaryCodec.toBytes(df)))
    val a = df.collect()(0); val b = again.collect()(0)
    assert(a == b)
    assert(b.getString(0) == "a" && b.getString(7) == "hi" &&
      b.getSeq[Float](14) == Seq(1.0f, -2.0f) &&
      b.getMap[String, String](10) == Map("k" -> "v"))
  }
}
