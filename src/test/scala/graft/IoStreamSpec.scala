package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Parallel}
import graft.schema.DocSchema
import graft.sources.{Readers, Writers}
import graft.streaming.EventStream

class IoStreamSpec extends SparkSuite {
  import spark.implicits._

  test("fromCsv: field resolver + unknown columns → tags (base.py:44-66)") {
    val dir = Files.createTempDirectory("graftcsv").toFile
    val f = new java.io.File(dir, "docs.csv")
    Files.writeString(f.toPath,
      "question,answer,url\nwhat,that,http://x\nwho,him,http://y\n")
    val docs = Readers.fromCsv(spark, f.getPath,
      fieldResolver = Map("question" -> "text", "url" -> "uri"))
    assert(docs.schema.fieldNames.toSet == DocSchema.flat.fieldNames.toSet)
    val row = docs.orderBy("text").select("text", "uri", "tags").collect()(1)
    assert(row.getString(0) == "who")
    assert(row.getString(1) == "http://y")
    assert(row.getMap[String, String](2).get("answer").contains("him"))
  }

  test("fromFiles: binaryFile glob → uri/blob/mime docs; content_type view") {
    val dir = Files.createTempDirectory("graftfiles").toFile
    Files.write(new java.io.File(dir, "a.png").toPath, Array[Byte](1, 2))
    Files.writeString(new java.io.File(dir, "b.txt").toPath, "hi")
    val docs = Readers.fromFiles(spark, dir.getPath + "/*")
    assert(docs.count() == 2)
    val byMime = docs.select("mime_type", "blob").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).length).toMap
    assert(byMime == Map("image/png" -> 2, "text/plain" -> 2))
    val ct = DocSchema.contentType(docs).select("content_type").distinct()
      .as[String].collect().toSet
    assert(ct == Set("blob"))
    // from_files option parity (generators.py:56-126)
    val noPng = Readers.fromFiles(spark, dir.getPath + "/*",
      excludeRegex = Some(".*\\.png$"))
    assert(noPng.select("mime_type").as[String].collect().toSeq
      == Seq("text/plain"))
    assert(Readers.fromFiles(spark, dir.getPath + "/*",
      size = Some(1)).count() == 1)
    assert(Readers.fromFiles(spark, dir.getPath + "/*",
      samplingRate = 0.0).count() == 0)
    val dUri = Readers.fromFiles(spark, dir.getPath + "/*",
      toDataUri = true, excludeRegex = Some(".*\\.png$"))
      .select("uri").as[String].collect()(0)
    assert(dUri == "data:text/plain;base64,aGk=") // "hi"
  }

  test("fromLines + parquet round trip") {
    val dir = Files.createTempDirectory("graftl").toFile
    Files.writeString(new java.io.File(dir, "x.txt").toPath, "l1\nl2\nl3\n")
    val docs = Readers.fromLines(spark, dir.getPath + "/x.txt")
    assert(docs.count() == 3)
    val out = dir.getPath + "/pq"
    Writers.toParquet(docs, out)
    assert(Readers.fromParquet(spark, out).count() == 3)
  }

  test("toCsv flattens tags to tag__k columns (io/csv.py:35-89)") {
    val dir = Files.createTempDirectory("graftw").toFile
    val docs = DocSchema.fromColumns(
      Seq(("t1", "v1"), ("t2", "v2")).toDF("text", "k"))
    Writers.toCsv(docs, dir.getPath + "/out")
    val back = spark.read.option("header", "true").csv(dir.getPath + "/out")
    assert(back.columns.contains("tag__k"))
    assert(back.select("tag__k").as[String].collect().sorted.toSeq == Seq("v1", "v2"))
  }

  test("DocSchema.empty generates ids, fromColumns catches extras") {
    val e = DocSchema.empty(spark, 5)
    assert(e.count() == 5)
    assert(e.select("id").distinct().count() == 5)
  }

  test("Dataset[Doc] typed round trip through the flat schema") {
    import graft.schema.{Doc, NamedScore}
    val ds = Seq(
      Doc(id = "a", text = "hello", embedding = Seq(1.0f, 2.0f),
        tags = Map("k" -> "v"),
        scores = Map("cos" -> NamedScore(0.5f, "knn", "", "b"))),
      Doc(id = "b")).toDS()
    assert(ds.count() == 2)
    val back = ds.toDF().where(col("id") === "a").as[Doc].collect()(0)
    assert(back.text == "hello")
    assert(back.scores("cos").value == 0.5f)
    assert(back.embedding == Seq(1.0f, 2.0f))
  }

  test("multimodal: resize / windows / normalize plumbing on real decode") {
    // synthesize an 8×8 RGB tensor, PNG-encode it, then run the pipeline on
    // the real ImageIO decode of those bytes
    val df = spark.range(1).toDF("id")
      .withColumn("values", transform(sequence(lit(0), lit(191)),
        i => (i % 256).cast("float")))
      .withColumn("blob", Multimodal.encodeImage(
        $"values", array(lit(8), lit(8), lit(3)), lit("png")))
      .withColumn("tensor", Multimodal.decodeImage($"blob", lit(0), lit(0)))
    val r = df.withColumn("small", Multimodal.resizeNearest(
        $"tensor.values", $"tensor.shape", lit(4), lit(4)))
      .withColumn("patches", Multimodal.slidingWindows(
        $"tensor.values", $"tensor.shape", lit(4), lit(4)))
      .select($"small.shape".as("shape"), size($"patches").as("np"),
        $"tensor.values".as("decoded"), $"values")
      .collect()(0)
    assert(r.getSeq[Int](0) == Seq(4, 4, 3))
    assert(r.getInt(1) == 4) // 8x8 with 4-stride windows → 2x2
    // PNG round-trip is lossless: decoded bytes equal the source tensor
    assert(r.getSeq[Float](2) == r.getSeq[Float](3))
  }

  test("image decode: reference png fixture decodes to HWC uint8 RGB") {
    val bytes = Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/unit/document/toydata/test.png"))
    val df = Seq(("a", bytes)).toDF("id", "blob")
      .withColumn("t", Multimodal.decodeImage($"blob", lit(0), lit(0)))
      .withColumn("t64", Multimodal.decodeImage($"blob", lit(64), lit(32)))
      .select($"t.shape", $"t.dtype", $"t.values", $"t64.shape").collect()(0)
    assert(df.getSeq[Int](0) == Seq(85, 152, 3)) // png header says 152×85 RGB
    assert(df.getString(1) == "uint8")
    val vals = df.getSeq[Float](2)
    assert(vals.length == 85 * 152 * 3)
    assert(vals.forall(v => v >= 0 && v <= 255 && v == v.floor))
    assert(df.getSeq[Int](3) == Seq(64, 32, 3))
  }

  test("wav decode: reference fixture matches python wave module ground truth") {
    val bytes = Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/tests/unit/document/toydata/hello.wav"))
    val r = Seq(("a", bytes)).toDF("id", "blob")
      .withColumn("t", Multimodal.decodeWav($"blob"))
      .select($"t.shape", $"t.values").collect()(0)
    // ground truth read driver-side with python's stdlib wave module:
    // 30833 mono int16 frames, first 6 = [-20,-20,-27,-16,-20,-35], Σ=-157249
    assert(r.getSeq[Int](0) == Seq(30833))
    val pcm = r.getSeq[Float](1).map(v => math.round(v * 32768.0f))
    assert(pcm.take(6) == Seq(-20, -20, -27, -16, -20, -35))
    assert(pcm.map(_.toLong).sum == -157249L)
  }

  test("wav encode/decode round-trip, mono and stereo") {
    val mono = Array.tabulate(100)(i => ((i * 37) % 4096 - 2048) / 32768.0f)
    val stereo = Array.tabulate(200)(i => ((i * 53) % 4096 - 2048) / 32768.0f)
    val df = Seq((mono.toSeq, Seq(100), "m"), (stereo.toSeq, Seq(100, 2), "s"))
      .toDF("values", "shape", "kind")
      .withColumn("wav", Multimodal.encodeWav($"values", $"shape", lit(8000)))
      .withColumn("back", Multimodal.decodeWav($"wav"))
    val rows = df.select($"kind", $"back.shape", $"back.values", $"values")
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Int](1), r.getSeq[Float](2), r.getSeq[Float](3)))).toMap
    assert(rows("m")._1 == Seq(100))
    assert(rows("m")._2 == rows("m")._3)
    assert(rows("s")._1 == Seq(100, 2))
    assert(rows("s")._2 == rows("s")._3)
  }

  test("binary codec: sparse COO ndarray densifies on read (docarray.proto:34-46)") {
    import graft.sources.BinaryCodec
    // 2-D COO: (0,1)=2.5, (1,3)=-1, (1,0)=4 in a 2×4 tensor
    val bytes = BinaryCodec.encodeSparseNdArray(
      Seq(Seq(0L, 1L), Seq(1L, 3L), Seq(1L, 0L)),
      Seq(2.5f, -1.0f, 4.0f), Seq(2, 4))
    val (vals, shape, dtype) = BinaryCodec.decodeNdArray(bytes)
    assert(shape == Seq(2, 4) && dtype == "float32")
    assert(vals == Seq(0f, 2.5f, 0f, 0f, 4.0f, 0f, 0f, -1.0f))
    // 1-D sparse embedding: densified read agrees with the ml SparseVector
    // through the sparse-native merge-loop distance kernel
    val b1 = BinaryCodec.encodeSparseNdArray(
      Seq(Seq(1L), Seq(4L)), Seq(3f, 4f), Seq(6))
    val (v1, s1, _) = BinaryCodec.decodeNdArray(b1)
    assert(s1 == Seq(6) && v1 == Seq(0f, 3f, 0f, 0f, 4f, 0f))
    import org.apache.spark.ml.linalg.Vectors
    val df2 = Seq((
      Vectors.sparse(6, Array(1, 4), Array(3.0, 4.0)),
      Vectors.dense(v1.map(_.toDouble).toArray))).toDF("a", "b")
    val d = df2.select(graft.functions.ml_vector_distance($"a", $"b", "cosine")
      .as("d")).as[Double].collect()(0)
    assert(math.abs(d) < 1e-9)
  }

  test("glb decode: reference fixture vertex/face counts + coordinate sums") {
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/unit/document/toydata/test.glb"))
    val m = Seq(("g", bytes)).toDF("id", "blob")
      .select(Multimodal.decodeGlb($"blob").as("m"))
      .select($"m.n_vertices", $"m.n_faces", $"m.vertices", $"m.faces")
      .collect()(0)
    // ground truth from an independent python struct-level parse of the
    // same file: 891 VEC3 float32 vertices, 900 u32 indices (300 tris)
    assert(m.getInt(0) == 891 && m.getInt(1) == 300)
    val verts = m.getSeq[Float](2)
    val faces = m.getSeq[Int](3)
    assert(verts.length == 891 * 3 && faces.length == 900)
    assert(faces.min == 0 && faces.max == 890 && faces.map(_.toLong).sum == 403536L)
    def sumAxis(a: Int) = (a until verts.length by 3).map(i => verts(i).toDouble).sum
    assert(math.abs(sumAxis(0) - 51.901376301422715) < 1e-9)
    assert(math.abs(sumAxis(1) - 3219.9052274227142) < 1e-9)
    assert(math.abs(sumAxis(2) - (-103.50006174715236)) < 1e-9)
    // as_chunks: the fixture holds exactly one geometry
    val chunks = Seq(("g", bytes)).toDF("id", "blob")
      .select(Multimodal.decodeGlbMeshes($"blob").as("ms"))
      .select(size($"ms")).as[Int].collect()(0)
    assert(chunks == 1)
    // garbage → null
    val bad = Seq(("x", Array[Byte](1, 2, 3, 4, 5))).toDF("id", "blob")
      .select(Multimodal.decodeGlb($"blob").as("m")).collect()(0)
    assert(bad.isNullAt(0))
    // valid magic but corrupt JSON chunk → null, not a thrown task
    val corrupt = java.nio.ByteBuffer.allocate(28)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    corrupt.putInt(0x46546C67).putInt(2).putInt(28)
    corrupt.putInt(8).putInt(0x4E4F534A).put("{broken!".getBytes)
    val c = Seq(("c", corrupt.array())).toDF("id", "blob")
      .select(Multimodal.decodeGlb($"blob").as("m")).collect()(0)
    assert(c.isNullAt(0))
  }

  test("glb encode/decode round trip feeds samplePointCloud") {
    val verts = Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f)
    val faces = Array(0, 1, 2, 0, 1, 3)
    val glb = Multimodal.encodeGlbBytes(verts, faces)
    val df = Seq(("m", glb)).toDF("id", "blob")
    val m = df.select(Multimodal.decodeGlb($"blob").as("m"))
      .select($"m.vertices", $"m.faces").collect()(0)
    assert(m.getSeq[Float](0) == verts.toSeq && m.getSeq[Int](1) == faces.toSeq)
    // u32 index branch: synthetic face index forced past the u16 range
    val bigVerts = Array.fill(3 * 70000)(0f)
    val bigGlb = Multimodal.encodeGlbBytes(bigVerts, Array(0, 1, 69999))
    val big = Seq(("b", bigGlb)).toDF("id", "blob")
      .select(Multimodal.decodeGlb($"blob").as("m"))
      .select($"m.faces").collect()(0)
    assert(big.getSeq[Int](0) == Seq(0, 1, 69999))
    // full pipeline: uri-shaped table → decode → deterministic sampling
    val pc = Multimodal.loadGlbToPointCloud(df, "blob", samples = 64, seed = 7L)
      .select($"point_cloud.values", $"point_cloud.shape").collect()(0)
    assert(pc.getSeq[Int](1) == Seq(64, 3))
    val pts = pc.getSeq[Float](0).grouped(3).toSeq
    assert(pts.length == 64)
    // every sample lies in one of the two unit triangles: x,y,z ≥ 0,
    // x + y + z ≤ 1 (both triangles satisfy this in barycentric form)
    assert(pts.forall(p => p.forall(_ >= -1e-6f) && p.sum <= 1.0001f))
  }

  test("mp4 sample tables: keyframe offsets on the reference fixture") {
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/unit/document/toydata/mov_bbb.mp4"))
    val r = Seq(("v", bytes)).toDF("id", "blob")
      .withColumn("t", Multimodal.mp4SampleTable($"blob"))
      .select($"t.n_samples", $"t.total_bytes", $"t.keyframe_samples",
        $"t.keyframe_offsets", $"t.keyframe_sizes")
      .collect()(0)
    // ground truth from an independent python struct-level walk of the
    // same file (stsz/stco/stsc/stss of the 'vide' track)
    assert(r.getInt(0) == 250)
    assert(r.getLong(1) == 375713L)
    assert(r.getSeq[Int](2) == Seq(1, 96))
    assert(r.getSeq[Long](3) == Seq(5147L, 423489L))
    assert(r.getSeq[Int](4) == Seq(14820, 11006))
    // garbage → null
    val bad = Seq(("x", Array[Byte](0, 0, 0, 1))).toDF("id", "blob")
      .select(Multimodal.mp4SampleTable($"blob").as("t")).collect()(0)
    assert(bad.isNullAt(0))
  }

  test("videoKeyframeBlobs slices each keyframe's payload out of the container") {
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/unit/document/toydata/mov_bbb.mp4"))
    val rows = DocArray(Seq(("v", bytes)).toDF("id", "blob"), "id")
      .videoKeyframeBlobs()
      .df.select($"frame_sample", $"frame_blob").orderBy($"frame_sample")
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 96))
    // payloads must be the exact byte ranges the sample tables address
    val p1 = rows(0).getAs[Array[Byte]](1)
    val p96 = rows(1).getAs[Array[Byte]](1)
    assert(p1.toSeq == java.util.Arrays.copyOfRange(bytes, 5147, 5147 + 14820).toSeq)
    assert(p96.toSeq == java.util.Arrays.copyOfRange(bytes, 423489, 423489 + 11006).toSeq)
  }

  test("glb decode: interleaved bufferView with byteStride") {
    // two vertices interleaved as [pos xyz | normal xyz] with stride 24;
    // POSITION accessor must honor the view's byteStride
    val bin = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1f, 2f, 3f, 9f, 9f, 9f, 4f, 5f, 6f, 8f, 8f, 8f).foreach(bin.putFloat)
    val json = ("""{"asset":{"version":"2.0"},"buffers":[{"byteLength":48}],""" +
      """"bufferViews":[{"buffer":0,"byteOffset":0,"byteLength":48,"byteStride":24}],""" +
      """"accessors":[{"bufferView":0,"byteOffset":0,"componentType":5126,"count":2,"type":"VEC3"}],""" +
      """"meshes":[{"primitives":[{"attributes":{"POSITION":0},"mode":4}]}]}""")
      .getBytes("UTF-8")
    val jPad = (4 - json.length % 4) % 4
    val out = java.nio.ByteBuffer.allocate(12 + 8 + json.length + jPad + 8 + 48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putInt(0x46546C67).putInt(2).putInt(out.capacity)
    out.putInt(json.length + jPad).putInt(0x4E4F534A)
    out.put(json); (0 until jPad).foreach(_ => out.put(' '.toByte))
    out.putInt(48).putInt(0x004E4942).put(bin.array())
    val m = Seq(("g", out.array())).toDF("id", "blob")
      .select(Multimodal.decodeGlb($"blob").as("m"))
      .select($"m.vertices", $"m.faces").collect()(0)
    // stride skips the normals; non-indexed → identity faces
    assert(m.getSeq[Float](0) == Seq(1f, 2f, 3f, 4f, 5f, 6f))
    assert(m.getSeq[Int](1) == Seq(0, 1))

    // a lying accessor count (200M vertices against a 48-byte view) must
    // yield null BEFORE allocating — OOM is not NonFatal
    val lyingJson = new String(json, "UTF-8").replace("\"count\":2", "\"count\":200000000")
      .getBytes("UTF-8")
    val lPad = (4 - lyingJson.length % 4) % 4
    val lout = java.nio.ByteBuffer.allocate(12 + 8 + lyingJson.length + lPad + 8 + 48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    lout.putInt(0x46546C67).putInt(2).putInt(lout.capacity)
    lout.putInt(lyingJson.length + lPad).putInt(0x4E4F534A)
    lout.put(lyingJson); (0 until lPad).foreach(_ => lout.put(' '.toByte))
    lout.putInt(48).putInt(0x004E4942).put(bin.array())
    val lrow = Seq(("l", lout.array())).toDF("id", "blob")
      .select(Multimodal.decodeGlb($"blob").as("m")).collect()(0)
    assert(lrow.isNullAt(0))
  }

  test("mp4 sample tables: no stss box means every sample is sync") {
    // minimal synthetic mp4: moov/trak/mdia(hdlr vide)/minf/stbl with
    // stsz [10,20,30], one chunk at offset 100, stsc {1,3,1}, NO stss
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(t.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    def u32s(vs: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(b.putInt); b.array()
    }
    val hdlr = box("hdlr", u32s(0, 0) ++ "vide".getBytes("ISO-8859-1") ++ u32s(0, 0, 0))
    val stsz = box("stsz", u32s(0, 0, 3, 10, 20, 30))
    val stco = box("stco", u32s(0, 1, 100))
    val stsc = box("stsc", u32s(0, 1, 1, 3, 1))
    val stbl = box("stbl", stsz ++ stco ++ stsc)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr ++ minf)
    val moov = box("moov", box("trak", mdia))
    val r = Seq(("v", moov)).toDF("id", "blob")
      .select(Multimodal.mp4SampleTable($"blob").as("t"))
      .select($"t.n_samples", $"t.total_bytes", $"t.keyframe_samples",
        $"t.keyframe_offsets", $"t.keyframe_sizes")
      .collect()(0)
    assert(r.getInt(0) == 3 && r.getLong(1) == 60L)
    assert(r.getSeq[Int](2) == Seq(1, 2, 3))
    assert(r.getSeq[Long](3) == Seq(100L, 110L, 130L))
    assert(r.getSeq[Int](4) == Seq(10, 20, 30))
    // lying stsz count (claims 1000 samples, payload has 3) → null row
    val lying = {
      val badStsz = box("stsz", u32s(0, 0, 1000, 10, 20, 30))
      box("moov", box("trak", box("mdia", hdlr ++ box("minf",
        box("stbl", badStsz ++ stco ++ stsc)))))
    }
    val lr = Seq(("l", lying)).toDF("id", "blob")
      .select(Multimodal.mp4SampleTable($"blob").as("t")).collect()(0)
    assert(lr.isNullAt(0))
    // lying stco (1000 chunks, one entry) and stss (1000 sync samples,
    // zero entries) must also yield null, not mdat-garbage or an OOM
    for (tables <- Seq(
        box("stsz", u32s(0, 0, 3, 10, 20, 30)) ++ box("stco", u32s(0, 1000, 100)) ++ stsc,
        stsz ++ stco ++ box("stsc", u32s(0, 1000, 1, 3, 1)),
        stsz ++ stco ++ stsc ++ box("stss", u32s(0, 1000)))) {
      val b = box("moov", box("trak", box("mdia", hdlr ++ box("minf", box("stbl", tables)))))
      val row = Seq(("l", b)).toDF("id", "blob")
        .select(Multimodal.mp4SampleTable($"blob").as("t")).collect()(0)
      assert(row.isNullAt(0))
    }
    // size-0 box = "extends to end of file" (ISO 14496-12 §4.2): a moov
    // whose size field is 0 (streaming layout) must still be walked
    val eofMoov = {
      val m = box("moov", box("trak", mdia))
      java.nio.ByteBuffer.wrap(m).putInt(0, 0)
      m
    }
    val er = Seq(("e", eofMoov)).toDF("id", "blob")
      .select(Multimodal.mp4SampleTable($"blob").as("t"))
      .select($"t.n_samples").collect()(0)
    assert(er.getInt(0) == 3)
  }

  test("mp4 probe: reference fixture metadata matches independent parse") {
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/unit/document/toydata/mov_bbb.mp4"))
    val r = Seq(("v", bytes)).toDF("id", "blob")
      .withColumn("m", Multimodal.probeMp4($"blob"))
      .select($"m.timescale", $"m.duration", $"m.n_tracks", $"m.width", $"m.height")
      .collect()(0)
    // ground truth from a python struct-level box walk of the same file
    assert(r.getLong(0) == 90000L)
    assert(r.getLong(1) == 902400L)
    assert(r.getInt(2) == 4) // video + audio + 2 hint tracks
    assert((r.getInt(3), r.getInt(4)) == (320, 176))
    // garbage in → null out
    val bad = Seq(("x", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))).toDF("id", "blob")
      .select(Multimodal.probeMp4($"blob").as("m")).collect()(0)
    assert(bad.isNullAt(0))
  }

  test("uriToBlob: data URIs (base64 + percent), file paths, missing → null") {
    val f = Files.createTempFile("graft", ".bin")
    Files.write(f, Array[Byte](1, 2, 3))
    val rows = Seq(
      ("b64", "data:application/octet-stream;base64,AQID"),
      ("pct", "data:text/plain,a%20b%21c"),
      ("path", f.toString),
      ("fileuri", f.toUri.toString),
      ("missing", "/no/such/file/anywhere"))
      .toDF("kind", "uri")
    val got = Multimodal.loadUriToBlob(rows).collect()
      .map(r => r.getString(0) -> Option(r.getAs[Array[Byte]]("blob")).map(_.toSeq))
      .toMap
    assert(got("b64") == Some(Seq[Byte](1, 2, 3)))
    assert(got("pct") == Some("a b!c".getBytes.toSeq))
    assert(got("path") == Some(Seq[Byte](1, 2, 3)))
    assert(got("fileuri") == Some(Seq[Byte](1, 2, 3)))
    assert(got("missing") == None)
    // toDataUri → uriToBlob round trip
    val rt = Seq(("x", Array[Byte](0, 127, -128, 64))).toDF("id", "payload")
      .withColumn("uri", Multimodal.toDataUri($"payload", lit("application/octet-stream")))
      .withColumn("blob", Multimodal.uriToBlob($"uri"))
      .select("blob").collect()(0).getAs[Array[Byte]](0)
    assert(rt.toSeq == Seq[Byte](0, 127, -128, 64))
  }

  test("moveChannelAxis: HWC ↔ CHW round-trip") {
    val vals = (0 until 24).map(_.toFloat)
    val r = Seq((vals, Seq(2, 4, 3))).toDF("values", "shape")
      .withColumn("chw", Multimodal.moveChannelAxis($"values", $"shape", lit(-1), lit(0)))
      .withColumn("back", Multimodal.moveChannelAxis(
        $"chw.values", $"chw.shape", lit(0), lit(-1)))
      .select($"chw.shape", $"chw.values", $"back.values").collect()(0)
    assert(r.getSeq[Int](0) == Seq(3, 2, 4))
    // chw[c][y][x] = hwc[y][x][c]: spot-check c=2,y=1,x=3 → hwc idx (1*4+3)*3+2
    assert(r.getSeq[Float](1)(2 * 8 + 1 * 4 + 3) == vals((1 * 4 + 3) * 3 + 2))
    assert(r.getSeq[Float](2) == vals)
  }

  test("saveBlobsToFiles writes one file per doc; batchIdsLocal covers all rows") {
    import graft.operators.{GroupOps, Multimodal}
    val dir = Files.createTempDirectory("graftblobs").toString
    val df = Seq(("a", Array[Byte](1)), ("b", Array[Byte](2, 3))).toDF("id", "blob")
    assert(Multimodal.saveBlobsToFiles(df, dir) == 2)
    assert(Files.readAllBytes(java.nio.file.Paths.get(dir, "b.bin")).toSeq == Seq[Byte](2, 3))

    val batched = GroupOps.batchIdsLocal(spark.range(100).toDF("id"), 8)
    assert(batched.count() == 100)
    val sizes = batched.groupBy("batch_id").count()
      .select("count").as[Long].collect()
    assert(sizes.forall(_ <= 8))
  }

  test("point-cloud sampling stays on the mesh surface, deterministic") {
    import graft.operators.Multimodal
    // unit right triangle in z=0 plane
    val verts = Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f)
    val faces = Seq(0, 1, 2)
    val df = Seq((verts, faces)).toDF("v", "f")
      .select(Multimodal.samplePointCloud($"v", $"f", lit(50), lit(7L)).as("pc"))
    val pc = df.select($"pc.values").as[Seq[Float]].collect()(0)
    assert(pc.length == 150)
    val pts = pc.grouped(3).toSeq
    // all points inside the triangle (x>=0, y>=0, x+y<=1, z=0)
    assert(pts.forall(p => p(0) >= 0 && p(1) >= 0 && p(0) + p(1) <= 1.0001f
      && p(2) == 0f))
    val again = df.select($"pc.values").as[Seq[Float]].collect()(0)
    assert(pc == again) // seeded → deterministic
  }

  test("blobToFloatTensor reinterprets bytes little-endian") {
    val bytes = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(1.5f).putFloat(-2.0f).array()
    val r = Seq(Tuple1(bytes)).toDF("blob")
      .select(Multimodal.blobToFloatTensor($"blob").as("t"))
      .select($"t.values".as("v")).collect()(0).getSeq[Float](0)
    assert(r == Seq(1.5f, -2.0f))
  }

  test("text encode/decode round trip (text.py:15-88)") {
    val vocab = Map("hello" -> 1, "world" -> 2, "spark" -> 3)
    val df = Seq("hello spark").toDF("text")
    val enc = Parallel.textToTensor(df, "text", vocab, maxLength = 4)
    val ids = enc.select("tensor_ids").as[Seq[Int]].collect()(0)
    assert(ids == Seq(0, 0, 2, 4)) // left-pad, +1 shifted ids
    val dec = Parallel.tensorToText(enc, "tensor_ids", vocab)
    assert(dec.select("text_decoded").as[String].collect()(0) == "hello spark")
  }

  test("textToTensorJoin: join path ≡ closure-map path, no driver vocab") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the quick quick rare"),
      (3L, "completely unseen tokens only"),
      (4L, null.asInstanceOf[String]),
      (5L, "the quick " * 20)) // long doc → truncation to last maxLength
      .toDF("doc_id", "text")
    val vocab = graft.operators.GroupOps.vocabulary(docs, $"text", minFreq = 2)
    // legacy path: driver-side rank → Map → closure UDF
    val ranked = vocab.orderBy($"n".desc, $"word").collect()
    val vmap = ranked.zipWithIndex.map { case (r, i) => r.getString(0) -> (i + 2) }.toMap
    val legacy = Parallel.textToTensor(docs, "text", vmap, maxLength = 8)
      .select($"doc_id", $"tensor_ids").orderBy("doc_id")
      .as[(Long, Seq[Int])].collect()
    val joined = Parallel.textToTensorJoin(docs, "text", vocab, maxLength = 8)
      .select($"doc_id", $"tensor_ids").orderBy("doc_id")
      .as[(Long, Seq[Int])].collect()
    assert(joined.toSeq == legacy.toSeq)
    // and the same under a shuffle join (vocab past broadcast threshold)
    val shuffled = Parallel.textToTensorJoin(docs, "text", vocab, maxLength = 8,
      broadcastVocab = false)
      .select($"doc_id", $"tensor_ids").orderBy("doc_id")
      .as[(Long, Seq[Int])].collect()
    assert(shuffled.toSeq == legacy.toSeq)
    // plan shape: the vocab side joins broadcast (no corpus shuffle for
    // the token→id lookup) and nothing collects to the driver
    val plan = Parallel.textToTensorJoin(docs, "text", vocab, maxLength = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("tensorToTextJoin: distributed decode ≡ closure-map decode") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta rareword"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = graft.operators.GroupOps.vocabulary(docs, $"text", minFreq = 2)
    val enc = Parallel.textToTensorJoin(docs, "text", vocab, maxLength = 8)
    val ranked = vocab.orderBy($"n".desc, $"word").collect()
    val vmap = ranked.zipWithIndex.map { case (r, i) => r.getString(0) -> (i + 2) }.toMap
    val legacy = Parallel.tensorToText(enc, "tensor_ids", vmap)
      .select($"doc_id", $"text_decoded").orderBy("doc_id")
      .as[(Long, String)].collect()
    val joined = Parallel.tensorToTextJoin(enc, "tensor_ids", vocab)
      .select($"doc_id", $"text_decoded").orderBy("doc_id")
      .as[(Long, String)].collect()
    assert(joined.toSeq == legacy.toSeq)
    // known words survive the round trip in order; unknowns drop
    assert(joined(0)._2 == "alpha beta alpha")
  }

  test("sparse COO: transposed [ndims,N] torch layout + int32 '<i4' indices") {
    import graft.sources.BinaryCodec
    // same logical tensor as the canonical-layout test: (0,1)=2.5,
    // (1,3)=-1, (1,0)=4 in 2×4 — written torch-style transposed
    val t = BinaryCodec.encodeSparseNdArray(
      Seq(Seq(0L, 1L), Seq(1L, 3L), Seq(1L, 0L)),
      Seq(2.5f, -1.0f, 4.0f), Seq(2, 4), transposedIndices = true)
    val (tv, ts, _) = BinaryCodec.decodeNdArray(t)
    assert(ts == Seq(2, 4) && tv == Seq(0f, 2.5f, 0f, 0f, 4.0f, 0f, 0f, -1.0f))
    // scipy-style: int32 buffer with numpy dtype string '<i4'
    val s = BinaryCodec.encodeSparseNdArray(
      Seq(Seq(0L, 1L), Seq(1L, 3L), Seq(1L, 0L)),
      Seq(2.5f, -1.0f, 4.0f), Seq(2, 4), idxDtype = "<i4")
    val (sv, ss, _) = BinaryCodec.decodeNdArray(s)
    assert(ss == Seq(2, 4) && sv == Seq(0f, 2.5f, 0f, 0f, 4.0f, 0f, 0f, -1.0f))
    // both at once (transposed + 32-bit)
    val b = BinaryCodec.encodeSparseNdArray(
      Seq(Seq(1L), Seq(4L)), Seq(3f, 4f), Seq(6),
      transposedIndices = true, idxDtype = "<i4")
    val (bv, bs, _) = BinaryCodec.decodeNdArray(b)
    assert(bs == Seq(6) && bv == Seq(0f, 3f, 0f, 0f, 4f, 0f))
  }

  test("embedFeatureHashing fills embedding with nDim floats") {
    val df = Seq((1L, "some text here")).toDF("id", "text")
    val got = Parallel.embedFeatureHashing(df, "text", nDim = 32)
    assert(got.select("embedding").as[Seq[Float]].collect()(0).length == 32)
  }

  test("charNgrams: single-pass normalized char shingles") {
    import graft.functions.TextFunctions
    val got = Seq("Ab, cd!").toDF("text")
      .select(TextFunctions.charNgrams($"text", 3)).as[Seq[String]].collect()(0)
    assert(got == Seq("ab ", "b c", " cd"))
  }

  test("schema projections: recursive JSON-schema + GraphQL SDL") {
    import graft.schema.{DocSchema, Projections}
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val js = mapper.readTree(Projections.documentJsonSchema) // must parse
    val doc = js.path("$defs").path("Document")
    val props = doc.path("properties")
    // all 18 core reference fields + recursive chunks/matches
    DocSchema.flat.fieldNames.foreach(f => assert(props.has(f), f))
    assert(js.path("$ref").asText == "#/$defs/Document")
    assert(props.path("chunks").path("items").path("$ref").asText
      == "#/$defs/Document")
    assert(props.path("tensor").path("properties").has("shape"))
    assert(props.path("blob").path("contentEncoding").asText == "base64")
    assert(props.path("scores").path("additionalProperties")
      .path("properties").has("ref_id"))
    assert(doc.path("required").get(0).asText == "id")
    // arbitrary StructType works too
    val any = mapper.readTree(Projections.toJsonSchema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))))))
    assert(any.path("properties").path("x").path("items")
      .path("type").asText == "integer")
    val sdl = Projections.documentGraphqlSdl
    assert(sdl.contains("type Document {"))
    assert(sdl.contains("chunks: [Document]") && sdl.contains("matches: [Document]"))
    assert(sdl.contains("metadata_: JSON")) // leading-underscore rename
    assert(sdl.contains("scalar JSON"))
  }

  test("tag promotion gives typed pushdown-able columns") {
    import graft.operators.Promote
    import org.apache.spark.sql.types.IntegerType
    val df = Seq((1L, Map("i" -> "42", "s" -> "x"))).toDF("id", "tags")
    val p = Promote.tags(df, Map("i" -> IntegerType))
    assert(p.schema("tag_i").dataType == IntegerType)
    assert(p.where($"tag_i" > 40).count() == 1)
  }

  test("streaming knn over a memory stream of query vectors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val docs = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.0f, 1.0f)),
      (12L, Seq(0.9f, 0.1f))).toDF("id", "embedding")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData((1L, Seq(1.0f, 0.05f)))
    val stream = mem.toDF().toDF("id", "embedding")
    val out = EventStream.streamingKnn(stream, docs, 2)
      .writeStream.outputMode("update").format("memory").queryName("sknn")
      .trigger(Trigger.AvailableNow()).start()
    out.processAllAvailable(); out.stop()
    val rows = spark.sql("SELECT query_id, matches FROM sknn").collect()
    assert(rows.length == 1)
    val m = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(m.map(_.getLong(1)) == Seq(10L, 12L)) // nearest first
  }

  test("streaming ANN ingest appends encoded micro-batches to the persisted layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Ann
    import graft.functions._
    val mk = (r: Range) => r.map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 0.7 + j * 1.3).toFloat))
    }
    val base = mk(0 until 250).toDF("id", "embedding")
    val idx = Ann.ivfBuild(base, "id", "embedding", nCells = 4, seed = 3,
      center = true)
    val cb = Ann.pqTrainResidual(idx, m = 4)
    val dir = Files.createTempDirectory("graftsann").toString
    Ann.pqWriteIndex(Ann.pqAttach(idx, cb), dir)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val writer = EventStream.streamingAnnIngest(
      mem.toDF().toDF("id", "embedding"), idx, cb, dir)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    // two micro-batches, restarted writer between them — the layout is
    // the only state that carries over, like a real daily-ingest job
    mem.addData(mk(250 until 280): _*)
    val run1 = writer.start(); run1.processAllAvailable(); run1.stop()
    mem.addData(mk(280 until 300): _*)
    val run2 = writer.start(); run2.processAllAvailable(); run2.stop()

    val loaded = Ann.pqReadIndex(spark, dir)
    assert(loaded.coded.count() == 300)
    // streamed codes are byte-identical to the batch encode of those rows
    val extra = mk(250 until 300).toDF("id", "embedding")
    val want = Ann.pqEncodeRows(idx, cb, Ann.assignRows(idx, extra))
      .select(col("id"), bytes_to_ints(col("_code")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = loaded.coded.where(col("id") >= 250)
      .select(col("id"), bytes_to_ints(col("_code")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == want)
    // and a streamed doc is findable through the loaded index
    val hits = Ann.ivfSearchPq(loaded, extra.where(col("id") >= 297), 1,
      nProbe = 1, rerank = 50, docs = base.unionByName(extra)).collect()
    assert(hits.length == 3)
    hits.foreach(r => assert(r.getLong(0) == r.getLong(1) && r.getInt(3) == 1))
  }

  test("streaming HLL sketch: merged registers equal the batch sketch of everything") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Sketch
    val mk = (r: Range) => r.map(i => (s"g${i % 2}", s"key-${i / 3}"))
    val all = mk(0 until 3000)
    val (h1, h2) = all.splitAt(1500)
    val dir = Files.createTempDirectory("graftshll").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val writer = EventStream.streamingHllSketch(
      mem.toDF().toDF("g", "key"), Seq("g"), Sketch.keyHash(col("key")),
      p = 8, path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    mem.addData(h1: _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(h2: _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val state = EventStream.readHllState(spark, s"$dir/state")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val want = Sketch.hllSketch(all.toDF("g", "key"), Seq("g"),
        Sketch.keyHash(col("key")), p = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(state == want) // register max merge is lossless
    val est = EventStream.readHllState(spark, s"$dir/state")
      .select(col("g"), Sketch.hllEstimateFromRegs(col("hll"), 8).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val truth = all.distinct.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    for ((g, e) <- est)
      assert(math.abs(e - truth(g)) / truth(g) < 0.30, s"$g: $e vs ${truth(g)}")
    val vs = new java.io.File(s"$dir/state").list().filter(_.startsWith("v"))
    assert(vs.toSet == Set("v0", "v1"))
  }

  test("streaming Bloom: merged words equal the batch filter of everything") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Sketch
    val all = (0 until 800).map(i => Tuple1(s"key-$i"))
    val (h1, h2) = all.splitAt(400)
    val dir = Files.createTempDirectory("graftsbloom").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Tuple1[String]]
    val writer = EventStream.streamingBloom(
      mem.toDF().toDF("key"), Sketch.keyHash(col("key")),
      nHashes = 4, mBits = 12, path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    mem.addData(h1: _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(h2: _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val state = EventStream.readBloomState(spark, s"$dir/state")
      .head.getSeq[Long](0)
    val want = Sketch.bloomPack(
      Sketch.bloomBuild(all.map(_._1).toDF("key"),
        Sketch.keyHash(col("key")), 4, 12), 12).head.getSeq[Long](0)
    assert(state === want) // bit OR merge is lossless
    // every streamed key tests positive against the merged state
    val hits = all.map(_._1).toDF("key")
      .crossJoin(broadcast(EventStream.readBloomState(spark, s"$dir/state")))
      .select(Sketch.bloomMightContain(Sketch.keyHash(col("key")),
        col("words"), 4, 12).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity))
    val vs = new java.io.File(s"$dir/state").list().filter(_.startsWith("v"))
    assert(vs.toSet == Set("v0", "v1"))
  }

  test("decayedCounts: exact power-of-two bucket weights") {
    val h = 100L // half-life in the test's fake-ns unit
    val ev = Seq(
      ("a", 1000L), // age 0   -> e=0 -> 1e9
      ("a", 950L),  // age 50  -> e=0 -> 1e9
      ("a", 900L),  // age 100 -> e=1 -> 5e8
      ("a", 650L),  // age 350 -> e=3 -> round(1.25e8) = 125000000
      ("b", 0L)     // age 1000 -> e=10 -> round(1e9/1024) = 976563
    ).toDF("g", "ts")
    val out = EventStream.decayedCounts(ev, Seq("g"), col("ts"), h)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a")._1 === 4L)
    assert(out("a")._2 === 1000000000L + 1000000000L + 500000000L + 125000000L)
    assert(out("b") === ((1L, 976563L, 976563L / 1e9)))
    // layout invariance: integer sums don't care about partitioning
    val rep = EventStream.decayedCounts(ev.repartition(4), Seq("g"),
        col("ts"), h)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rep("a") === out("a")._2 && rep("b") === out("b")._2)
  }

  test("streaming CM sketch: summed deltas equal the one-shot sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Sketch
    val all = (0 until 2000).map(i => Tuple1(s"k${i % 300}"))
    val (h1, h2) = all.splitAt(900)
    val dir = Files.createTempDirectory("graftscm").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Tuple1[String]]
    val writer = EventStream.streamingCmSketch(
      mem.toDF().toDF("w"), col("w"), depth = 4, width = 256,
      path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    mem.addData(h1: _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(h2: _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val state = EventStream.readCmState(spark, s"$dir/state")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = Sketch.cmSketch(all.map(_._1).toDF("w"), col("w"),
        depth = 4, width = 256)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(state == want) // delta sum == one-shot counters
    // estimates off the merged state never undercount the true counts
    val probes = Seq("k0", "k299", "nope").toDF("w")
    val est = Sketch.cmEstimate(EventStream.readCmState(spark, s"$dir/state"),
        probes, "w", depth = 4, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = all.map(_._1).groupBy(identity).view.mapValues(_.size.toLong)
    assert(est("k0") >= truth("k0") && est("k299") >= truth("k299"))
    // two delta dirs, one per micro-batch
    val ds = new java.io.File(s"$dir/state").list().filter(_.startsWith("d"))
    assert(ds.toSet == Set("d0", "d1"))
  }

  test("streaming co-moments: fit from summed deltas == one-shot fit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Pca
    // deterministic 3-dim vectors, split across two micro-batches
    val mk = (i: Int) => Tuple1(Array(
      (i % 7).toDouble, ((i * 3) % 5).toDouble, ((i * 11) % 4).toDouble))
    val all = (0 until 400).map(mk)
    val (h1, h2) = all.splitAt(170)
    val dir = Files.createTempDirectory("graftscom").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Tuple1[Array[Double]]]
    val writer = EventStream.streamingCoMoments(
      mem.toDF().toDF("v"), "v", dims = 3, path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    mem.addData(h1: _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(h2: _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val (n, sx, sxy) = EventStream.readCoMomentState(spark, s"$dir/state")
    assert(n === 400L)
    val oneShot = all.map(_._1).toDF("v")
      .select(graft.functions.co_moments(
        Pca.quantize(col("v")), 3).as("s"))
      .select(col("s.n"), col("s.sx"), col("s.sxy")).head
    assert(oneShot.getLong(0) === n)
    assert(oneShot.getSeq[Long](1).toArray.toSeq === sx.toSeq)
    assert(oneShot.getSeq[Long](2).toArray.toSeq === sxy.toSeq)
    // and the model built from merged state == the one-shot batch fit
    val m1 = Pca.fitFromSums(n, sx, sxy, outDim = 2)
    val m2 = Pca.fit(all.map(_._1).toDF("v"), "v", outDim = 2)
    assert(m1.mean.toSeq === m2.mean.toSeq)
    assert(m1.components.map(_.toSeq).toSeq ===
      m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    // two delta dirs, one per micro-batch
    val ds = new java.io.File(s"$dir/state").list().filter(_.startsWith("d"))
    assert(ds.toSet == Set("d0", "d1"))
  }

  test("streaming KMV sketch: merged state equals the batch sketch of everything") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Sketch
    val mk = (r: Range) => r.map(i => (s"g${i % 2}", s"key-${i / 3}"))
    val all = mk(0 until 3000) // duplicated keys within and across batches
    val (h1, h2) = all.splitAt(1500)
    val dir = Files.createTempDirectory("graftskmv").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val writer = EventStream.streamingKmvSketch(
      mem.toDF().toDF("g", "key"), Seq("g"), Sketch.keyHash(col("key")),
      k = 64, path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    // two micro-batches with a writer restart between them — the
    // versioned parquet state is the only carried state
    mem.addData(h1: _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(h2: _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val state = EventStream.readKmvState(spark, s"$dir/state")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = Sketch.kmvSketch(all.toDF("g", "key"), Seq("g"),
        Sketch.keyHash(col("key")), k = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(state == want) // lossless: stream-merged == one-shot batch sketch
    // estimates read straight off the persisted artifact
    val est = EventStream.readKmvState(spark, s"$dir/state")
      .select(col("g"), Sketch.kmvEstimateFromSketch(col("kmv"), 64).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = all.distinct.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    for ((g, e) <- est)
      assert(math.abs(e - truth(g)) / truth(g) < 0.40, s"$g: $e vs ${truth(g)}")
    // both micro-batch versions persisted; each is a complete state
    val vs = new java.io.File(s"$dir/state").list().filter(_.startsWith("v"))
    assert(vs.toSet == Set("v0", "v1"))
  }

  test("streaming near-dup ingest: artifact grows, dups dropped, restart-safe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "spark plans filters joins and aggregates over columnar parquet data"
    val c = "a totally novel third document about streaming watermarks and state"
    val dir = Files.createTempDirectory("graftnd").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val writer = EventStream.streamingNearDupIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    // batch 1 contains an INTRA-batch near-dup pair (1, 3): only the
    // smaller id may enter
    mem.addData((1L, a), (2L, b), (3L, a + " truly"))
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    // batch 2 (restarted writer): a near-dup of doc 1 + one novel doc
    mem.addData((10L, a + " today"), (11L, c))
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    // delta layout: d0 = batch-1 survivors, d1 = batch-2 novelty only
    val d0 = spark.read.parquet(s"$dir/state/sigs/d0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val d1 = spark.read.parquet(s"$dir/state/sigs/d1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(d0 == Set(1L, 2L)) // intra-batch dup 3 screened out
    assert(d1 == Set(11L))    // cross-batch dup 10 screened out
    val docIds = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/state/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docIds == Set(1L, 2L, 11L))
  }

  test("streaming topic tag: frozen-phi fold-in per batch, replay-idempotent output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Plsa
    val dir = Files.createTempDirectory("grafttt").toString
    // fit a separable model, persist phi as the frozen artifact
    val fitTok = ((0L until 5L).map(d => (d, "ball game team win")) ++
      (5L until 10L).map(d => (d, "oven salt flour bake")))
      .toDF("d", "text")
      .select($"d", explode(split($"text", " ")).as("w"))
      .groupBy("d", "w").agg(count(lit(1)).as("c"))
    val m = Plsa.fit(fitTok, "d", "w", "c", k = 2, iters = 8)
    m.phi.write.parquet(s"$dir/phi")
    val sportTopic = Plsa.docTopics(m.theta)
      .where($"d" === 0L).head.getInt(1)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val writer = EventStream.streamingTopicTag(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$dir/phi", s"$dir/out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    mem.addData((100L, "ball game win"), (101L, "oven flour bake"))
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData((102L, "team game ball ball"))
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val b0 = spark.read.parquet(s"$dir/out/b0")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b0(100L) == sportTopic && b0(101L) == 1 - sportTopic)
    val b1 = spark.read.parquet(s"$dir/out/b1")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == Map(102L -> sportTopic))
  }

  test("binary codec: reference-format round trip incl. nesting flatten") {
    import graft.sources.BinaryCodec
    import graft.schema.{Doc, NamedScore, Tensor}
    val docs = Seq(
      Doc(id = "d1", text = "hello world", embedding = Seq(1.5f, -2.0f, 3.0f),
        tags = Map("lang" -> "en", "n" -> "5"), weight = 0.7f, uri = "file:///x",
        scores = Map("cos" -> NamedScore(0.25f, "knn", "", "d2"))),
      Doc(id = "d2", blob = Array[Byte](1, 2, 3), mime_type = "image/png",
        location = Seq(1.0f, 2.0f)),
      Doc(id = "d3", tensor = Tensor(Seq(1f, 2f, 3f, 4f), Seq(2, 2), "float32"),
        granularity = 1, parent_id = "d1", offset = 2.0f)
    ).toDS().toDF()

    val dir = java.nio.file.Files.createTempDirectory("graftbin").toString
    BinaryCodec.saveBinaryShards(docs, s"$dir/shards")
    val back = BinaryCodec.loadBinary(spark, s"$dir/shards")
    assert(back.count() == 3)
    val d1 = back.where($"id" === "d1").collect()(0)
    assert(d1.getAs[String]("text") == "hello world")
    assert(d1.getSeq[Float](back.columns.indexOf("embedding")) == Seq(1.5f, -2.0f, 3.0f))
    assert(d1.getMap[String, String](back.columns.indexOf("tags"))("lang") == "en")
    val sc = d1.getMap[String, org.apache.spark.sql.Row](back.columns.indexOf("scores"))
    assert(sc("cos").getFloat(0) == 0.25f)
    val d2 = back.where($"id" === "d2").collect()(0)
    assert(d2.getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, 2, 3))
    assert(d2.getAs[String]("mime_type") == "image/png")
    val d3 = back.where($"id" === "d3").collect()(0)
    assert(d3.getStruct(back.columns.indexOf("tensor")).getSeq[Float](0)
      == Seq(1f, 2f, 3f, 4f))
    assert(d3.getAs[Int]("granularity") == 1)
  }

  test("binary codec round trip over the real documents table (500 docs)") {
    import graft.sources.BinaryCodec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("cast(doc_id as string) as id", "text",
        "map('lang', lang, 'source', source) as tags")
    val dir = Files.createTempDirectory("graftbin2").toString
    BinaryCodec.saveBinaryShards(docs, s"$dir/shards")
    val back = BinaryCodec.loadBinary(spark, s"$dir/shards")
    assert(back.count() == 500)
    val orig = docs.select("id", "text").as[(String, String)].collect().toMap
    val rt = back.select("id", "text").as[(String, String)].collect().toMap
    assert(rt == orig)
    val tags = back.where($"id" === "0").select("tags").collect()(0)
      .getMap[String, String](0)
    assert(tags.get("lang").nonEmpty)
  }

  test("streaming dedup drops re-arrived content within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    mem.addData((t0, "dup"), (t0, "dup"), (t0, "unique"))
    val out = EventStream.streamingDedupe(
      mem.toDF().toDF("event_time", "text"), Seq("text"), "event_time", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("sdd")
      .trigger(Trigger.AvailableNow()).start()
    out.processAllAvailable(); out.stop()
    val got = spark.sql("SELECT text FROM sdd").as[String].collect().sorted
    assert(got.toSeq == Seq("dup", "unique"))
  }

  test("streaming new-against-corpus passes only unseen keys") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sq = spark.sqlContext
    val corpus = Seq("seen a", "seen b").toDF("text")
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "seen a"), (2L, "fresh x"), (3L, "seen b"), (4L, "fresh y"))
    val out = EventStream.streamingNewAgainstCorpus(
      mem.toDF().toDF("id", "text"), corpus, col("text"), col("text"))
      .writeStream.outputMode("append").format("memory").queryName("snac")
      .trigger(Trigger.AvailableNow()).start()
    out.processAllAvailable(); out.stop()
    val got = spark.sql("SELECT id FROM snac").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 4L))
  }

  test("watermark: append-mode windows emit on close, too-late rows dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_time", "event_type", "value")
    val q = EventStream.windowedCounts(events, "30 minutes", "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("wm")
      .start()
    // batch 1: two rows in window 00:00-00:30, one at 01:10 that pushes
    // the watermark to 00:40 — past the first window's end
    mem.addData((ts("00:05:00"), "a", 1.0), (ts("00:10:00"), "a", 2.0),
      (ts("01:10:00"), "a", 4.0))
    q.processAllAvailable()
    // batch 2: a too-late row for the closed window (00:06 < watermark
    // 00:40 → dropped) and a row at 02:10 that closes the 01:00 window
    mem.addData((ts("00:06:00"), "a", 8.0), (ts("02:10:00"), "a", 16.0))
    q.processAllAvailable()
    mem.addData((ts("03:10:00"), "a", 32.0)) // close the 02:00 window
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT window.start, n, sum_value FROM wm ORDER BY 1")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 3)
    // first window emitted with ONLY the two on-time rows: the late 8.0
    // never lands anywhere
    assert(got(0)._1 == ts("00:00:00") && got(0)._2 == 2 && got(0)._3 == 3.0)
    assert(got(1)._1 == ts("01:00:00") && got(1)._2 == 1 && got(1)._3 == 4.0)
    assert(got(2)._1 == ts("02:00:00") && got(2)._2 == 1 && got(2)._3 == 16.0)
  }

  test("stream-stream interval join pairs events within the time bound only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    val clicks = MemoryStream[(java.sql.Timestamp, Long, String)]
    val views = MemoryStream[(java.sql.Timestamp, Long, String)]
    val joined = EventStream.intervalJoin(
      clicks.toDF().toDF("click_time", "user_id", "page"),
      views.toDF().toDF("view_time", "user_id", "item"),
      key = "user_id", leftTime = "click_time", rightTime = "view_time",
      before = "10 minutes", after = "10 minutes")
      .select(col("l.user_id").as("user_id"), col("page"), col("item"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    clicks.addData((ts("00:30:00"), 1L, "p1"))
    views.addData(
      (ts("00:25:00"), 1L, "in-window"),
      (ts("00:05:00"), 1L, "too-early"),
      (ts("00:50:00"), 1L, "too-late"),
      (ts("00:28:00"), 2L, "other-user"))
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT user_id, page, item FROM ssj").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "p1", "in-window")))
  }

  test("base64 round trip (to_base64/from_base64)") {
    import graft.sources.BinaryCodec
    import graft.schema.Doc
    val docs = Seq(Doc(id = "x", text = "b64"), Doc(id = "y", uri = "u")).toDS().toDF()
    val b64 = BinaryCodec.toBase64(docs)
    val back = BinaryCodec.fromBase64(spark, b64)
    assert(back.count() == 2)
    assert(back.where($"id" === "x").select("text").as[String].collect()(0) == "b64")
  }

  test("streaming: windowed counts + stateful sessionize over event files") {
    import org.apache.spark.sql.streaming.Trigger
    val stream = EventStream.fromDirectory(spark, "/root/testdata/sf0.001")
    val q = EventStream.windowedCounts(stream, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("wc")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.sql("SELECT * FROM wc")
    assert(emitted.count() > 0)
    // streaming aggregate total equals the batch row count
    assert(emitted.agg(sum("n")).collect()(0).getLong(0) == 1000L)
    val batch = EventStream.readEvents(spark, "/root/testdata/sf0.001/events.parquet")
    assert(batch.count() == 1000)

    val ds = batch.select($"user_id", $"ts").as[EventStream.SessionEvent]
    val sessions = EventStream.sessionize(ds, 1800000000000L)
    assert(sessions.count() > 0)
    // batch gaps-and-islands gives the same total session count
    val expected = SparkEntry.queries("q16_sessions")(spark, "/root/testdata/sf0.001")
      .agg(sum("n_sessions")).as[Long].collect()(0)
    // stateful variant holds one open session per user (not yet emitted)
    val users = batch.select(countDistinct("user_id")).as[Long].collect()(0)
    assert(sessions.count() + users == expected)
  }

  test("streamingLinearAttribution: per-conversion credits equal the " +
      "batch rollup; stragglers ignored; hot user poisons (r8)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStream.{AttrEvent, AttrCredit}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEvent]
    val q = EventStream.streamingLinearAttribution(mem.toDS(),
        "purchase", Seq("view", "click"), windowNs = 10L,
        maxUserTouches = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("sattr").start()
    // batch 1: u1 two views + click then purchase@100 (out of order in
    // the batch); an expired view@80 must NOT ride the window
    mem.addData(
      AttrEvent(1L, 96L, "click", 3L), AttrEvent(1L, 95L, "view", 2L),
      AttrEvent(1L, 80L, "view", 1L), AttrEvent(1L, 97L, "view", 4L),
      AttrEvent(1L, 100L, "purchase", 6L))
    q.processAllAvailable()
    // batch 2: a straggler older than u1's consumed history is ignored;
    // a second purchase takes only the surviving in-window touch
    mem.addData(
      AttrEvent(1L, 90L, "click", 7L), // straggler: < lastTs=100
      AttrEvent(1L, 104L, "purchase", 8L))
    // u2 crosses maxUserTouches=3 within the window -> poisoned, its
    // later conversion emits nothing
    mem.addData(
      AttrEvent(2L, 1L, "view", 10L), AttrEvent(2L, 2L, "view", 11L),
      AttrEvent(2L, 3L, "view", 12L), AttrEvent(2L, 4L, "view", 13L),
      AttrEvent(2L, 5L, "purchase", 14L))
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT * FROM sattr").as[AttrCredit].collect()
    // conversion 6: touches view@95,click@96,view@97 (view@80 expired):
    // per-touch 333333, views 2x, click 1x
    val c6 = got.filter(_.conv_id == 6L).map(c => c.channel ->
      (c.touches, c.credit_ppm)).toMap
    assert(c6 == Map("view" -> ((2L, 666666L)),
      "click" -> ((1L, 333333L))))
    // conversion 8 @104: window [94,104) still holds all three touches
    // (straggler click@90 was dropped, NOT appended)
    val c8 = got.filter(_.conv_id == 8L).map(c => c.channel ->
      (c.touches, c.credit_ppm)).toMap
    assert(c8 == Map("view" -> ((2L, 666666L)),
      "click" -> ((1L, 333333L))))
    // the poisoned user emitted nothing
    assert(!got.exists(_.user_id == 2L))
    // parity: batch linearAttribution over the SAME in-order kept
    // events gives the identical per-channel rollup for u1
    val all = Seq(
      (1L, 80L, "view", 1L), (1L, 95L, "view", 2L),
      (1L, 96L, "click", 3L), (1L, 97L, "view", 4L),
      (1L, 100L, "purchase", 6L), (1L, 104L, "purchase", 8L))
      .toDF("u", "ts", "t", "id")
    val batch = graft.operators.Funnel.linearAttribution(all, "u",
        "ts", "t", "id", "purchase", Seq("view", "click"), 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val streamed = got.filter(_.user_id == 1L).groupBy(_.channel)
      .view.mapValues(_.map(_.credit_ppm).sum).toMap
    assert(streamed == batch)
  }

  test("streamingLinearAttribution: a touch at exactly ts-windowNs " +
      "survives eviction (r8 boundary regression)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStream.{AttrEvent, AttrCredit}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AttrEvent]
    val q = EventStream.streamingLinearAttribution(mem.toDS(),
        "purchase", Seq("view"), windowNs = 10L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sattr2").start()
    // view@0 then view@10: the APPEND at ts=10 must NOT evict view@0
    // (0 >= 10-10 keeps it creditable by a conversion at 10); the
    // batch join credits it (0 >= 0 inclusive, 0 < 10 strict)
    mem.addData(AttrEvent(1L, 0L, "view", 1L),
      AttrEvent(1L, 10L, "view", 2L),
      AttrEvent(1L, 10L, "purchase", 3L))
    q.processAllAvailable(); q.stop()
    val got = spark.sql("SELECT * FROM sattr2").as[AttrCredit].collect()
    assert(got.length == 1 && got(0).touches == 1L &&
      got(0).credit_ppm == 1000000L) // only view@0: view@10 not < cts
  }

  test("streamingFunnel: cross-batch advancement equals the batch funnel; stragglers never re-anchor") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import EventStream.{FunnelEvent, FunnelUpdate}
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val mem = MemoryStream[FunnelEvent]
    val q = EventStream.streamingFunnel(mem.toDS(), steps,
        windowNs = 100L)
      .writeStream.outputMode("update").format("memory")
      .queryName("sfun").start()
    // batch 1: u1 views+clicks (click arrives before view IN the batch
    // - intra-batch disorder is sorted); u2 views at 50
    mem.addData(
      FunnelEvent(1L, "click", 20L), FunnelEvent(1L, "view", 10L),
      FunnelEvent(2L, "view", 50L))
    q.processAllAvailable()
    // batch 2: u1 purchases in-window; u2 gets a STRAGGLER click at 40
    // (older than its consumed view-anchor rule? no - older than
    // nothing consumed after t1; 40 < t1=50 so the batch rule would
    // also reject it: ts > t1 required); u2 clicks at 60 and purchases
    // too late (170 > 50+100)
    mem.addData(
      FunnelEvent(1L, "purchase", 90L),
      FunnelEvent(2L, "click", 40L), FunnelEvent(2L, "click", 60L),
      FunnelEvent(2L, "purchase", 170L))
    q.processAllAvailable(); q.stop()
    import spark.implicits._
    val last = spark.sql("SELECT * FROM sfun").as[FunnelUpdate].collect()
      .groupBy(_.user_id).map { case (u, rows) =>
        u -> rows.maxBy(_.depth) }.toMap
    assert(last(1L).depth == 3 && last(1L).times == Seq(10L, 20L, 90L))
    assert(last(2L).depth == 2 && last(2L).times == Seq(50L, 60L))
    // parity with the batch operator over the full in-order event set
    val all = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 90L),
      (2L, "view", 50L), (2L, "click", 40L), (2L, "click", 60L),
      (2L, "purchase", 170L)).toDF("user_id", "event_type", "ts")
    val batch = graft.operators.Funnel.funnelUsers(all, "user_id",
        "event_type", "ts", steps, windowNs = 100L)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(batch == last.view.mapValues(_.depth).toMap)

    // a true straggler (older than a CONSUMED later step) is ignored,
    // not re-anchored: u3 view@10, click@30 in batch 1; click@15 in
    // batch 2 arrives too late - state keeps 30
    val mem2 = MemoryStream[FunnelEvent]
    val q2 = EventStream.streamingFunnel(mem2.toDS(), steps)
      .writeStream.outputMode("update").format("memory")
      .queryName("sfun2").start()
    mem2.addData(FunnelEvent(3L, "view", 10L), FunnelEvent(3L, "click", 30L))
    q2.processAllAvailable()
    mem2.addData(FunnelEvent(3L, "click", 15L))
    q2.processAllAvailable(); q2.stop()
    val u3 = spark.sql("SELECT * FROM sfun2").as[FunnelUpdate].collect()
      .filter(_.user_id == 3L).maxBy(_.depth)
    assert(u3.times == Seq(10L, 30L)) // 15 did not rewrite the click
  }

  test("videoContentSignature: identical keyframe content collides, a flipped byte does not") {
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/unit/document/toydata/mov_bbb.mp4"))
    // copy with one keyframe payload byte flipped (offset 5147 is the
    // first keyframe's start; header/tables untouched so it still parses)
    val tampered = bytes.clone()
    tampered(5147) = (tampered(5147) ^ 0x01).toByte
    val da = DocArray(Seq(
      ("a", bytes), ("b", bytes), ("c", tampered)).toDF("id", "blob"), "id")
    val sigs = da.videoContentSignature().collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(sigs.keySet == Set("a", "b", "c"))
    assert(sigs("a") == sigs("b"))
    assert(sigs("a")._1 == 2 && sigs("c")._1 == 2)
    assert(sigs("a")._2 != sigs("c")._2)
    val groups = da.videoDupGroups().collect()
    assert(groups.length == 1)
    assert(groups(0).getSeq[String](2) == Seq("a", "b"))
  }

  test("streaming as-of enrichment matches the batch join across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.AsOf
    val right = Seq((1L, 8L, 100.0), (1L, 15L, 110.0), (2L, 3L, 50.0))
      .toDF("k", "rts", "price")
    val dir = Files.createTempDirectory("graftsasof").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    def run(): Unit = {
      val q = EventStream.streamingAsOfEnrich(
        mem.toDF().toDF("k", "ts", "tag"), right, Seq("k"), "ts", "rts",
        Seq("price"), s"$dir/out")
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    mem.addData((1L, 10L, "e1"), (2L, 2L, "e2"))
    run() // writer restart between micro-batches: stateless twin
    mem.addData((1L, 20L, "e3"))
    run()
    val got = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    val probes = Seq((1L, 10L, "e1"), (2L, 2L, "e2"), (1L, 20L, "e3"))
      .toDF("k", "ts", "tag")
    val want = AsOf.join(probes, right, Seq("k"), "ts", "rts",
        Seq("price")).collect()
      .map(r => r.getString(2) ->
        (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(got == want)
    assert(got == Map("e1" -> 100.0, "e2" -> -1.0, "e3" -> 110.0))
  }

  test("streamingValueCounts: delta-summed histogram drift-tests identical to one-shot KS") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Evaluate
    // live stream drifts high vs the frozen reference
    val live = (0 until 1200).map(i => Tuple1((i % 40 + 5).toLong))
    val ref = (0 until 1000).map(i => (i % 40).toLong).toDF("v")
    val (h1, h2) = live.splitAt(500)
    val dir = Files.createTempDirectory("graftsvc").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Tuple1[Long]]
    val writer = EventStream.streamingValueCounts(
      mem.toDF().toDF("x"), col("x"), path = s"$dir/state")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/_chk")
    mem.addData(h1: _*)
    val r1 = writer.start(); r1.processAllAvailable(); r1.stop()
    mem.addData(h2: _*)
    val r2 = writer.start(); r2.processAllAvailable(); r2.stop()

    val state = EventStream.readValueCounts(spark, s"$dir/state")
    val refCounts = ref.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val got = Evaluate.ksTest2Counts(state, refCounts,
      col("v"), col("c")).head
    // bit-identical to the one-shot KS over the full raw history
    val want = Evaluate.ksTest2(live.map(_._1).toDF("v"), ref, col("v")).head
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getLong(2) === want.getLong(2) &&
      got.getLong(3) === want.getLong(3))
    assert(got.getDouble(4) === want.getDouble(4))
    assert(got.getDouble(4) > 0.0) // the planted shift is visible

    // duplicate value rows (unmerged deltas read raw) sum to the same
    val raw = spark.read.parquet(
      new java.io.File(s"$dir/state").listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("d"))
        .map(_.toString): _*)
    val got2 = Evaluate.ksTest2Counts(raw, refCounts,
      col("v"), col("c")).head
    assert(got2.getLong(2) === got.getLong(2))
  }
}
