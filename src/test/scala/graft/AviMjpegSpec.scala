package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** MJPEG-AVI frame decode: the container is assembled HERE, field by
  * field from the public RIFF/AVI layout (an independent writer, the
  * WireFixtureSpec discipline), with REAL JPEG payloads from ImageIO —
  * so parser and fixture are two implementations of the same public
  * spec. mp4 bytes must probe as null, not misparse. */
class AviMjpegSpec extends SparkSuite {
  import spark.implicits._

  private def u32le(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array(0.toByte)
      else Array.empty[Byte]
    fourcc.getBytes("ISO-8859-1") ++ u32le(payload.length) ++ payload ++ pad
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("ISO-8859-1") ++ children)

  /** solid-color 8x6 JPEG via ImageIO (JPEG is the MJPEG frame codec) */
  private def jpegFrame(r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    gr.setColor(new java.awt.Color(r, g, b)); gr.fillRect(0, 0, 8, 6)
    gr.dispose()
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private val colors =
    Seq((200, 30, 30), (30, 200, 30), (30, 30, 200), (128, 128, 128))
  private val jpegs = colors.map { case (r, g, b) => jpegFrame(r, g, b) }

  private val avi: Array[Byte] = {
    val avih = u32le(40000L) ++ u32le(0) ++ u32le(0) ++ u32le(0) ++
      u32le(4) /* totalFrames */ ++ u32le(0) ++ u32le(1) ++ u32le(0) ++
      u32le(8) /* width */ ++ u32le(6) /* height */ ++
      Array.fill(16)(0.toByte)
    val strh = "vids".getBytes ++ "MJPG".getBytes ++
      Array.fill(48)(0.toByte)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh)))
    // an ODD-length non-video chunk between frames exercises RIFF's
    // pad-to-even rule; '01wb' (audio stream 1) must be skipped
    val oddAudio = chunk("01wb", Array.fill(7)(0x55.toByte))
    val movi = list("movi",
      chunk("00dc", jpegs(0)) ++ chunk("00dc", jpegs(1)) ++ oddAudio ++
        chunk("00dc", jpegs(2)) ++ chunk("00dc", jpegs(3)))
    val body = "AVI ".getBytes ++ hdrl ++ movi
    "RIFF".getBytes ++ u32le(body.length) ++ body
  }

  private lazy val df = Seq(Tuple1(avi)).toDF("blob")

  test("probeAvi reads avih geometry/timing and the vids fourcc") {
    val m = df.select(Multimodal.probeAvi(col("blob")).as("m"))
      .select("m.*").head
    assert(m.getInt(0) == 4 && m.getInt(1) == 8 && m.getInt(2) == 6)
    assert(m.getLong(3) == 40000L && m.getString(4) == "MJPG")
  }

  test("aviMjpegFrames extracts every stream-0 frame, bytes intact") {
    val rows = df.select(explode(Multimodal.aviMjpegFrames(col("blob"),
        lit(1), lit(0))).as("f"))
      .select("f.frame_idx", "f.bytes").orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    rows.zip(jpegs).foreach { case (r, j) =>
      assert(r.getAs[Array[Byte]](1).sameElements(j))
    }
  }

  test("everyNth and maxFrames sample the keyframe stream") {
    val every2 = df.select(explode(Multimodal.aviMjpegFrames(col("blob"),
        lit(2), lit(0))).as("f")).select("f.frame_idx")
      .as[Int].collect().toSeq
    assert(every2 == Seq(0, 2))
    val first = df.select(explode(Multimodal.aviMjpegFrames(col("blob"),
        lit(1), lit(1))).as("f")).select("f.frame_idx")
      .as[Int].collect().toSeq
    assert(first == Seq(0))
  }

  test("extracted frames decode through the real JPEG codec") {
    val t = df.select(explode(Multimodal.aviMjpegFrames(col("blob"),
        lit(1), lit(0))).as("f"))
      .select(col("f.frame_idx"),
        Multimodal.decodeImage(col("f.bytes"), lit(0), lit(0)).as("t"))
      .select(col("frame_idx"), col("t.shape"), col("t.values"))
      .orderBy("frame_idx").collect()
    assert(t.forall(_.getSeq[Int](1) == Seq(6, 8, 3)))
    // solid-color JPEGs decode within a small quantization tolerance
    t.zip(colors).foreach { case (row, (r, g, b)) =>
      val v = row.getSeq[Float](2)
      val (mr, mg, mb) = (
        v.indices.collect { case i if i % 3 == 0 => v(i) }.sum / (v.length / 3),
        v.indices.collect { case i if i % 3 == 1 => v(i) }.sum / (v.length / 3),
        v.indices.collect { case i if i % 3 == 2 => v(i) }.sum / (v.length / 3))
      assert(math.abs(mr - r) < 8 && math.abs(mg - g) < 8 &&
        math.abs(mb - b) < 8, s"frame ${row.getInt(0)}")
    }
  }

  test("an mp4 is not an AVI: probe and extraction return null") {
    val mp4 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/tests/unit/document/toydata/mov_bbb.mp4"))
    val out = Seq(Tuple1(mp4)).toDF("blob").select(
      Multimodal.probeAvi(col("blob")).as("m"),
      Multimodal.aviMjpegFrames(col("blob"), lit(1), lit(0)).as("f")).head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
