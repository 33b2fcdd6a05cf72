package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Sprites

/** Sprite-sheet and animated-GIF artifacts: grid geometry per the
  * reference's rules, pixel placement read back from the real PNG,
  * frame count + pixels read back from the real GIF. */
class SpritesSpec extends SparkSuite {
  import spark.implicits._

  private def solid(h: Int, w: Int, r: Int, g: Int, b: Int) =
    (Seq.tabulate(h * w * 3)(i => (i % 3 match {
      case 0 => r; case 1 => g; case _ => b
    }).toFloat), Seq(h, w, 3))

  private def tmp(name: String): String =
    Paths.get(Files.createTempDirectory("sprites").toString, name).toString

  test("imageSprites: ceil(sqrt n) grid, row-major placement, zero pad") {
    // 5 solid 4x4 images -> perRow 3, perCol 2, tile = 12/3 = 4
    val docs = (0 until 5).map { i =>
      val (v, s) = solid(4, 4, 40 * i + 20, 10, 200 - 30 * i)
      (i.toLong, v, s)
    }.toDF("id", "v", "s")
    val (rows, cols, tile, path) = Sprites.imageSprites(docs, "id", "v",
      "s", tmp("sheet.png"), canvasSize = 12, minSize = 2)
    assert(rows == 2 && cols == 3 && tile == 4)
    val img = javax.imageio.ImageIO.read(new java.io.File(path))
    assert(img.getWidth == 12 && img.getHeight == 8)
    // image i sits at (row i/3, col i%3); PNG is lossless
    for (i <- 0 until 5) {
      val rgb = img.getRGB((i % 3) * 4 + 1, (i / 3) * 4 + 1)
      assert(((rgb >> 16) & 0xff) == 40 * i + 20, s"img $i red")
      assert((rgb & 0xff) == 200 - 30 * i, s"img $i blue")
    }
    // the 6th cell is zero padding
    assert((img.getRGB(9, 5) & 0xffffff) == 0)
  }

  test("imageSprites: min-size recompute rule and the valve") {
    val docs = (0 until 9).map { i =>
      val (v, s) = solid(2, 2, i, i, i); (i.toLong, v, s)
    }.toDF("id", "v", "s")
    // perRow would be 3, tile 16/3=5 < minSize 8 -> tile 8, perRow 2
    val (rows, cols, tile, _) = Sprites.imageSprites(docs, "id", "v", "s",
      tmp("small.png"), canvasSize = 16, minSize = 8)
    assert(tile == 8 && cols == 2 && rows == 5)
    val e = intercept[IllegalArgumentException] {
      Sprites.imageSprites(docs, "id", "v", "s", tmp("over.png"),
        maxImages = 4)
    }
    assert(e.getMessage.contains("sample upstream"))
  }

  test("saveGif: frame count, per-frame pixels, loop metadata") {
    val docs = Seq(
      (0L, solid(3, 5, 255, 0, 0)), (1L, solid(3, 5, 0, 255, 0)),
      (2L, solid(3, 5, 0, 0, 255)))
      .map { case (i, (v, s)) => (i, v, s) }.toDF("id", "v", "s")
    val path = tmp("anim.gif")
    assert(Sprites.saveGif(docs, "id", "v", "s", path, delayMs = 150) == 3)
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.File(path))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    assert(reader.getNumImages(true) == 3)
    val f0 = reader.read(0); val f2 = reader.read(2)
    assert((f0.getRGB(2, 1) & 0xffffff) == 0xff0000)
    assert((f2.getRGB(2, 1) & 0xffffff) == 0x0000ff)
    // NETSCAPE loop extension present in the stream bytes
    val bytes = Files.readAllBytes(Paths.get(path))
    assert(new String(bytes, "ISO-8859-1").contains("NETSCAPE2.0"))
    reader.dispose()
  }
}
