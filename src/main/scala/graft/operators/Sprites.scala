package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image-sprite sheet and animated-GIF artifacts — the remaining on-disk
  * halves of the reference's plot family beside [[Projector]]
  * (reference: array/mixins/plot.py:400-520 `plot_image_sprites`,
  * :311-399 `save_gif`; the matplotlib/PIL display parts are OOS — the
  * FILES those calls produce are what downstream tooling consumes).
  *
  * Scale shape: the grid geometry is the reference's — `ceil(sqrt n)`
  * images per row, each tile `canvasSize/perRow` (≥ `minSize`) square —
  * so a sprite sheet is BOUNDED by construction (canvas ≤ 8192² in the
  * reference); like the projector these are browser/notebook artifacts,
  * so the collects are valve-guarded and the heavy step (per-image
  * nearest-neighbor resize to tile size) runs DISTRIBUTED through the
  * [[Multimodal.resizeNearest]] udf before the bounded tile collect.
  */
object Sprites {

  /** Compose the square sprite sheet from HWC uint8 tensors (values,
    * shape) and write it as a real PNG. Rows ordered by `idCol`
    * (deterministic layout), placed row-major, zero (black) padding in
    * unused cells — the reference's canvas rule. Returns
    * (rows, cols, tile, path). */
  def imageSprites(df: DataFrame, idCol: String, valuesCol: String,
      shapeCol: String, outPath: String, canvasSize: Int = 512,
      minSize: Int = 16, maxImages: Int = 4096): (Int, Int, Int, String) = {
    val base = df.where(col(valuesCol).isNotNull)
    val n = base.count().toInt
    require(n > 0, "imageSprites on an empty array")
    require(n <= maxImages,
      s"sprite sheet is a browser-bounded artifact: $n images > " +
        s"maxImages=$maxImages — sample upstream first")
    var perRow = math.ceil(math.sqrt(n.toDouble)).toInt
    var tile = canvasSize / perRow
    if (tile < minSize) { // the reference's too-small recompute rule
      tile = minSize
      perRow = canvasSize / tile
    }
    val perCol = math.ceil(n.toDouble / perRow).toInt
    // distributed resize to tile size, THEN the bounded collect
    val tiles = base
      .select(col(idCol).as("_id"),
        Multimodal.resizeNearest(col(valuesCol), col(shapeCol),
          lit(tile), lit(tile)).as("_t"))
      .where(col("_t").isNotNull)
      .orderBy("_id")
      .select(col("_t.values"))
      .collect()
      .map(_.getSeq[Float](0))
    val img = new java.awt.image.BufferedImage(perRow * tile,
      perCol * tile, java.awt.image.BufferedImage.TYPE_INT_RGB)
    tiles.zipWithIndex.foreach { case (v, i) =>
      val gx = (i % perRow) * tile
      val gy = (i / perRow) * tile
      var y = 0
      while (y < tile) {
        var x = 0
        while (x < tile) {
          val b = (y * tile + x) * 3
          def c(o: Int): Int =
            math.max(0, math.min(255, v(b + o).toInt))
          img.setRGB(gx + x, gy + y,
            (c(0) << 16) | (c(1) << 8) | c(2))
          x += 1
        }
        y += 1
      }
    }
    val p = Paths.get(outPath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    javax.imageio.ImageIO.write(img, "png", p.toFile)
    (perCol, perRow, tile, outPath)
  }

  /** Animated GIF of the array's image tensors, one frame per doc in
    * `idCol` order — pure `javax.imageio` (GraphicControlExtension per
    * frame for the delay, NETSCAPE2.0 application extension for the
    * loop), no PIL. GIF's 256-color palette quantizes rich frames; for
    * plots/sprites-style content it is lossless. */
  def saveGif(df: DataFrame, idCol: String, valuesCol: String,
      shapeCol: String, outPath: String, delayMs: Int = 200,
      loop: Boolean = true, maxFrames: Int = 1024): Int = {
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
    val frames = df.where(col(valuesCol).isNotNull)
      .select(col(idCol).as("_id"), col(valuesCol).as("_v"),
        col(shapeCol).as("_s"))
      .orderBy("_id")
      .collect()
    require(frames.nonEmpty, "saveGif on an empty array")
    require(frames.length <= maxFrames,
      s"gif is a notebook-bounded artifact: ${frames.length} frames > " +
        s"maxFrames=$maxFrames — sample upstream first")
    val images = frames.map { r =>
      val v = r.getSeq[Float](1); val s = r.getSeq[Int](2)
      require(s.length == 3 && s(2) == 3,
        s"saveGif expects HWC rgb tensors, got shape $s")
      val (h, w) = (s(0), s(1))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = (y * w + x) * 3
          def c(o: Int): Int = math.max(0, math.min(255, v(b + o).toInt))
          img.setRGB(x, y, (c(0) << 16) | (c(1) << 8) | c(2))
          x += 1
        }
        y += 1
      }
      img
    }
    val p = Paths.get(outPath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val out = javax.imageio.ImageIO
      .createImageOutputStream(p.toFile)
    try {
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      images.foreach { img =>
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), null)
        val fmt = meta.getNativeMetadataFormatName
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        def node(name: String): javax.imageio.metadata.IIOMetadataNode = {
          val kids = root.getElementsByTagName(name)
          if (kids.getLength > 0)
            kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode(name)
            root.appendChild(n); n
          }
        }
        val gce = node("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", (delayMs / 10).toString) // centisec
        if (loop) {
          val apps = node("ApplicationExtensions")
          val app = new javax.imageio.metadata.IIOMetadataNode(
            "ApplicationExtension")
          app.setAttribute("applicationID", "NETSCAPE")
          app.setAttribute("authenticationCode", "2.0")
          app.setUserObject(Array[Byte](1, 0, 0)) // loop forever
          apps.appendChild(app)
        }
        meta.setFromTree(fmt, root)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally {
      out.close(); writer.dispose()
    }
    images.length
  }
}
