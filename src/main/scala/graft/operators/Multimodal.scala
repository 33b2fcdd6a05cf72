package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal content operators: images/audio/video as opaque `binary`
  * columns + shape-carrying tensor structs `{values, shape, dtype}`
  * (reference: docarray/document/mixins/image.py:19-448, audio.py, video.py,
  * convert.py:15-51).
  *
  * The tensor *transforms* (resize, normalize, sliding windows, channel
  * axis, frame sampling) are real implementations mirroring the reference's
  * numpy semantics. The *codec* steps (png/jpeg/wav/mp4 decode) are STUBS:
  * the image/audio libraries are not in this container, so `decode*Stub`
  * produce a deterministic fake tensor from the bytes — the Spark-side
  * plumbing (schema, batching, partition parallelism) is the real part.
  * Swap the stub body for an actual codec (javax.imageio / JavaCV) when
  * available; signatures stay identical.
  */
object Multimodal {

  /** Named tensor struct for UDF returns: {values, shape, dtype}. */
  case class TensorVal(values: Seq[Float], shape: Seq[Int], dtype: String)

  /** STUB decode: bytes → deterministic fake HWC image tensor whose values
    * derive from a rolling hash of the content (NOT a real decode). */
  val decodeImageStub = udf { (blob: Array[Byte], h: Int, w: Int) =>
    if (blob == null) null
    else {
      val n = h * w * 3
      val values = new Array[Float](n)
      var state = 0xcbf29ce484222325L
      var i = 0
      while (i < n) {
        state = (state ^ (blob(i % blob.length) & 0xffL)) * 0x100000001b3L
        values(i) = ((state >>> 40) & 0xff).toFloat
        i += 1
      }
      TensorVal(values.toSeq, Seq(h, w, 3), "uint8")
    }
  }

  /** STUB audio decode: bytes → deterministic fake mono PCM tensor. */
  val decodeAudioStub = udf { (blob: Array[Byte], samples: Int) =>
    if (blob == null) null
    else {
      val values = Array.tabulate(samples) { i =>
        val b = blob(i % blob.length) & 0xff
        (b - 128) / 128.0f
      }
      TensorVal(values.toSeq, Seq(samples), "float32")
    }
  }

  /** Nearest-neighbor resize of an HWC image tensor — same semantics as
    * the reference's `set_image_tensor_shape`
    * (reference: document/mixins/image.py:96-123). Pure JVM, no deps. */
  val resizeNearest = udf { (values: Seq[Float], shape: Seq[Int], oh: Int, ow: Int) =>
    if (values == null || shape == null || shape.length != 3) null
    else {
      val Seq(h, w, c) = shape
      val in = values.toArray
      val out = new Array[Float](oh * ow * c)
      var y = 0
      while (y < oh) {
        val sy = math.min(h - 1, y * h / oh)
        var x = 0
        while (x < ow) {
          val sx = math.min(w - 1, x * w / ow)
          var ch = 0
          while (ch < c) {
            out((y * ow + x) * c + ch) = in((sy * w + sx) * c + ch)
            ch += 1
          }
          x += 1
        }
        y += 1
      }
      TensorVal(out.toSeq, Seq(oh, ow, c), "float32")
    }
  }

  /** Channel-wise normalization (img - mean) / std over an HWC tensor
    * (reference: image.py:202 set_image_tensor_normalization). */
  val normalizeChannels = udf {
    (values: Seq[Float], shape: Seq[Int], mean: Seq[Double], std: Seq[Double]) =>
      if (values == null || shape == null || shape.length != 3) null
      else {
        val c = shape(2)
        val out = values.toArray
        var i = 0
        while (i < out.length) {
          val ch = i % c
          out(i) = ((out(i) / 255.0 - mean(ch)) / std(ch)).toFloat
          i += 1
        }
        TensorVal(out.toSeq, shape, "float32")
      }
  }

  /** Strided sliding windows over an HWC tensor → array of patch tensors
    * (reference: image.py:243 convert_image_tensor_to_sliding_windows). */
  val slidingWindows = udf {
    (values: Seq[Float], shape: Seq[Int], win: Int, stride: Int) =>
      if (values == null || shape == null || shape.length != 3) null
      else {
        val Seq(h, w, c) = shape
        val in = values.toArray
        val patches = for {
          y0 <- 0 to (h - win) by stride
          x0 <- 0 to (w - win) by stride
        } yield {
          val p = new Array[Float](win * win * c)
          var y = 0
          while (y < win) {
            var x = 0
            while (x < win) {
              var ch = 0
              while (ch < c) {
                p((y * win + x) * c + ch) = in(((y0 + y) * w + (x0 + x)) * c + ch)
                ch += 1
              }
              x += 1
            }
            y += 1
          }
          TensorVal(p.toSeq, Seq(win, win, c), "float32")
        }
        patches
      }
  }

  /** Every-nth frame sampling of a THWC video tensor (reference:
    * video.py:12-70 only_keyframes ≈ temporal subsampling here). */
  val sampleFrames = udf { (values: Seq[Float], shape: Seq[Int], everyNth: Int) =>
    if (values == null || shape == null || shape.length != 4) null
    else {
      val Seq(t, h, w, c) = shape
      val frameLen = h * w * c
      val keep = (0 until t by everyNth)
      val out = new Array[Float](keep.length * frameLen)
      val in = values.toArray
      keep.zipWithIndex.foreach { case (f, i) =>
        System.arraycopy(in, f * frameLen, out, i * frameLen, frameLen)
      }
      TensorVal(out.toSeq, Seq(keep.length, h, w, c), "float32")
    }
  }

  /** Point-cloud sampling from a triangle mesh (reference:
    * document/mixins/mesh.py:12-42 load_uri_to_point_cloud_tensor — there
    * trimesh.sample; here the actual math): area-weighted triangle pick +
    * uniform barycentric coordinates, deterministic from the seed. The
    * mesh decode itself (glb/obj parsing) would be the stubbed codec step;
    * inputs are the already-decoded vertex/face tensors. */
  val samplePointCloud = udf {
    (vertices: Seq[Float], faces: Seq[Int], nSamples: Int, seed: Long) =>
      if (vertices == null || faces == null || faces.length < 3) null
      else {
        val nf = faces.length / 3
        // cumulative triangle areas
        val cum = new Array[Double](nf)
        var total = 0.0
        var f = 0
        while (f < nf) {
          val (a, b, c) = (faces(3 * f) * 3, faces(3 * f + 1) * 3, faces(3 * f + 2) * 3)
          // cross((B-A),(C-A)) / 2
          val ux = vertices(b) - vertices(a)
          val uy = vertices(b + 1) - vertices(a + 1)
          val uz = vertices(b + 2) - vertices(a + 2)
          val vx = vertices(c) - vertices(a)
          val vy = vertices(c + 1) - vertices(a + 1)
          val vz = vertices(c + 2) - vertices(a + 2)
          val cx = uy * vz - uz * vy
          val cy = uz * vx - ux * vz
          val cz = ux * vy - uy * vx
          total += math.sqrt(cx * cx + cy * cy + cz * cz) / 2.0
          cum(f) = total
          f += 1
        }
        val rng = new java.util.Random(seed)
        val out = new Array[Float](nSamples * 3)
        var s = 0
        while (s < nSamples) {
          val t = rng.nextDouble() * total
          var lo = 0; var hi = nf - 1
          while (lo < hi) {
            val mid = (lo + hi) / 2
            if (cum(mid) < t) lo = mid + 1 else hi = mid
          }
          val (a, b, c) = (faces(3 * lo) * 3, faces(3 * lo + 1) * 3, faces(3 * lo + 2) * 3)
          var r1 = rng.nextDouble(); var r2 = rng.nextDouble()
          if (r1 + r2 > 1) { r1 = 1 - r1; r2 = 1 - r2 } // fold into triangle
          var d = 0
          while (d < 3) {
            out(s * 3 + d) = (vertices(a + d) +
              r1 * (vertices(b + d) - vertices(a + d)) +
              r2 * (vertices(c + d) - vertices(a + d))).toFloat
            d += 1
          }
          s += 1
        }
        TensorVal(out.toSeq, Seq(nSamples, 3), "float32")
      }
  }

  /** blob ↔ tensor raw reinterpret (reference: convert.py:15-41
    * convert_blob_to_tensor frombuffer / convert_tensor_to_blob). */
  val blobToFloatTensor = udf { (blob: Array[Byte]) =>
    if (blob == null) null
    else {
      val bb = java.nio.ByteBuffer.wrap(blob)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = blob.length / 4
      val values = Array.tabulate(n)(i => bb.getFloat(i * 4))
      TensorVal(values.toSeq, Seq(n), "float32")
    }
  }

  /** uri → data URI (reference: convert.py:43-51 convert_uri_to_datauri is
    * per-doc I/O; here the content is already a column — pure transform). */
  def toDataUri(blob: Column, mimeType: Column): Column =
    concat(lit("data:"), mimeType, lit(";base64,"), base64(blob))

  /** save_blob_to_file for every doc (reference: document/mixins/blob.py:40-52)
    * — distributed: each partition writes its docs' blobs to
    * `<dir>/<id><ext>`. Executor-local I/O; `dir` must be a shared
    * filesystem path (or adapt to an object-store client per partition). */
  def saveBlobsToFiles(df: org.apache.spark.sql.DataFrame, dir: String,
      idCol: String = "id", blobCol: String = "blob", ext: String = ".bin"): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.select(col(idCol).cast("string"), col(blobCol))
      .filter(col(blobCol).isNotNull)
      .rdd.mapPartitions { rows =>
        var n = 0L
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, r.getString(0) + ext),
            r.getAs[Array[Byte]](1))
          n += 1
        }
        Iterator.single(n)
      }.sum().toLong
  }
}
