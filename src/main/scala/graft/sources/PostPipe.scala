package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

/** The reference's `post` — ship the array to an executor, get the
  * transformed array back (reference: docarray/array/mixins/post.py:47-118,
  * which speaks gRPC/HTTP/WS to a Flow service) — realized at the PROCESS
  * boundary, no network service: each partition pipes its documents
  * through an external command speaking the DocBin wire protocol
  * (1-byte version + 8-byte count header, 4-byte length-prefixed
  * DocumentProto frames) on stdin/stdout. Any executable that consumes
  * request streams and emits one response stream per request plugs in —
  * including executors written against the reference's own wire format.
  *
  * Flow control is LOCK-STEP per batch (`batchSize` docs per request
  * stream, the reference's `request_size`): write one request, flush,
  * read the full response, repeat. That bounds memory at O(batch) on
  * both sides and cannot deadlock on pipe buffers, for any executor that
  * replies per request (the Flow executor contract). A whole-input
  * aggregator (reply only at EOF) is out of contract — run those as a
  * source/sink pair instead. The child's stderr is inherited so its
  * diagnostics land in executor logs; a nonzero exit fails the task. */
object PostPipe {

  def post(df: DataFrame, command: Seq[String], batchSize: Int = 512,
      env: Map[String, String] = Map.empty,
      fieldResolver: Map[String, String] = Map.empty): DataFrame = {
    require(command.nonEmpty, "post needs a command")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = df.sparkSession
    val shaped = graft.schema.DocSchema.fromColumns(df, fieldResolver)
    val rdd = shaped.rdd.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(command: _*)
        env.foreach { case (k, v) => pb.environment().put(k, v) }
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
          _ => if (proc.isAlive) proc.destroyForcibly()
        })
        val out = new DataOutputStream(
          new BufferedOutputStream(proc.getOutputStream, 1 << 16))
        val in = new DataInputStream(
          new BufferedInputStream(proc.getInputStream, 1 << 16))
        val batches = it.grouped(batchSize)
        new Iterator[Row] {
          private var cur: Iterator[Row] = Iterator.empty
          private var done = false
          private def pump(): Unit = {
            while (!cur.hasNext && !done) {
              if (batches.hasNext) {
                val batch = batches.next()
                out.writeByte(1)
                out.writeLong(batch.size.toLong)
                batch.foreach { row =>
                  val b = BinaryCodec.docToProto(row)
                  out.writeInt(b.length)
                  out.write(b)
                }
                out.flush()
                // lock-step: fully drain this request's response stream
                // (bounded by what the executor emits for `batch`)
                cur = BinaryCodec.parseStreamInput(in).toVector.iterator
              } else {
                out.close()
                val rc = proc.waitFor()
                in.close()
                done = true
                if (rc != 0)
                  throw new RuntimeException(
                    s"post command '${command.mkString(" ")}' exited $rc")
              }
            }
          }
          override def hasNext: Boolean = { pump(); cur.hasNext }
          override def next(): Row = { pump(); cur.next() }
        }
      }
    }
    spark.createDataFrame(rdd, graft.schema.DocSchema.flat)
  }
}

/** A reference executor for [[PostPipe]] — and the template for writing
  * real ones: reads DocBin wire request streams on stdin, writes one
  * response stream per request. Transform selected by env:
  * `GRAFT_POST_UPPER=1` uppercases `text` (proving frames are decoded and
  * re-encoded, not echoed); default is identity re-encode. Runs with no
  * Spark session — the wire codec is plain JVM code. */
object PostWorker {
  def main(args: Array[String]): Unit = {
    val in = new DataInputStream(new BufferedInputStream(System.in, 1 << 16))
    val out = new DataOutputStream(new BufferedOutputStream(System.out, 1 << 16))
    val upper = sys.env.get("GRAFT_POST_UPPER").contains("1")
    val textIdx = graft.schema.DocSchema.flat.fieldIndex("text")
    var version = in.read()
    while (version != -1) {
      require(version == 1, s"unsupported stream version $version")
      val n = in.readLong()
      // a nested request frame decodes to >1 flat row, so collect the
      // response frames first and write the header with the REAL count
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var i = 0L
      while (i < n) {
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        BinaryCodec.parseDocBytes(buf).foreach { row =>
          val r2 =
            if (!upper || row.isNullAt(textIdx)) row
            else Row.fromSeq(row.toSeq.updated(textIdx,
              row.getString(textIdx).toUpperCase(java.util.Locale.ROOT)))
          frames += BinaryCodec.docToProto(r2)
        }
        i += 1
      }
      out.writeByte(1)
      out.writeLong(frames.length.toLong)
      frames.foreach { b => out.writeInt(b.length); out.write(b) }
      out.flush()
      version = in.read()
    }
    out.close()
  }
}
