package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the reference's binary document-stream
  * format (see [[BinaryCodec]] for the wire layout and provenance):
  *
  *   spark.read.format("graft-docbin").load(dir)       // or a single file
  *   flatDf.write.format("graft-docbin").save(dir)
  *
  * Read side: one InputPartition per shard file. Listing and reads go
  * through the Hadoop FileSystem API (the session's hadoopConf rides to
  * executors in a serializable wrapper), so any Hadoop-visible store
  * works, and shards are STREAMED through the frame parser — no
  * whole-shard byte array, no 2 GB / executor-heap shard cap.
  * Column pruning is honored at the row-assembly level: the stream is
  * row-major so every byte is still decoded, but only requested fields are
  * converted and shipped (the expensive parts — tensor/embedding array
  * conversion — are skipped when pruned).
  *
  * Write side, two-level commit (the FileOutputCommitter-v1 shape):
  * tasks serialize to a LOCAL temp file (the u64 doc count sits at byte 1
  * of the header, so the writer seek-patches it on task commit — cheap
  * locally, impossible on an append-only cluster FS), then upload to a
  * job-scoped `_staging-<jobId>/` directory on the destination FS. Only
  * BatchWrite.commit — after every task has staged its shard — performs
  * the destructive part: the overwrite truncate of prior shards, then the
  * rename of staged shards into place. A job that dies mid-write leaves
  * the existing data untouched plus an inert staging directory that
  * abort (or the next overwrite's truncate) removes; task retries and
  * speculation are handled by the commit coordinator as before. Every
  * published file is a complete, valid stream the reference can read.
  */
class DocBinSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docbin"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.schema.DocSchema.flat

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocBinTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

/** Hadoop Configuration is not Serializable; this minimal wrapper writes
  * it through its own Writable serialization (the same trick Spark's
  * internal SerializableConfiguration uses, re-done here on public API). */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

private[sources] class DocBinTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-docbin requires a path (load(dir)/save(dir))")
  override def name(): String = s"graft-docbin:$path"
  override def schema(): StructType = graft.schema.DocSchema.flat
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  // builders are created on the driver during planning: the active
  // session's hadoopConf is in scope here, not in the serialized tasks
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocBinScanBuilder(path, new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf()))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DocBinWriteBuilder(path, new SerializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] class DocBinScanBuilder(path: String,
    conf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = graft.schema.DocSchema.flat
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve full-schema field order (assembly indexes into flat rows)
    required = StructType(graft.schema.DocSchema.flat.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new DocBinScan(path, required, conf)
}

private[sources] class DocBinScan(path: String, required: StructType,
    conf: SerializableHadoopConf)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf.value)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p)
          .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
            !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).sorted
      else Array(path)
    files.map(f => DocBinInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocBinReaderFactory(required, conf)
}

private[sources] case class DocBinInputPartition(file: String) extends InputPartition

private[sources] class DocBinReaderFactory(required: StructType,
    conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[DocBinInputPartition].file
    new PartitionReader[InternalRow] {
      private val fieldIdx = required.fieldNames
        .map(graft.schema.DocSchema.flat.fieldIndex)
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(required)
      private val p = new HPath(file)
      private val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(
          p.getFileSystem(conf.value).open(p), 1 << 16))
      private val rows = BinaryCodec.parseStreamInput(in)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          val full = rows.next()
          current = toCatalyst(Row.fromSeq(fieldIdx.toIndexedSeq.map(full.get)))
            .asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

private[sources] class DocBinWriteBuilder(path: String,
    conf: SerializableHadoopConf)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val t = doTruncate
    new Write {
      override def toBatch: BatchWrite = new DocBinBatchWrite(path, t, conf)
    }
  }
}

private[sources] case class DocBinCommitMessage(shard: String)
    extends WriterCommitMessage

private[sources] class DocBinBatchWrite(path: String, truncate: Boolean,
    conf: SerializableHadoopConf)
    extends BatchWrite {
  // one staging namespace per job: concurrent/retried jobs can't collide,
  // and '_'-prefixed names are invisible to the scan's listing
  private val jobId = java.util.UUID.randomUUID().toString
  private def fs: FileSystem = new HPath(path).getFileSystem(conf.value)
  private def stagingDir = new HPath(path, s"_staging-$jobId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    fs.mkdirs(stagingDir) // creates the destination dir itself too
    new DocBinWriterFactory(path, jobId, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs
    // the destructive step runs only here, with every shard staged: a
    // failure before this point leaves prior data fully intact
    if (truncate)
      f.listStatus(new HPath(path))
        .filter(s => s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .foreach(s => f.delete(s.getPath, false))
    messages.foreach { case DocBinCommitMessage(shard) =>
      val dst = new HPath(path, shard)
      f.delete(dst, false) // append-mode rerun with identical task ids
      f.rename(new HPath(stagingDir, shard), dst)
    }
    f.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    fs.delete(stagingDir, true)
}

private[sources] class DocBinWriterFactory(path: String, jobId: String,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val schema = graft.schema.DocSchema.flat
      private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
      // taskId in the final name keeps append jobs from clobbering a
      // previous job's shard for the same partition id; the commit
      // coordinator guarantees one committed attempt per partition
      private val shardName = f"part-$partitionId%05d-$taskId.protobuf"
      // streamed to a LOCAL spill file: header with a zero count
      // placeholder, framed docs as they arrive, count patched at offset 1
      // on task commit (needs a seek — hence local), then one upload to
      // the job staging dir — a 100 GB partition never materializes in
      // executor memory
      private val localTmp = java.nio.file.Files.createTempFile(
        s"docbin-$jobId-", ".tmp")
      private val raf = new java.io.RandomAccessFile(localTmp.toFile, "rw")
      raf.setLength(0)
      raf.write(1) // version
      raf.writeLong(0L) // count placeholder (big-endian)
      private var n = 0L

      override def write(record: InternalRow): Unit = {
        val row = toScala(record).asInstanceOf[Row]
        val b = BinaryCodec.docToProto(row)
        raf.writeInt(b.length) // 4B big-endian frame
        raf.write(b)
        n += 1
      }

      override def commit(): WriterCommitMessage = {
        raf.seek(1); raf.writeLong(n); raf.close()
        val staged = new HPath(new HPath(path, s"_staging-$jobId"), shardName)
        val f = staged.getFileSystem(conf.value)
        f.copyFromLocalFile(true /* delete local */, true /* overwrite */,
          new HPath(localTmp.toUri), staged)
        DocBinCommitMessage(shardName)
      }
      override def abort(): Unit = {
        raf.close(); java.nio.file.Files.deleteIfExists(localTmp)
      }
      override def close(): Unit = ()
    }
}
