package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
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
  * Read side: one InputPartition per shard file — a directory written by
  * [[BinaryCodec.saveBinaryShards]] (or this writer) parallelizes across
  * executors file-by-file, exactly how the driver-side format shards.
  * Column pruning is honored at the row-assembly level: the stream is
  * row-major so every byte is still decoded, but only requested fields are
  * converted and shipped (the expensive parts — tensor/embedding array
  * conversion — are skipped when pruned).
  *
  * Write side: each task serializes its partition to a temp file and the
  * task commit renames it into place — task retries/speculation never
  * leave half-written streams. Every output file is a complete, valid
  * stream the reference can read on its own.
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

private[sources] class DocBinTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft-docbin requires a path (load(dir)/save(dir))")
  override def name(): String = s"graft-docbin:$path"
  override def schema(): StructType = graft.schema.DocSchema.flat
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocBinScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DocBinWriteBuilder(path)
}

private[sources] class DocBinScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = graft.schema.DocSchema.flat
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve full-schema field order (assembly indexes into flat rows)
    required = StructType(graft.schema.DocSchema.flat.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new DocBinScan(path, required)
}

private[sources] class DocBinScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles()
          .filter(x => x.isFile && !x.getName.startsWith(".") &&
            !x.getName.startsWith("_"))
          .map(_.getPath).sorted
      else Array(path)
    files.map(p => DocBinInputPartition(p): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocBinReaderFactory(required)
}

private[sources] case class DocBinInputPartition(file: String) extends InputPartition

private[sources] class DocBinReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[DocBinInputPartition].file
    new PartitionReader[InternalRow] {
      private val fieldIdx = required.fieldNames
        .map(graft.schema.DocSchema.flat.fieldIndex)
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(required)
      private val rows = BinaryCodec.parseStream(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)))
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          val full = rows.next()
          current = toCatalyst(Row.fromSeq(fieldIdx.toIndexedSeq.map(full.get)))
            .asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[sources] class DocBinWriteBuilder(path: String)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val t = doTruncate
    new Write {
      override def toBatch: BatchWrite = new DocBinBatchWrite(path, t)
    }
  }
}

private[sources] class DocBinBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new java.io.File(path)
    java.nio.file.Files.createDirectories(dir.toPath)
    if (truncate)
      dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("."))
        .foreach(_.delete())
    new DocBinWriterFactory(path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class DocBinWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val schema = graft.schema.DocSchema.flat
      private val toScala = CatalystTypeConverters.createToScalaConverter(schema)
      // taskId in the final name keeps append jobs from clobbering a
      // previous job's shard for the same partition id; the commit
      // coordinator guarantees one committed attempt per partition
      private val finalPath =
        java.nio.file.Paths.get(path, f"part-$partitionId%05d-$taskId.protobuf")
      private val tmpPath =
        java.nio.file.Paths.get(path, f".part-$partitionId%05d-$taskId.tmp")
      // streamed: header with a zero count placeholder, framed docs as they
      // arrive, count patched at offset 1 on task commit — a 100 GB
      // partition never materializes in executor memory
      private val raf = new java.io.RandomAccessFile(tmpPath.toFile, "rw")
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
        java.nio.file.Files.move(tmpPath, finalPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        new WriterCommitMessage {}
      }
      override def abort(): Unit = {
        raf.close(); java.nio.file.Files.deleteIfExists(tmpPath)
      }
      override def close(): Unit = ()
    }
}
