package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-based artifact registry — the network-free realization of the
  * reference's `push`/`pull` pair (reference:
  * docarray/array/mixins/io/pushpull.py:52-199, which ships the array to a
  * cloud artifact service): `push` publishes a DocumentArray as an
  * immutable, named, versioned artifact under a registry root on ANY
  * Hadoop filesystem (local, HDFS, s3a://…); `pull` loads a name — latest
  * published version by default — back as a DataFrame. Layout:
  *
  * {{{
  *   <root>/<name>/v00001/part-*.protobuf   DocBin V2 shards
  *   <root>/<name>/v00001/_meta.json        manifest, written LAST
  * }}}
  *
  * The `_meta.json` write IS the publish step: a version directory
  * without it is invisible to `pull`/`list` (a push killed mid-write
  * leaves no readable version, and the next push picks an unused number),
  * so publishing is atomic-for-readers without relying on atomic rename —
  * the property object stores lack. Artifact bytes are the interop wire
  * format ([[BinaryCodec]] protobuf frames with per-shard count headers),
  * so reference users' pushed arrays keep their stored representation,
  * and artifact row counts are readable from 9-byte shard headers without
  * scanning data. */
object Registry {

  /** A published artifact version. */
  final case class Artifact(name: String, version: Int, path: String,
      count: Long, createdAtMs: Long)

  private val namePat = "[A-Za-z0-9][A-Za-z0-9._-]*"

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new HPath(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionDirs(fs: FileSystem, nameDir: HPath): Seq[(Int, HPath)] =
    if (!fs.exists(nameDir)) Nil
    else fs.listStatus(nameDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{5}"))
      .map(s => (s.getPath.getName.drop(1).toInt, s.getPath))
      .sortBy(_._1)

  private def isPublished(fs: FileSystem, vdir: HPath): Boolean =
    fs.exists(new HPath(vdir, "_meta.json"))

  /** Sum of the 8-byte big-endian count fields in each shard header —
    * artifact size without decoding any document. */
  private def headerCount(fs: FileSystem, vdir: HPath): Long =
    fs.listStatus(vdir).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map { s =>
        val in = fs.open(s.getPath)
        try { in.readByte(); in.readLong() } finally in.close()
      }.sum

  private def readMeta(fs: FileSystem, vdir: HPath): (Long, Long) = {
    val in = fs.open(new HPath(vdir, "_meta.json"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(k: String): Long =
      s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(body)
        .map(_.group(1).toLong).getOrElse(0L)
    (field("count"), field("created_at_ms"))
  }

  /** Publish `df` as the next version of `name`. Arbitrary frames are
    * adapted via [[graft.schema.DocSchema.fromColumns]] (core columns map
    * onto doc fields, everything else lands in string `tags`) — pass
    * `fieldResolver` to rename on the way in, mirroring `from_csv`'s
    * resolver. Returns the published [[Artifact]]. */
  def push(df: DataFrame, root: String, name: String,
      fieldResolver: Map[String, String] = Map.empty): Artifact = {
    require(name.matches(namePat),
      s"artifact name must match $namePat, got '$name'")
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val nameDir = new HPath(new HPath(root), name)
    // skip over ANY existing v-dir, published or not, so a dead push's
    // leftover directory can never be written into
    val next = versionDirs(fs, nameDir).lastOption.map(_._1 + 1).getOrElse(1)
    val vdir = new HPath(nameDir, f"v$next%05d")
    // append into the brand-new version dir (the connector is DSv2 and
    // takes append/overwrite only; the dir is fresh, so append == create)
    graft.schema.DocSchema.fromColumns(df, fieldResolver)
      .write.format("graft-docbin").mode("append").save(vdir.toString)
    val count = headerCount(fs, vdir)
    val now = System.currentTimeMillis()
    val meta =
      s"""{"name":"$name","version":$next,"count":$count,""" +
      s""""created_at_ms":$now,"format":"graft-docbin"}"""
    val out = fs.create(new HPath(vdir, "_meta.json"), false)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
    Artifact(name, next, vdir.toString, count, now)
  }

  /** Load a published artifact: latest version by default, or an explicit
    * `version`. The scan is the DocBin V2 connector — partition-per-shard,
    * column-pruned. */
  def pull(spark: SparkSession, root: String, name: String,
      version: Int = -1): DataFrame = {
    val fs = fsFor(spark, root)
    val nameDir = new HPath(new HPath(root), name)
    val published = versionDirs(fs, nameDir).filter(v => isPublished(fs, v._2))
    require(published.nonEmpty, s"no published artifact named '$name' in $root")
    val vdir =
      if (version < 0) published.last._2
      else published.find(_._1 == version).map(_._2).getOrElse(
        throw new IllegalArgumentException(
          s"artifact '$name' has no published version $version " +
          s"(published: ${published.map(_._1).mkString(", ")})"))
    spark.read.format("graft-docbin").load(vdir.toString)
  }

  /** Every published version of every artifact under the root. */
  def list(spark: SparkSession, root: String): Seq[Artifact] = {
    val fs = fsFor(spark, root)
    val rootPath = new HPath(root)
    if (!fs.exists(rootPath)) return Nil
    for {
      nameStatus <- fs.listStatus(rootPath).toSeq.sortBy(_.getPath.getName)
      if nameStatus.isDirectory
      name = nameStatus.getPath.getName
      (v, vdir) <- versionDirs(fs, nameStatus.getPath)
      if isPublished(fs, vdir)
    } yield {
      val (count, created) = readMeta(fs, vdir)
      Artifact(name, v, vdir.toString, count, created)
    }
  }

  /** Delete one version of an artifact, or the whole name (version = -1). */
  def delete(spark: SparkSession, root: String, name: String,
      version: Int = -1): Unit = {
    val fs = fsFor(spark, root)
    val nameDir = new HPath(new HPath(root), name)
    val target =
      if (version < 0) nameDir else new HPath(nameDir, f"v$version%05d")
    fs.delete(target, true)
  }

  /** Drop all but the newest `keep` published versions of `name`. */
  def prune(spark: SparkSession, root: String, name: String,
      keep: Int): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = fsFor(spark, root)
    val nameDir = new HPath(new HPath(root), name)
    versionDirs(fs, nameDir).filter(v => isPublished(fs, v._2))
      .dropRight(keep)
      .foreach { case (_, vdir) => fs.delete(vdir, true) }
  }
}
