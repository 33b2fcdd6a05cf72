package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet row-group statistics audit — pruning effectiveness as DATA,
  * not as a timing anecdote. Row-group min/max stats are what every
  * predicate-pushdown decision at 100 TB actually consults; this
  * operator surfaces them as a DataFrame so a layout job (plain sort,
  * [[ZOrder.writeZOrdered]], [[ZOrder.writeHilbertOrdered]]) can be
  * AUDITED: disjoint tight ranges per row group = a prunable layout,
  * full-span ranges = a scan-everything layout. The q259 gate
  * cross-checks these numbers against DuckDB's independent
  * `parquet_metadata()` parse of the same footers — two engines, one
  * byte-level artifact.
  *
  * Scale shape: footers only — one ~KB read per file, one task per
  * file via a distributed flatMap over the file list (the listing
  * itself is one driver-side FileSystem call, O(files) strings). No
  * data pages are touched.
  */
object ScanStats {

  /** Per-(file, row group, column) statistics for the named columns of
    * every `*.parquet` under `dir`: (file, rg, col_name, num_rows,
    * min_v, max_v) — min/max as strings (the footer's typed values
    * rendered, integer-exact for INT32/INT64 columns). */
  def rowGroupStats(spark: SparkSession, dir: String,
      columns: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir))
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    val colSet = columns.toSet
    spark.createDataset(files).repartition(math.max(1, files.size))
      .flatMap { p =>
        val c = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(p), c)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          (0 until blocks.size()).flatMap { i =>
            val b = blocks.get(i)
            val cols = b.getColumns
            (0 until cols.size()).flatMap { j =>
              val cc = cols.get(j)
              val name = cc.getPath.toDotString
              if (!colSet.contains(name)) None
              else {
                val st = cc.getStatistics
                val (mn, mx) =
                  if (st == null || !st.hasNonNullValue) (null, null)
                  else (String.valueOf(st.genericGetMin),
                    String.valueOf(st.genericGetMax))
                Some((p, i, name, b.getRowCount, mn, mx))
              }
            }
          }
        } finally reader.close()
      }
      .toDF("file", "rg", "col_name", "num_rows", "min_v", "max_v")
  }
}
