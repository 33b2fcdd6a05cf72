package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Ann, Knn}

/** Dev harness: IVF build-time/recall/scan-fraction sweep (round-4 perf
  * item; declared scratch main like Scratch.scala). Args:
  * maxIter,initSteps,fitFrac,center,nProbe per config. */
object ScratchIvf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).select(org.apache.spark.sql.functions.sum("id")).collect()

    val tmp = java.nio.file.Files.createTempDirectory("ivfsweep").toString
    Bench.benchDocs(spark, 1000000L, 128)
      .write.mode("overwrite").option("compression", "none").parquet(s"$tmp/docs")
    val stored = spark.read.parquet(s"$tmp/docs")
    val queries100 = Bench.benchDocs(spark, 100L, 128)
    val exact = Knn.bruteForce(stored, queries100, 10, "cosine").cache()
    exact.count()

    val configs = args.toSeq.map { s =>
      val p = s.split(",")
      (p(0).toInt, p(1).toInt, p(2).toDouble, p(3).toBoolean, p(4).toInt)
    }
    for ((mi, is, ff, ce, np) <- configs) {
      val t0 = System.nanoTime()
      val idx0 = Ann.ivfBuild(stored, "id", "embedding", nCells = 1024,
        maxIter = mi, initSteps = is, fitSampleFraction = ff, center = ce)
      val idx = idx0.copy(assigned = idx0.assigned.cache())
      idx.assigned.count()
      val build = (System.nanoTime() - t0) / 1e9
      val approx = Ann.ivfSearch(idx, queries100, 10, nProbe = np)
      def time(f: => Unit): Double = {
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      val s1 = time(Ann.ivfSearch(idx, queries100, 10, nProbe = np).count())
      val s2 = time(Ann.ivfSearch(idx, queries100, 10, nProbe = np).count())
      val b1 = time(Ann.ivfSearchBlocked(idx, queries100, 10, nProbe = np).count())
      val b2 = time(Ann.ivfSearchBlocked(idx, queries100, 10, nProbe = np).count())
      println(f"BLOCKED search=$b1%.2f/$b2%.2f s")
      val recall = Ann.recallAgainstExact(approx, exact)
      val frac = Ann.scanFraction(idx, queries100, nProbe = np)
      println(f"CFG maxIter=$mi initSteps=$is fitFrac=$ff center=$ce nProbe=$np " +
        f"build=$build%.1f s search=$s1%.2f/$s2%.2f s recall=$recall%.4f scanFrac=$frac%.3f")
      idx.assigned.unpersist()
    }
    spark.stop()
  }
}
