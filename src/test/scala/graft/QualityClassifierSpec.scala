package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** Target-domain discriminator: fit quality, score shape, keep rule. */
class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  private val tgtWords = Seq("history", "science", "article", "citation",
    "published", "research")
  private val rawWords = Seq("click", "buy", "free", "winner", "casino",
    "prize")

  private def mk(words: Seq[String], n: Int, off: Long) =
    (0 until n).map { i =>
      (off + i, (0 until 8).map(j => words((i * 7 + j) % words.length))
        .mkString(" "))
    }

  private lazy val tgt = mk(tgtWords, 40, 1000).toDF("id", "text")
  private lazy val raw = mk(rawWords, 160, 0).toDF("id", "text")
  private lazy val model =
    QualityClassifier.fit(raw, tgt, col("text"), dim = 512, maxIter = 30)

  test("fit separates target-like from raw docs") {
    assert(model.coefficients.length == 512)
    def scores(df: org.apache.spark.sql.DataFrame) = df
      .select(QualityClassifier.score(col("text"), model))
      .collect().map(_.getDouble(0))
    val st = scores(tgt)
    val sr = scores(raw)
    assert(st.forall(s => s >= 0 && s <= 1) && sr.forall(s => s >= 0 && s <= 1))
    assert(st.sum / st.length > 0.9, s"target mean ${st.sum / st.length}")
    assert(sr.sum / sr.length < 0.1, s"raw mean ${sr.sum / sr.length}")
  }

  test("filterByScore keeps target-like rows, drops raw-like ones") {
    val mixed = tgt.unionByName(raw)
    val kept = QualityClassifier.filterByScore(mixed, col("text"), model,
      key = col("id")).select("id").collect().map(_.getLong(0)).toSet
    val keptTgt = kept.count(_ >= 1000)
    val keptRaw = kept.count(_ < 1000)
    assert(keptTgt >= 30, s"kept only $keptTgt of 40 target docs")
    assert(keptRaw <= 16, s"kept $keptRaw of 160 raw docs")
    // deterministic: the same corpus + model keeps the same rows
    val again = QualityClassifier.filterByScore(mixed, col("text"), model,
      key = col("id")).select("id").collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }
}
