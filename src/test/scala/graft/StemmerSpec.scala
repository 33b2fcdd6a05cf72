package graft

import org.apache.spark.sql.functions._

import graft.functions.{porter_stem, PorterStemmer}

/** Porter stemmer pinned to the PUBLISHED example pairs from the 1980
  * paper (step-by-step tables + the sample-vocabulary excerpts) — the
  * implementation is checked against the algorithm's own documentation,
  * not against itself. */
class StemmerSpec extends SparkSuite {
  import spark.implicits._

  private val paperPairs = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+ the restore sub-rules); note the paper's step tables
    // show per-step transformations — "agreed" is "agree" AFTER 1b but
    // step 5a then drops the e (m("agre") = 1, not *o)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2 (through the later steps to the final stem)
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc",
    "digitizer" -> "digit", "conformabli" -> "conform",
    "radicalli" -> "radic", "differentli" -> "differ",
    "vileli" -> "vile", "analogousli" -> "analog",
    "vietnamization" -> "vietnam", "predication" -> "predic",
    "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form",
    "formalize" -> "formal", "electriciti" -> "electr",
    "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular",
    "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("published Porter paper pairs stem exactly") {
    val bad = paperPairs.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("guards: short words, nulls, column path") {
    assert(PorterStemmer.stem("a") === "a")
    assert(PorterStemmer.stem("as") === "as")
    val df = Seq(Some("running"), Some("is"), None).toDF("w")
      .select(porter_stem(col("w")).as("s"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("run", "is", null))
    // Porter is deliberately NOT idempotent ("agreed"→"agre"→"agr");
    // determinism is the contract, not fixed-point behavior
    assert(PorterStemmer.stem("agre") === "agr")
  }

  test("porter_stem is SQL-registered") {
    graft.functions.registerAll(spark)
    val got = spark.sql("SELECT porter_stem('relational')").head.getString(0)
    assert(got === "relat")
  }

  test("bm25Stemmed matches inflected queries surface-form bm25 misses") {
    val docs = Seq(
      (1L, "run fast run far"),
      (2L, "walking slowly"),
      (3L, "the cat sat")).toDF("doc_id", "text")
    // "running" appears nowhere; only the stem collapse (running→run,
    // run→run) can match doc 1
    val surface = operators.TextSearch
      .bm25(docs, "doc_id", "text", "running")
    assert(surface.count() === 0)
    val stemmed = operators.TextSearch
      .bm25Stemmed(docs, "doc_id", "text", "running")
      .collect()
    assert(stemmed.map(_.getLong(0)).toSeq === Seq(1L))
    assert(stemmed.head.getDouble(1) > 0.0)
    // query-side stem also collapses plurals: "runs" → "run"
    val plural = operators.TextSearch
      .bm25Stemmed(docs, "doc_id", "text", "runs")
    assert(plural.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
