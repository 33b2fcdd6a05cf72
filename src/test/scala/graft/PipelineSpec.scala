package graft

import org.apache.spark.sql.functions._

import graft.functions._
import graft.functions.TextFunctions
import graft.operators._
import graft.schema.DocSchema

/** End-to-end training-data pipeline over the real testdata: language
  * filter → quality gate → near-dup removal → feature-hash embedding →
  * similarity search — every stage a lazy plan, one composition. */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  test("corpus pipeline: filter → quality → dedup → embed → knn") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // 1. language + length filter through the QL compiler
    val filtered = Filters.where(docs,
      """{"lang": {"$in": ["en", "fr", "de"]}, "n_chars": {"$gte": 80}}""")
    assert(filtered.count() > 0 && filtered.count() < docs.count())

    // 2. quality gate
    val scored = filtered.withColumn("q", TextFunctions.qualityScore($"text"))
      .where($"q" >= 0.5)
    assert(scored.count() > 0)

    // 3. near-dup removal: drop the higher id of each confirmed pair
    val pairs = Dedup.minhashLsh(scored, "doc_id", "text", 0.8,
      numHashes = 64, bands = 16, ngram = 2)
    val losers = pairs.select($"b".as("doc_id")).distinct()
    val deduped = scored.join(losers, Seq("doc_id"), "left_anti")
    assert(deduped.count() <= scored.count())

    // 4. dependency-free embedding via the hashing trick
    val embedded = Parallel.embedFeatureHashing(deduped, "text", nDim = 64)
    assert(embedded.select("embedding").as[Seq[Float]].collect()
      .forall(_.length == 64))

    // 5. similarity search over the derived embeddings
    val queries = embedded.limit(3)
    val hits = Knn.bruteForce(embedded, queries, 5, "cosine",
      docId = "doc_id", queryId = "doc_id", excludeSelf = true)
    assert(hits.count() > 0)
    val ranks = hits.groupBy("query_id").agg(max("rank")).as[(Long, Int)]
      .collect()
    assert(ranks.forall(_._2 <= 5))
  }

  test("nested schema generator produces bounded recursion") {
    val s2 = DocSchema.nested(2)
    val chunks = s2("chunks").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(chunks.fieldNames.contains("chunks")) // depth 1 still nests
    val inner = chunks("chunks").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(!inner.fieldNames.contains("chunks")) // depth 2 terminates
    assert(DocSchema.flat.fieldNames.length == 18)
  }
}
