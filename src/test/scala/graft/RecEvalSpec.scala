package graft

import org.apache.spark.sql.functions._

import graft.operators.{GroupOps, Recommend}

/** r7 additions, eighth wave: leave-last-out recommender evaluation and
  * walk-forward temporal CV folds — holdout conventions, hit
  * accounting, boundary arithmetic, embargo semantics. */
class RecEvalSpec extends SparkSuite {
  import spark.implicits._

  // ---- hitRateAtN -----------------------------------------------------

  test("hitRate: holdout recommended back -> hit; denominator is eval users") {
    // u1 {a,b | holds c}, u2 {a,b,c}, u3 {a,b,c}: after holdout by
    // highest order, u1 trains on {a,b}; u2/u3 train on 2 items each.
    // co-counts among {a,b,c} make the held-out item recommendable.
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 1L), (2L, "b", 2L), (2L, "c", 3L),
      (3L, "a", 1L), (3L, "c", 2L), (3L, "b", 3L))
      .toDF("u", "i", "o")
    val r = Recommend.hitRateAtN(ev, "u", "i", col("o"), topN = 5,
      minSupport = 1L, maxUserItems = 10, simTopK = 10).collect().head
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("n_eval") == 3L)
    // u1 holds c, trains {a,b}; u2 holds c, trains {a,b}; u3 holds b,
    // trains {a,c}. co(a,b) from nobody's full sets... co-counts over
    // train: u1{a,b}, u2{a,b}, u3{a,c}: co(a,b)=2, co(a,c)=1.
    // sims: a-b, a-c (minSupport 1). u1: candidates c (via a? sim(a,c))
    // -> c recommended -> HIT. u2 same -> HIT. u3: candidate b via a -> HIT.
    assert(r.getAs[Long]("n_hits") == 3L)
    assert(math.abs(r.getAs[Double]("hit_rate") - 1.0) < 1e-12)
  }

  test("hitRate: re-touched holdout pair drops from training entirely") {
    // u1 touches a twice and b once, last touch is a -> holdout a,
    // train = {b} only (BOTH a-events drop).
    val ev = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L),
      (2L, "a", 1L), (2L, "b", 2L))
      .toDF("u", "i", "o")
    val r = Recommend.hitRateAtN(ev, "u", "i", col("o"), topN = 5,
      minSupport = 1L, maxUserItems = 10, simTopK = 10).collect().head
    // u2 holds b, trains {a}. co-counts: u1{b}, u2{a} -> no pairs ->
    // no sims -> no recs -> 0 hits, but both users evaluable.
    assert(r.getAs[Long]("n_users") == 2L && r.getAs[Long]("n_eval") == 2L)
    assert(r.getAs[Long]("n_hits") == 0L)
  }

  test("hitRate: single-item users leave no training signal and drop") {
    val ev = Seq((1L, "a", 1L), (2L, "a", 1L), (2L, "b", 2L))
      .toDF("u", "i", "o")
    val r = Recommend.hitRateAtN(ev, "u", "i", col("o"), topN = 5,
      minSupport = 1L, maxUserItems = 10, simTopK = 10).collect().head
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("n_eval") == 1L) // only u2 trains
  }

  // ---- walkForwardFolds -----------------------------------------------

  test("walkForward: exact boundaries, embargo gap, tail absorption") {
    // buckets 0..10 (11 buckets), 2 folds -> seg = 11 div 3 = 3.
    // fold1: test [3,6), train < 3-1=2, embargo [2,3).
    // fold2 (last): test [6,11], i.e. [6,12) absorbing the tail;
    //   train < 5, embargo [5,6).
    val df = (0L to 10L).flatMap(b => Seq.fill(2)(b)).toDF("b")
    val out = GroupOps.walkForwardFolds(df, col("b"), nFolds = 2,
      embargo = 1L).orderBy("fold").collect()
    val f1 = out(0)
    assert(f1.getAs[Long]("train_end") == 2L &&
      f1.getAs[Long]("test_start") == 3L &&
      f1.getAs[Long]("test_end") == 6L)
    assert(f1.getAs[Long]("n_train") == 4L)     // buckets 0,1
    assert(f1.getAs[Long]("n_embargoed") == 2L) // bucket 2
    assert(f1.getAs[Long]("n_test") == 6L)      // 3,4,5
    val f2 = out(1)
    assert(f2.getAs[Long]("test_end") == 11L)
    assert(f2.getAs[Long]("n_test") == 10L)     // 6..10
  }

  test("walkForward: thin span refuses loudly; zero embargo") {
    val thin = Seq(1L, 2L).toDF("b")
    intercept[Exception] {
      GroupOps.walkForwardFolds(thin, col("b"), nFolds = 2).collect()
    }
    val ok = (0L to 5L).toDF("b")
    val out = GroupOps.walkForwardFolds(ok, col("b"), nFolds = 1,
      embargo = 0L).collect().head
    // seg = 6 div 2 = 3; test [3, 6], train < 3, no embargo rows
    assert(out.getAs[Long]("n_train") == 3L)
    assert(out.getAs[Long]("n_embargoed") == 0L)
    assert(out.getAs[Long]("n_test") == 3L)
  }
}
