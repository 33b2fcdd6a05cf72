package graft

import org.apache.spark.sql.functions._

import graft.functions.Fnv64
import graft.operators.Graph

/** Deterministic random walks: full local replay of the splitmix draw
  * chain, sink-node truncation, the guard, and layout invariance. */
class RandomWalkSpec extends SparkSuite {
  import spark.implicits._

  private val edges = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L),
    (1L, 0L), (1L, 2L),
    (2L, 0L),
    (3L, 4L) // 4 is a sink
  )

  private def walkLocal(starts: Seq[Long], w: Int, l: Int, seed: Long)
      : Set[(Long, Int, Int, Long)] = {
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).sorted
    }
    val out = scala.collection.mutable.Set[(Long, Int, Int, Long)]()
    for (s <- starts; wi <- 0 until w) {
      var cur = s
      out += ((s, wi, 0, s))
      var step = 1
      var alive = true
      while (alive && step <= l) {
        adj.get(cur) match {
          case Some(ns) =>
            val key = (s << 8) + wi * 16L + step
            val draw = Fnv64.mix(key + seed)
            val idx = ((draw % ns.size) + ns.size) % ns.size
            cur = ns(idx.toInt)
            out += ((s, wi, step, cur))
            step += 1
          case None => alive = false
        }
      }
    }
    out.toSet
  }

  test("walks equal a step-for-step local replay of the draw chain") {
    val starts = Seq(0L, 1L, 3L)
    val got = Graph.randomWalks(edges.toDF("src", "dst"), "src", "dst",
        starts.toDF("id"), "id", walksPerNode = 3, walkLength = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(got === walkLocal(starts, 3, 4, 7L))
  }

  test("sink node: step-0 row only, no continuation") {
    val got = Graph.randomWalks(edges.toDF("src", "dst"), "src", "dst",
        Seq(4L).toDF("id"), "id", walksPerNode = 2, walkLength = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(got.toSet === Set((4L, 0, 0, 4L), (4L, 1, 0, 4L)))
  }

  test("guard refuses start ids outside the packing range") {
    val e = intercept[Exception] {
      Graph.randomWalks(edges.toDF("src", "dst"), "src", "dst",
        Seq(1L << 56).toDF("id"), "id", 1, 2).collect()
    }
    assert(e.getMessage.contains("2^55"))
  }

  test("layout invariance: 1 vs 5 partitions") {
    val bigEdges = (0 until 200).flatMap(i =>
      Seq((i.toLong, ((i * 7 + 1) % 200).toLong),
        (i.toLong, ((i * 13 + 5) % 200).toLong)))
    val starts = (0 until 50).map(_.toLong * 4)
    def run(p: Int) =
      Graph.randomWalks(bigEdges.toDF("src", "dst").repartition(p),
          "src", "dst", starts.toDF("id"), "id", 2, 3, seed = 3L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getLong(3))).toSet
    assert(run(1) === run(5))
  }
}
