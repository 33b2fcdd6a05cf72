package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Traverse

/** Dev harness: stage-by-stage counts for the q354 depth-3 round trip. */
object ScratchDepth3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

    val leaves = t("lineitem").select(
      concat(lit("L"), col("l_orderkey"), lit("_"),
        col("l_linenumber")).as("id"),
      concat(lit("O"), col("l_orderkey")).as("_pid"),
      col("l_quantity").cast("long").as("_q"))
      .groupBy("id", "_pid").agg(sum("_q").as("qty"))
    val orders = t("orders").select(
      concat(lit("O"), col("o_orderkey")).as("id"),
      concat(lit("C"), col("o_custkey")).as("_pid"))
    val custs = t("customer").select(
      concat(lit("C"), col("c_custkey")).as("id"),
      concat(lit("N"), col("c_nationkey")).as("_pid"))
    val roots = t("nation").select(
      concat(lit("N"), col("n_nationkey")).as("id"))
    println(s"leaves=${leaves.count()} orders=${orders.count()} custs=${custs.count()} roots=${roots.count()}")

    val ordNested = orders
      .join(leaves.select(col("_pid").as("_k"),
        struct(col("id"), col("qty")).as("_c")), col("id") === col("_k"))
      .groupBy(col("id"), col("_pid"))
      .agg(array_sort(collect_list(col("_c"))).as("chunks"))
    println(s"ordNested=${ordNested.count()} leavesIn=${ordNested.select(explode(col("chunks"))).count()}")
    val custNested = custs
      .join(ordNested.select(col("_pid").as("_k"),
          struct(col("id"), col("chunks")).as("_c")),
        custs("id") === col("_k"))
      .groupBy(custs("id"), custs("_pid"))
      .agg(array_sort(collect_list(col("_c"))).as("chunks"))
    println(s"custNested=${custNested.count()}")
    val nested = roots
      .join(custNested.select(col("_pid").as("_k"),
          struct(col("id"), col("chunks")).as("_c")),
        roots("id") === col("_k"))
      .groupBy(roots("id"))
      .agg(array_sort(collect_list(col("_c"))).as("chunks"))
    println(s"nested=${nested.count()}")
    val trav0 = Traverse.traverse(nested, "ccc")
    println(s"trav0=${trav0.count()} distinct=${trav0.select("id").distinct().count()}")

    val updates = leaves.where(col("qty") >= 30L)
      .select(col("id"), (col("qty") * 10L).as("qty"))
    val written = Traverse.setByPath(nested, "ccc", updates)
    val trav = Traverse.traverse(written, "ccc")
    println(s"trav=${trav.count()} distinct=${trav.select("id").distinct().count()}")
    trav.groupBy("id").count().where(col("count") > 1).show(5, false)
    spark.stop()
  }
}
