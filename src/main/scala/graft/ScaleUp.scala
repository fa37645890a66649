package graft
import org.apache.spark.sql.functions._
/** Dev experiment: build a key-shifted 10x copy of the star tables
  * under /tmp and time headline queries — measured evidence that the
  * plans scale linearly (PLANS.md "Reading these at 100 TB"). */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/scale10"
    val copies = 10
    val li = Tables.lineitem(spark, src)
    val o = Tables.orders(spark, src)
    val maxOrder = o.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val shifted = (0 until copies).map { i =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrder))
    }.reduce(_ unionByName _)
    shifted.write.mode("overwrite").parquet(s"$dst/orders.parquet")
    val liShifted = (0 until copies).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOrder))
    }.reduce(_ unionByName _)
    liShifted.write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    for (t <- Seq("customer", "supplier", "part", "nation", "region"))
      Tables.load(spark, src, t).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    println(s"[scaleup] built $dst: lineitem=${liShifted.count()} orders=${shifted.count()}")
    def time(n: String, dir: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).collect()
      println(f"[scaleup] $n%-30s $dir%-22s ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    for (q <- Seq("q1_total_revenue", "q6_revenue_per_region_year", "q8_avg_shipping_days");
         _ <- 1 to 2) { time(q, src); time(q, dst) }
    spark.stop()
  }
}
