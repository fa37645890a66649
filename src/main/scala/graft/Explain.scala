package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump `explain("formatted")` for named queries.
  * `SPARK_GRAFT_SF_DIR` picks the data dir (default sf0.1) — ext
  * queries construct eagerly (training collects, store builds), so
  * plan capture for them wants the small SFs. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
