package graft
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: run every judged query with a name marker so
  * log warnings (e.g. WindowExec "No Partition Defined") can be
  * attributed to the query that triggers them.
  */
object WarnHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        graft.Graft.excludedOptimizerRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.foreach { case (name, fn) =>
      Console.err.println(s"### QUERY $name")
      Console.err.flush()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => Console.err.println(s"### FAIL $name ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
