package graft.tools
import org.apache.spark.sql.SparkSession
object BenchGc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    val warmDir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"START $name"); Console.flush()
      try fn(spark, warmDir).write.mode("overwrite").format("noop").save() catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save() catch { case _: Throwable => () }
      println(f"DONE $name ${(System.nanoTime()-t0)/1e9}%.2f"); Console.flush()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
