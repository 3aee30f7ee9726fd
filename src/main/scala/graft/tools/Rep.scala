package graft.tools
import org.apache.spark.sql.SparkSession
object Rep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 10) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.1")
        .write.mode("overwrite").format("noop").save()
      println(f"TIME run$i ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
