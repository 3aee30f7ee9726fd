package graft.tools

import graft.{Warehouse, WarehouseOptions}
import org.apache.spark.sql.SparkSession

/** Usage example / smoke driver for the library surface: build a warehouse
  * from a CouchDB `_changes` feed file and query it with Spark SQL — the
  * end-to-end flow a couchwarehouse user runs
  * (reference README.md:28-67, 205-226).
  *
  * Run: `sbt "runMain graft.tools.Demo /root/reference/test"`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val fixtures = args.headOption.getOrElse("/root/reference/test")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Flow 1: single-table warehouse + SQL
    val w = Warehouse.start(spark, s"$fixtures/samplechanges.txt",
      WarehouseOptions(database = "mydb"))
    println("TABLES=" + w.tableNames.mkString(","))
    w.query("SELECT name, age, address_street FROM mydb ORDER BY id LIMIT 3").show(false)
    w.query("SELECT COUNT(*) AS n, ROUND(AVG(age),2) AS avg_age FROM mydb").show(false)

    // Flow 2: split mode + the README's cross-table LEFT JOIN
    val w2 = Warehouse.start(spark, s"$fixtures/samplechanges2.txt",
      WarehouseOptions(database = "shop", split = Some("type")))
    println("TABLES2=" + w2.tableNames.mkString(","))
    w2.query(
      """SELECT u.name, COUNT(o.id) AS orders
        |FROM shop_user u LEFT JOIN shop_order o ON o.customerId = u.id
        |GROUP BY u.name ORDER BY orders DESC, u.name LIMIT 3""".stripMargin).show(false)

    // Probes: bad selector and missing column fail cleanly
    try Warehouse.start(spark, s"$fixtures/samplechanges.txt",
      WarehouseOptions(database = "x", mangoSelector = Some("{bad")))
    catch { case e: Exception => println("PROBE_BAD_MANGO=" + e.getMessage) }
    try w.query("SELECT nickname FROM mydb").show()
    catch { case e: Exception =>
      println("PROBE_MISSING_COL=" + e.getMessage.linesIterator.next()) }

    println("CHECKPOINT=" + w.checkpoint)
    spark.stop()
  }
}
