package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Planted-violation twin of the scored `q_integrity` (the fixture corpus
  * is clean, so its oracle pins all-zeros; this proves the checks actually
  * fire).
  */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("audit counts orphans and duplicate keys exactly") {
    val dir = Files.createTempDirectory("graft-integrity").toString
    // orders 1..3 (order 3 duplicated), customer 1 only, order 2 → cust 99
    Seq((1L, 1L), (2L, 99L), (3L, 1L), (3L, 1L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lines: order 7 is an orphan; part 5 exists, part 6 doesn't;
    // supplier 1 exists, 2 doesn't; (orderkey, linenumber) duped once
    Seq((1L, 1, 5L, 1L), (7L, 1, 5L, 1L), (1L, 2, 6L, 2L), (1L, 2, 5L, 1L))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(Tuple1(5L)).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 0)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 7)).toDF("c_custkey", "c_nationkey") // nation 7 missing
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(Tuple1(0)).toDF("n_nationkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((10L, 1L), (10L, 2L), (11L, 3L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q_integrity")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "lineitem.l_orderkey->orders" -> 1L,
      "lineitem.l_partkey->part" -> 1L,
      "lineitem.l_suppkey->supplier" -> 1L,
      "orders.o_custkey->customer" -> 1L,
      "customer.c_nationkey->nation" -> 1L,
      "supplier.s_nationkey->nation" -> 0L,
      "orders.o_orderkey unique" -> 1L,
      "lineitem.(l_orderkey,l_linenumber) unique" -> 1L,
      "events.event_id unique" -> 1L))
  }
}
