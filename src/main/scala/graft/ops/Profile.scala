package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling: the per-column statistics pass every ingest/curation
  * pipeline runs before anything else — row counts, null counts, distinct
  * cardinalities, value ranges — emitted LONG-format (one row per column)
  * so the profile of a 1000-column table is still a 1000-row table, not a
  * 4000-column row.
  *
  * Scale shape: [[profile]] runs one column-pruned scan per profiled
  * column (parquet reads just that column's pages; the N scans together
  * read ≈ one full-table scan of IO, each a partial-aggregate job whose
  * shuffle is ONE row of partials per partition — the exact-distinct
  * count is the only per-value state and rides a two-stage
  * partial/merge). [[approxProfile]] collapses to a SINGLE scan for all
  * columns by swapping exact distinct counts for HLL++ estimates
  * (`approx_count_distinct`, fixed sketch state per column) — the shape
  * to prefer at 100 TB when ±2 % cardinality suffices; everything else it
  * reports stays exact.
  *
  * min/max are emitted as strings so heterogeneous column types coexist
  * in one long-format result. Callers needing typed extremes re-read the
  * one column they care about.
  */
object Profile {

  /** Exact per-column profile of `cols`: `(col_name, n_rows, n_nulls,
    * n_distinct, min_value, max_value)`, one row per column, in the
    * caller's column order (distinct excludes nulls, SQL semantics; the
    * union of single-row aggregates keeps row order deterministic).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    cols.map { c => oneCol(df, c, count_distinct(col(c))) }
      .reduce(_ unionAll _)
  }

  /** Single-scan profile: exact counts/nulls/extremes, HLL++ (rsd 0.02)
    * distinct estimates — all columns in ONE pass over the table.
    */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "approxProfile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(col(c)).as(s"__nn_$c"),
        approx_count_distinct(col(c), 0.02).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to long format: a per-column struct array
    // exploded on the driver-free expression path (the row is 1×(5·N))
    val entries = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__rows_$c").as("n_rows"),
        (col(s"__rows_$c") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }: _*)
    wide.select(explode(entries).as("e")).select("e.*")
  }

  private def oneCol(df: DataFrame, c: String, distinct: Column): DataFrame =
    df.select(col(c))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        distinct.as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
      .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
}
