package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Schema-checked readers for the ten engine tables.
  *
  * Columns are the ones documented in FIXTURES.md; each reader
  * `select`s them explicitly so a drifted fixture fails fast at
  * analysis time instead of mid-query. The reference's data model is a
  * wide-column store (SURVEY.md §1.1); here every table is a columnar
  * parquet DataFrame and Cassandra's partition/clustering keys map to
  * shuffle/sort keys chosen per operator.
  *
  * Scale note (100 TB): these readers deliberately do NOT cache or
  * repartition — Catalyst prunes columns and pushes filters into the
  * parquet scan, and each operator decides its own partitioning.
  */
object Tables {
  private def load(s: SparkSession, dir: String, name: String)(cols: String*): DataFrame =
    s.read.parquet(s"$dir/$name.parquet").select(cols.map(col): _*)

  def region(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "region")("r_regionkey", "r_name")

  def nation(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "nation")("n_nationkey", "n_name", "n_regionkey")

  def supplier(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "supplier")("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  def customer(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  def part(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "part")("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")

  def orders(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  def lineitem(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads
    * as a raw long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    * Verify/Bench/test sessions). Convert to µs TimestampType here —
    * truncation matches DuckDB's ns→µs read of the same file. */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = load(s, dir, "events")("event_id", "ts", "user_id", "event_type", "value", "props")
    raw.schema("ts").dataType match {
      // Cast to NTZ: every timestamp in the engine is timezone-naive
      // (parquet isAdjustedToUTC=false ≡ DuckDB TIMESTAMP); session
      // timezone is pinned UTC so the cast is value-preserving.
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => raw
    }
  }

  /** Epoch milliseconds of a naive (NTZ) timestamp interpreted as UTC
    * — matches DuckDB `epoch_ms(ts)`. */
  def epochMs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.unix_millis
    unix_millis(c.cast("timestamp"))
  }

  def documents(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")("doc_id", "text", "lang", "source", "n_chars")

  def embeddings(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")("vec_id", "embedding", "label")
}
