package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table registry for the test corpus (TPC-H-ish star schema + events +
 * documents + embeddings). Mirrors the reference's connector/catalog model
 * (Presto `catalog.schema.table`; /root/reference/mysql.properties) with
 * Spark's reader API: one parquet file per table under a scale-factor dir.
 *
 * Reads are plain `spark.read.parquet` so Catalyst's parquet source handles
 * predicate pushdown, column pruning, and partition splitting — at 100 TB
 * each table is a directory of many row-grouped files and the same code
 * path scales out (maxPartitionBytes controls split sizing).
 */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(s: SparkSession, d: String): DataFrame    = df(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = df(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = df(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = df(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = df(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = df(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = df(s, d, "lineitem")

  /** events.ts encoding has varied across driver data generations:
    * INT64 TIMESTAMP(NANOS) (read as long via the legacy flag, rebuilt at
    * µs precision — `div` keeps the arithmetic in exact integer space, ns
    * epochs overflow double) vs plain TIMESTAMP(MICROS) (surfaces as
    * TIMESTAMP_NTZ; cast to session-local TIMESTAMP — sessions pin UTC —
    * so downstream unix_micros/date_format see one type either way).
    * Dispatch on the actual parquet schema, not an assumed generation. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = df(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.select(col("event_id"), ts.as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
  }
  def documents(s: SparkSession, d: String): DataFrame = df(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = df(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` queries (CTEs,
    * correlated subqueries) can reference them by name. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val t = if (n == "events") events(spark, dir) else df(spark, dir, n)
      t.createOrReplaceTempView(n)
    }
}
