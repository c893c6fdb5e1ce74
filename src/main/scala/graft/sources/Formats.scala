package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Source/sink format surface matching the reference's connector model
 * (Presto catalogs: hive parquet/orc, mysql JDBC —
 * /root/reference/mysql.properties) on Spark's DataSource V2 readers.
 * Thin, typed wrappers; all scale-out behavior (splits, pushdown,
 * partitioned writes) comes from the underlying Spark source.
 */
object Formats {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def readCsv(s: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def readJson(s: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = s.read
    schema.fold(r)(sc => r.schema(sc)).json(path)
  }

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /**
   * JDBC source builder — the Spark equivalent of the reference's MySQL
   * connector properties file (connector.name/connection-url/user/password).
   * `partitionColumn` + bounds shard the scan across executors; without it
   * a JDBC read is a single-task bottleneck at scale.
   */
  case class Jdbc(url: String, table: String, user: String, password: String,
                  partitionColumn: Option[String] = None,
                  lowerBound: Long = 0L, upperBound: Long = 0L,
                  numPartitions: Int = 8,
                  driver: Option[String] = None) {
    def reader(s: SparkSession): DataFrameReader = {
      val r0 = s.read.format("jdbc")
        .option("url", url).option("dbtable", table)
        .option("user", user).option("password", password)
      val r = driver.fold(r0)(d => r0.option("driver", d))
      partitionColumn.fold(r) { c =>
        r.option("partitionColumn", c)
          .option("lowerBound", lowerBound.toString)
          .option("upperBound", upperBound.toString)
          .option("numPartitions", numPartitions.toString)
      }
    }
    def load(s: SparkSession): DataFrame = reader(s).load()
  }

  /** v02_jdbc_roundtrip — the JDBC sink/scan path inside the driver's
    * correctness gate (not just JdbcSpec): write an orders slice through
    * Spark's jdbc sink into an embedded Derby database (the image's real
    * JDBC engine — the reference's demonstrated connector model), read it
    * back through [[Jdbc]] as a SHARDED scan (partitionColumn → 4
    * concurrent range queries, the posture a 100 TB JDBC ingest needs —
    * never a single-task scan), and aggregate with the oracle discipline.
    * The DuckDB oracle computes the same aggregate over the ORIGINAL
    * parquet — any type lossiness across the JDBC boundary (timestamps,
    * doubles, identifier casing) or a duplicated/dropped range-shard row
    * forks the hash. The slice is key-bounded so the entry gates the
    * PATH, not Derby's single-node insert throughput. */
  def jdbcRoundtripReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val src = Tables.orders(s, dir)
      .filter(col("o_orderkey") < 20000)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
    val db = "graftv02_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val url = s"jdbc:derby:memory:$db;create=true"
    src.write.format("jdbc").option("url", url).option("dbtable", "orders_rt")
      .mode("overwrite").save()
    val back = Jdbc(url, "orders_rt", user = "app", password = "",
      partitionColumn = Some("o_orderkey"), lowerBound = 0L,
      upperBound = 20000L, numPartitions = 4).load(s)
    back.groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"))
      .orderBy("o_orderstatus")
  }
}
