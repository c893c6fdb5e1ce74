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
}
