package graft

import org.apache.spark.sql.functions._
import graft.sources.Formats

/**
 * Live JDBC round-trip: the reference's demonstrated connector is a JDBC
 * database (mysql.properties). No network DB exists in this container, but
 * the Spark distribution ships Apache Derby — an embedded JDBC engine —
 * so the JDBC source path is exercised end-to-end against a real driver:
 * write through Spark's jdbc sink, read back through Formats.Jdbc with a
 * sharded (partitionColumn) scan, and check filter pushdown to the DB.
 */
class JdbcSpec extends GraftSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JDBC source round-trips through embedded Derby with a partitioned read") {
    val src = (1L to 100L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    src.write.format("jdbc")
      .option("url", url).option("dbtable", "people")
      .mode("overwrite").save()

    val jdbc = Formats.Jdbc(url, "people", user = "app", password = "",
      partitionColumn = Some("id"), lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    val got = jdbc.load(spark)
    // the scan must actually shard: 4 concurrent range-queries, not 1 task
    assert(got.rdd.getNumPartitions == 4)
    assert(got.count() == 100)
    val total = got.agg(sum($"score")).head().getDouble(0)
    assert(math.abs(total - (1 to 100).map(_ * 1.5).sum) < 1e-9)
  }

  test("JDBC predicate pushes down to the database, not a post-filter scan") {
    val jdbc = Formats.Jdbc(url, "people", user = "app", password = "")
    val filtered = jdbc.load(spark).filter($"id" <= 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"filter must reach the JDBC scan:\n$plan")
    assert(filtered.count() == 10)
  }
}
