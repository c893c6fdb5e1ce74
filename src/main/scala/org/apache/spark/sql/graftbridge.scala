package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Thin bridge into `private[sql]` conversion helpers so the graft library
 * can wrap native Catalyst expressions as Columns (same technique as
 * public Spark extension libraries use for Dataset/Column factories).
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Force-load a conf-defined DSv2 catalog plugin into the session's
    * CatalogManager. `SHOW CATALOGS` lists only LOADED catalogs (the
    * manager's map keys + the session catalog — verified against the
    * 4.1 bytecode), so a catalog wired purely via `spark.sql.catalog.*`
    * confs stays invisible until first use; loading at wire time gives
    * Presto's SHOW CATALOGS contract. Throws whatever the plugin's
    * `initialize` throws (e.g. a JDBC catalog whose driver class is not
    * on the classpath). */
  def loadCatalog(spark: SparkSession, name: String): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.catalog(name)

  /** Set a key on the live SparkContext's SparkConf (spark-private).
    * New sessions (`newSession()` — e.g. each Thrift connection) build
    * their SQLConf by merging the CONTEXT conf, so this is the channel
    * that makes runtime-wired settings visible to future sessions. */
  def setContextConf(spark: SparkSession, key: String, value: String): Unit =
    spark.sparkContext.conf.set(key, value)
}
