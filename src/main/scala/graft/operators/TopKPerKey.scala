package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Partial top-k per key — the map-side-combine form of "top k rows per
 * group".
 *
 * The idiomatic `row_number() OVER (PARTITION BY key ORDER BY ord) <= k`
 * shuffles EVERY row of a group into one task and sorts it there. For
 * low-cardinality keys with huge groups (event types, languages, status
 * codes — exactly the shape event logs have) that is a skewed sort: at
 * 100 TB one task receives a whole key's rows. This operator first
 * reduces each input partition to at most k rows per key with bounded
 * heaps (a narrow pass, no shuffle), so the exchange moves <= k rows per
 * (key, input-partition) — hundreds of rows instead of hundreds of
 * billions — and the final exact window runs over that candidate set.
 * Result-identical to the plain window under the same (ord desc, id asc)
 * total order: every global top-k row is in its own partition's top-k.
 */
object TopKPerKey {

  /** Per-partition heap reduction + exact final window, for (key, ord, id)
    * rows ordered by (ord desc, id asc). */
  def topK(ds: Dataset[(String, Double, Long)], k: Int): DataFrame = {
    val s = ds.sparkSession
    import s.implicits._
    // PriorityQueue dequeues its Ordering's maximum; rank the WEAKEST row
    // (smallest ord, then largest id) as the maximum so it is what the
    // k+1-th insertion evicts.
    val weakestFirst = Ordering.by[(Double, Long), (Double, Long)] {
      case (v, id) => (-v, id)
    }
    val partial = ds.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[String, mutable.PriorityQueue[(Double, Long)]]
      it.foreach { case (key, v, id) =>
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty(weakestFirst))
        if (h.size < k) h.enqueue((v, id))
        else {
          val (wv, wid) = h.head
          if (v > wv || (v == wv && id < wid)) { h.dequeue(); h.enqueue((v, id)) }
        }
      }
      heaps.iterator.flatMap { case (key, h) =>
        h.iterator.map { case (v, id) => (key, v, id) }
      }
    }
    val w = Window.partitionBy(col("key")).orderBy(col("ord").desc, col("id"))
    partial.toDF("key", "ord", "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** The measured shape: 3 keys (returnflags) over the whole lineitem —
    * the window form funnels every row into 3 sort tasks. The synthetic
    * row id (orderkey * 10 + linenumber) is unique, making the total
    * order — and therefore both arms — deterministic. */
  private def lineitemRows(s: SparkSession, d: String): Dataset[(String, Double, Long)] = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"))
      .as[(String, Double, Long)]
  }

  private val K = 5

  /** x03: the anti-pattern under measurement — plain window top-5 per
    * returnflag: 3 keys, so the whole table shuffles into 3 sort tasks. */
  def topkPlain(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("rid"))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("l_returnflag"), col("rid"), col("l_extendedprice"), col("rn"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** x04: the fix — identical result (same oracle pins it) via the
    * partial heap reduction; the exchange carries <= 5 rows per
    * (returnflag, input partition). */
  def topkPartial(s: SparkSession, d: String): DataFrame =
    topK(lineitemRows(s, d), K)
      .select(col("key").as("l_returnflag"), col("id").as("rid"),
        col("ord").as("l_extendedprice"), col("rn"))
      .orderBy(col("l_returnflag"), col("rn"))
}
