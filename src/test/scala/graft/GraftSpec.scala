package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all specs (one JVM-wide session, local[4]). */
trait GraftSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object GraftSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("local[4]", shufflePartitions = 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
