package graft

import graft.operators.RuntimeFilters

class RuntimeFiltersSpec extends GraftSpec {

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("x06 injects a bloom filter on the probe side; x05 does not") {
    val plain = executedPlanString(RuntimeFilters.urgentRevenue(spark, sf))
    assert(!plain.contains("might_contain") && !plain.toLowerCase.contains("bloom"),
      s"stock arm must not plan a bloom filter:\n$plain")
    val bloomed = RuntimeFilters.withBloomConfs(spark) {
      executedPlanString(RuntimeFilters.urgentRevenue(spark, sf))
    }
    assert(bloomed.contains("might_contain"),
      s"bloom arm planned no runtime filter:\n$bloomed")
  }

  test("bloom confs restore to their prior values after the entry") {
    val key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val before = spark.conf.getOption(key)
    RuntimeFilters.bloomOn(spark, sf).collect()
    assert(spark.conf.getOption(key) == before)
  }

  test("x05 and x06 agree with each other row for row") {
    val a = RuntimeFilters.bloomOff(spark, sf).collect().toSeq
    val b = RuntimeFilters.bloomOn(spark, sf).collect().toSeq
    assert(a == b, s"arms diverged: $a vs $b")
    assert(a.head.getLong(0) > 0)
  }
}
