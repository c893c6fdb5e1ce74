package graft

/** The cluster-elasticity surface: the reference's add_worker/del_worker
  * maps to a declared executor range under dynamic allocation. */
class SessionSpec extends GraftSpec {

  test("elasticity confs declare a worker range with safe scale-in") {
    val c = GraftSession.elasticityConfs(minWorkers = 1, maxWorkers = 100,
      initialWorkers = 4)
    assert(c("spark.dynamicAllocation.enabled") == "true")
    assert(c("spark.dynamicAllocation.minExecutors") == "1")
    assert(c("spark.dynamicAllocation.maxExecutors") == "100")
    assert(c("spark.dynamicAllocation.initialExecutors") == "4")
    // without shuffle tracking (or an external shuffle service), removing
    // an executor mid-query loses its shuffle output — must be on
    assert(c("spark.dynamicAllocation.shuffleTracking.enabled") == "true")
  }

  test("clusterBuilder composes graft defaults with the elasticity surface") {
    // builder construction must be side-effect free (no session started)
    val b = GraftSession.clusterBuilder("spark://example:7077", maxWorkers = 8)
    assert(b != null)
  }

  test("active session carries graft engine defaults") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.extensions") == "graft.functions.GraftExtensions")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}
