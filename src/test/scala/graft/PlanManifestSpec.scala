package graft

/** Bench-plan regression tripwire: the physical plan of every inventory
  * entry, rendered canonically by [[graft.plans.PlanDigest]], is pinned
  * against the committed PLAN_MANIFEST.txt. A Spark upgrade, a conf
  * change, or a new optimizer rule that flips a broadcast to a shuffle
  * (or a hash join to a nested loop, or un-prunes a scan) passes every
  * row-correctness oracle and only surfaces at 100× the cost in
  * production — this spec catches it in CI instead.
  *
  * To regenerate after an INTENTIONAL plan change:
  *   GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanManifestSpec"
  * then review the PLAN_MANIFEST.txt diff like any other code change —
  * the diff IS the plan change review.
  */
class PlanManifestSpec extends GraftSpec {

  private val manifestPath = java.nio.file.Paths.get("PLAN_MANIFEST.txt")

  private def parse(text: String): Map[String, String] =
    text.split("(?m)^=== ").toSeq.filter(_.nonEmpty).map { block =>
      val (head, tree) = block.span(_ != '\n')
      head.trim -> tree.stripPrefix("\n")
    }.toMap

  test("every inventory entry's physical plan matches the committed manifest") {
    // Side-plan capture: entries that materialize inside their entry
    // function (Checkpoints.stage, the x06–x08 adaptive conf windows)
    // record the materialized subplan; it is appended to the entry's
    // section so the manifest audits the real plan, not the
    // RDDScan/LocalTableScan wrapper (r13 verdict finding).
    graft.plans.PlanDigest.captureSidePlans = true
    val current = try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        graft.plans.PlanDigest.drainSidePlans() // clear any stale capture
        val main = graft.plans.PlanDigest.canonical(fn(spark, sf))
        val sides = graft.plans.PlanDigest.drainSidePlans()
        name -> (main + sides.zipWithIndex.map { case ((label, tree), i) =>
          s"--- materialized in-entry [$i]: $label\n$tree"
        }.mkString)
      }
    } finally graft.plans.PlanDigest.captureSidePlans = false
    if (sys.env.contains("GRAFT_REGEN_PLANS")) {
      val rendered = current.map { case (n, t) => s"=== $n\n$t" }.mkString
      java.nio.file.Files.writeString(manifestPath, rendered)
      info(s"regenerated $manifestPath with ${current.size} plans")
    } else {
      assert(java.nio.file.Files.exists(manifestPath),
        "PLAN_MANIFEST.txt missing — GRAFT_REGEN_PLANS=1 sbt 'testOnly graft.PlanManifestSpec'")
      val committed = parse(java.nio.file.Files.readString(manifestPath))
      val missing = current.map(_._1).filterNot(committed.contains)
      val drifted = current.filter { case (n, t) =>
        committed.get(n).exists(_ != t)
      }
      val report = drifted.map { case (n, t) =>
        s"--- $n committed:\n${committed(n)}--- $n current:\n$t"
      }.mkString("\n")
      assert(missing.isEmpty && drifted.isEmpty,
        s"physical plans drifted from PLAN_MANIFEST.txt " +
          s"(new entries: ${missing.mkString(",")}; drifted: ${drifted.map(_._1).mkString(",")}).\n" +
          s"$report\nIf intentional, regenerate with GRAFT_REGEN_PLANS=1 and review the diff.")
    }
  }
}
