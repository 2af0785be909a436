package graft

/** Regression guards for the plan shapes SCALE.md claims — if a future
  * change un-pushes a filter or turns a broadcast join into a shuffle,
  * these fail before the benchmark does. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.executedPlan.toString

  test("s1: filter and projection reach the parquet scan") {
    val p = plan("s1_scan_filter")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThan(s_acctbal,1000.0)"), p)
    // projection pruned to the 3 selected columns (width-agnostic)
    assert(p.contains("ReadSchema: struct<s_suppkey:"), p)
    assert(!p.contains("s_nationkey") && !p.contains("s_address"), p)
  }

  test("dsl filter compiles to scan-level predicates") {
    val p = plan("dsl_filter_basic")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("BUILDING"), p)
  }

  test("enrichment lookup is a broadcast hash join") {
    val p = plan("j1_enrichment_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pricing aggregation is map-side partial") {
    val p = plan("q1_pricing")
    assert(p.contains("partial_sum"), p)
  }

  test("no query plans an accidental cartesian product") {
    // intentional cross products: brute-force ANN scores query×corpus by
    // design (broadcast nested loop); the top-level DSL packs 1-row
    // aggregate frames side by side
    val intended = Set("ann_brute_topk", "snmp_dsl_toplevel")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(intended)
      .filter { name =>
        val p = plan(name)
        p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
      }
    assert(offenders.isEmpty, s"unintended cross joins in: $offenders")
  }

  test("sql surface: views + plain sql run the same engine") {
    Graft.attachViews(spark, sf001)
    val n = spark.sql(
      """SELECT resource_site, count(*) AS n FROM resources
        |WHERE resource_type = 'standard' GROUP BY 1""".stripMargin).count()
    assert(n > 0)
  }
}
