package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.dsl.{DslParseException, ResourceFilter}

/** Grammar + semantics of the resource-filter DSL
  * (reference `framework/resources.py:614-806`,
  * goldens `tests/test_framework.py:422-483`). */
class ResourceFilterSpec extends SparkSpec {
  import spark.implicits._

  private def resources = Seq(
    ("dc1", "network", "switch", "cisco", "sw1", "sw1.fqdn",
      Map("make" -> "Cisco", "os_version" -> "4.2", "model" -> "4948E")),
    ("dc1", "network", "load-balancer", "a10", "lb1", "lb1.fqdn",
      Map("make" -> "A10", "os_version" -> "2.7")),
    ("dc2", "system", "host", "linux", "h1", "h1.fqdn",
      Map("make" -> "Dell"))
  ).toDF("resource_site", "resource_class", "resource_subclass",
    "resource_type", "resource_id", "resource_endpoint", "resource_metadata")

  private def ids(q: String): Set[String] =
    resources.filter(ResourceFilter.parse(q))
      .select("resource_id").as[String].collect().toSet

  test("equality on fixed field") {
    assert(ids("""resource_site = "dc1"""") == Set("sw1", "lb1"))
  }

  test("eq/ne synonyms, case-insensitive keywords") {
    assert(ids("""resource_site EQ "dc1" and resource_type NE "a10"""") == Set("sw1"))
  }

  test("LIKE / NOT LIKE") {
    assert(ids("""resource_endpoint LIKE "sw%"""") == Set("sw1"))
    assert(ids("""resource_endpoint not like "sw%"""") == Set("lb1", "h1"))
  }

  test("IN / NOT IN") {
    assert(ids("""resource_site IN ("dc1", "dc3")""") == Set("sw1", "lb1"))
    assert(ids("""resource_site NOT IN ("dc1")""") == Set("h1"))
  }

  test("metadata predicates collapse the EAV join") {
    assert(ids("""resource_metadata.make = "Cisco"""") == Set("sw1"))
    // absent key → row filtered (matches EAV inner-join semantics)
    assert(ids("""resource_metadata.model != "X"""") == Set("sw1"))
    assert(ids("""resource_metadata.os_version LIKE "4%"""") == Set("sw1"))
  }

  test("AND binds tighter than OR (compiled-SQL precedence)") {
    // a OR b AND c ⇒ a OR (b AND c)
    assert(ids(
      """resource_type = "a10" OR resource_site = "dc1" AND resource_class = "system"""")
      == Set("lb1"))
  }

  test("the all-operators mega query parses and filters") {
    val q = """resource_class = "network" AND resource_subclass = "load-balancer" OR
      resource_metadata.os_version LIKE "4%" AND resource_site NOT IN ("test_site")
      AND resource_endpoint IN ("sw1.fqdn","test2") AND resource_type != "a10" OR
      resource_metadata.make NOT LIKE "A10%" AND resource_metadata.model NOT IN ("test1", "test2")"""
    assert(ids(q) == Set("lb1", "sw1"))
  }

  test("compiled Column goldens: every operator class pins its exact tree") {
    // The reference locks its DSL compiler output with exact expected SQL
    // strings (tests/test_framework.py:425-471). Same idea here: pin the
    // rendered Column tree, so a grammar change that stays semantics-
    // preserving on the small test corpus but rewrites the compiled
    // predicate cannot slip through unnoticed.
    def compiled(q: String): String = ResourceFilter.parse(q).toString
    val goldens = Seq(
      """resource_site = "dc1"""" ->
        "=(resource_site, 'dc1')",
      """resource_type != "a10"""" ->
        "!(=(resource_type, 'a10'))",
      """resource_site NE "dc1"""" -> // caseless keyword synonym
        "!(=(resource_site, 'dc1'))",
      """resource_endpoint LIKE "sw%"""" ->
        "like(resource_endpoint, 'sw%')",
      """resource_class NOT LIKE "net%"""" ->
        "!(like(resource_class, 'net%'))",
      """resource_site IN ("dc1", "dc3")""" ->
        "in(resource_site, 'dc1', 'dc3')",
      """resource_site NOT IN ("dc1")""" ->
        "!(in(resource_site, 'dc1'))",
      """resource_metadata.make = "Cisco"""" ->
        "=(resource_metadata['make'], 'Cisco')",
      """resource_metadata.os_version LIKE "4%"""" ->
        "like(resource_metadata['os_version'], '4%')",
      // precedence: a OR b AND c ⇒ a OR (b AND c)
      """resource_type = "a10" OR resource_site = "dc1" AND resource_class = "system"""" ->
        ("or(=(resource_type, 'a10'), " +
          "and(=(resource_site, 'dc1'), =(resource_class, 'system')))"))
    goldens.foreach { case (q, want) =>
      assert(compiled(q) == want, s"compile drift for: $q")
    }
    // the all-code-paths mega query (reference test_framework.py:440-444)
    val mega = """resource_class = "network" AND resource_subclass = "load-balancer" OR
      resource_metadata.os_version LIKE "4%" AND resource_site NOT IN ("test_site")
      AND resource_endpoint IN ("sw1.fqdn","test2") AND resource_type != "a10" OR
      resource_metadata.make NOT LIKE "A10%" AND resource_metadata.model NOT IN ("test1", "test2")"""
    assert(compiled(mega) ==
      "or(or(and(=(resource_class, 'network'), =(resource_subclass, 'load-balancer')), " +
        "and(and(and(like(resource_metadata['os_version'], '4%'), " +
        "!(in(resource_site, 'test_site'))), " +
        "in(resource_endpoint, 'sw1.fqdn', 'test2')), !(=(resource_type, 'a10')))), " +
        "and(!(like(resource_metadata['make'], 'A10%')), " +
        "!(in(resource_metadata['model'], 'test1', 'test2'))))")
  }

  test("escaped quotes in values") {
    val df = Seq(("r1", """va"l""")).toDF("resource_id", "resource_site")
      .withColumn("resource_metadata", map())
    val out = df.filter(ResourceFilter.parse("""resource_site = "va\"l""""))
    assert(out.count() == 1)
  }

  test("parse errors raise, like the reference ParseException") {
    intercept[DslParseException](ResourceFilter.parse(""))
    intercept[DslParseException](ResourceFilter.parse("resource_site = unquoted"))
    intercept[DslParseException](ResourceFilter.parse("""bogus_field = "x""""))
    intercept[DslParseException](ResourceFilter.parse("""resource_site = "x" AND"""))
    intercept[DslParseException](
      ResourceFilter.parse("""(resource_site = "x" OR resource_site = "y")"""))
  }
}
