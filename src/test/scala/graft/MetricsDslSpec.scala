package graft

import org.apache.spark.sql.functions._
import graft.dsl.{DslParseException, MetricsDsl}
import graft.dsl.MetricsDsl.{GroupConfig, TargetSpec}

/** The computed-metrics DSL against the worked examples of
  * `docs/Generic_SNMP_Polling_DSL.md` (temperature C→F with cross-table
  * arithmetic, count-where fans, indices allow-list, index_transform). */
class MetricsDslSpec extends SparkSpec {
  import spark.implicits._

  private def t(pairs: (String, String)*) =
    pairs.toSeq.toDF("index", "value")

  private lazy val tables = Map(
    "temp_sensor_name" -> t("1" -> "PSU 0", "2" -> "PSU 1", "3" -> "Fan 0"),
    "temp_sensor_values" -> t("1" -> "30", "2" -> "0", "3" -> "bad-int"),
    "temp_sensor_scales" -> t("1" -> "2", "2" -> "1", "3" -> "1"),
    "fan_statuses" -> t("f1" -> "2", "f2" -> "2", "f3" -> "5"),
    "entity_fru_control" -> t("e1" -> "2", "e2" -> "9", "e3" -> "1", "x9" -> "2"),
    "power_supplies" -> t("e1" -> "PSU A", "e2" -> "PSU B", "e3" -> "PSU C"))

  test("cross-table arithmetic + transform + indices_from (doc worked example)") {
    val cfg = GroupConfig("environment", 60,
      dimensions = Map("sensor" -> TargetSpec("temp_sensor_name.$index")),
      metrics = Map("temperature_fahrenheit" -> TargetSpec(
        value = "int(temp_sensor_values.$index) * int(temp_sensor_scales.$index)",
        valueType = "float",
        transform = Some("lambda x: round((x * 1.8) + 32, 2) if x != 0 else 0.0"),
        indicesFrom = Some("temp_sensor_scales"))))
    val out = MetricsDsl.evaluateIndexed(cfg, tables).get
      .select("index", "sensor", "temperature_fahrenheit")
      .as[(String, String, Double)].collect().sortBy(_._1)
    // index 3: int('bad-int') fails → row skipped (reference eval-error skip)
    assert(out.toSeq == Seq(
      ("1", "PSU 0", 140.0),  // 30*2=60C → 140F
      ("2", "PSU 1", 0.0)))   // zero-guard branch of the transform
  }

  test("indices allow-list restricts output (J5)") {
    val cfg = GroupConfig("environment", 60,
      dimensions = Map("sensor" -> TargetSpec("temp_sensor_name.$index",
        indices = Some(Seq("1")))),
      metrics = Map("temp" -> TargetSpec("int(temp_sensor_scales.$index)",
        valueType = "int", indices = Some(Seq("1")))))
    val out = MetricsDsl.evaluateIndexed(cfg, tables).get
    assert(out.select("index").as[String].collect().toSeq == Seq("1"))
  }

  test("default index resolution uses the first referenced table (J7)") {
    val cfg = GroupConfig("g", 60,
      dimensions = Map(),
      metrics = Map("v" -> TargetSpec("int(temp_sensor_scales.$index)",
        valueType = "int")))
    val out = MetricsDsl.evaluateIndexed(cfg, tables).get
    assert(out.count() == 3)
  }

  test("index_transform remaps the index space before lookup (J6)") {
    val cfg = GroupConfig("g", 60,
      dimensions = Map("fru_name" -> TargetSpec("power_supplies.$index",
        indexTransform = Some(Map("f1" -> "e1", "f2" -> "e2")),
        indicesFrom = Some("fan_statuses"))),
      metrics = Map("status" -> TargetSpec("int(fan_statuses.$index)",
        valueType = "int", indicesFrom = Some("fan_statuses"))))
    val out = MetricsDsl.evaluateIndexed(cfg, tables).get
      .select("index", "fru_name", "status")
      .as[(String, Option[String], Long)].collect().sortBy(_._1)
    // f3 has no index_transform entry → the DIMENSION lookup fails and is
    // skipped at f3 only; the metric survives, so the group still emits
    // with the dimension absent (plugin_polling_generic_snmp.py:494-505)
    assert(out.toSeq == Seq(
      ("f1", Some("PSU A"), 2L), ("f2", Some("PSU B"), 2L), ("f3", None, 5L)))
  }

  test("count-where comprehension shapes (A3, doc examples)") {
    val cfg = GroupConfig("environment", 60,
      dimensions = Map(),
      metrics = Map(
        "fans_ok" -> TargetSpec(
          "len([x for x in fan_statuses.values() if x == '2'])",
          valueType = "int"),
        "power_units_on" -> TargetSpec(
          "len([(x,y) for (x,y) in entity_fru_control.items() if x in power_supplies and y in ['2', '9', '12']])",
          valueType = "int"),
        "fans_total" -> TargetSpec("3", valueType = "int")))
    val out = MetricsDsl.evaluateTopLevel(cfg, tables).get
      .select("fans_ok", "fans_total", "power_units_on")
      .as[(Long, Long, Long)].head()
    // power: e1(2)✓ e2(9)✓ e3(1)✗; x9 not in power_supplies
    assert(out == ((2L, 3L, 2L)))
  }

  test("empty-dimension gate drops rows unless ignored (P10)") {
    val tbl = tables + ("names" -> t("1" -> "eth0", "2" -> ""))
    def cfg(ignore: Boolean) = GroupConfig("g", 60,
      dimensions = Map("name" -> TargetSpec("names.$index")),
      metrics = Map("v" -> TargetSpec("int(temp_sensor_scales.$index)",
        valueType = "int")),
      ignoreEmptyDimensions = ignore)
    // metric exists at indices 1,2,3; names has 1→"eth0", 2→"" (gated),
    // 3→absent (a MISSING dimension is not empty — row survives)
    assert(MetricsDsl.evaluateIndexed(cfg(false), tbl).get.count() == 2)
    assert(MetricsDsl.evaluateIndexed(cfg(true), tbl).get.count() == 3)
  }

  test("top-level literal dimensions attach to every group; v0.1 bare literals") {
    // v0.2: quoted literal; v0.1: the bare words data/ctrl/dram are
    // string literals (_V1_STRING_LITERALS, plugin:481-483)
    def cfg(ver: String, dimValue: String) = GroupConfig("g", 60,
      dimensions = Map(
        "bank" -> TargetSpec(dimValue),
        "sensor" -> TargetSpec("temp_sensor_name.$index")),
      metrics = Map("v" -> TargetSpec("int(temp_sensor_scales.$index)",
        valueType = "int")),
      schemaVersion = ver)
    val v2 = MetricsDsl.evaluateIndexed(cfg("0.2", "'mem'"), tables).get
    assert(v2.select("bank").distinct().as[String].collect().toSeq == Seq("mem"))
    val v1 = MetricsDsl.evaluateIndexed(cfg("0.1", "data"), tables).get
    assert(v1.select("bank").distinct().as[String].collect().toSeq == Seq("data"))
    assert(v1.count() == 3)
  }

  test("top-level aggregates apply type + transform; composites evaluate") {
    val cfg = GroupConfig("g", 60,
      dimensions = Map("rack" -> TargetSpec("'r1'")),
      metrics = Map(
        // transform + float type on an aggregate (plugin :516-521)
        "fans_x8" -> TargetSpec(
          "len([x for x in fan_statuses.values() if x == '2'])",
          valueType = "float", transform = Some("lambda x: x * 8")),
        // composite: arithmetic AROUND the aggregate
        "fans_plus_one" -> TargetSpec(
          "len([x for x in fan_statuses.values() if x == '2']) + 1",
          valueType = "int")))
    val out = MetricsDsl.evaluateTopLevel(cfg, tables).get
      .select("fans_x8", "fans_plus_one", "rack")
      .as[(Double, Long, String)].head()
    assert(out == ((16.0, 3L, "r1"))) // 2 fans '2' → ×8 and +1
  }

  test("top-level group is gated on empty top-level dimensions") {
    val cfg = GroupConfig("g", 60,
      dimensions = Map("rack" -> TargetSpec("''")),
      metrics = Map("n" -> TargetSpec("3", valueType = "int")))
    assert(MetricsDsl.evaluateTopLevel(cfg, tables).get.count() == 0)
    assert(MetricsDsl.evaluateTopLevel(
      cfg.copy(ignoreEmptyDimensions = true), tables).get.count() == 1)
  }

  test("v0.2 merges top-level metrics into every indexed group") {
    val cfg = GroupConfig("g", 60,
      dimensions = Map("sensor" -> TargetSpec("temp_sensor_name.$index")),
      metrics = Map(
        "v" -> TargetSpec("int(temp_sensor_scales.$index)", valueType = "int"),
        "fans_ok" -> TargetSpec(
          "len([x for x in fan_statuses.values() if x == '2'])",
          valueType = "int")))
    val out = MetricsDsl.evaluateIndexed(cfg, tables).get
    assert(out.count() == 3)
    assert(out.select("fans_ok").distinct().as[Long].collect().toSeq == Seq(2L))
    // v0.1 keeps them separate
    val v1 = MetricsDsl.evaluateIndexed(
      cfg.copy(schemaVersion = "0.1"), tables).get
    assert(!v1.columns.contains("fans_ok"))
  }

  test("numeric literal dimensions render via str() on every group") {
    val cfg = GroupConfig("g", 60,
      dimensions = Map(
        "slot" -> TargetSpec("42", valueType = "int"),
        "sensor" -> TargetSpec("temp_sensor_name.$index")),
      metrics = Map("v" -> TargetSpec("int(temp_sensor_scales.$index)",
        valueType = "int")))
    val out = MetricsDsl.evaluateIndexed(cfg, tables).get
    assert(out.select("slot").distinct().as[String].collect().toSeq == Seq("42"))
  }

  test("bare identifiers starting with x parse as table refs, not the lambda var") {
    val e = MetricsDsl.parseExpression("xmit_errors")
    assert(e == MetricsDsl.TableRef("xmit_errors"))
  }

  test("closed grammar rejects arbitrary code (the eval hole stays closed)") {
    intercept[DslParseException](
      MetricsDsl.parseExpression("__import__('os').system('rm -rf /')"))
    intercept[DslParseException](
      MetricsDsl.parseTransform("lambda x: open('/etc/passwd')"))
    intercept[DslParseException](MetricsDsl.parseExpression(""))
  }
}
