package graft.dsl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.parsing.combinator.RegexParsers

/** The computed-metrics DSL over SNMP-style index tables — the Spark-native
  * re-expression of the reference's Generic SNMP plugin
  * (`plugins/polling/generic/snmp/plugin_polling_generic_snmp.py:255-678`,
  * `docs/Generic_SNMP_Polling_DSL.md`).
  *
  * The reference evaluates per-row "value" expressions and unary
  * "transform" lambdas with Python `eval` — an unbounded surface its own
  * docs flag as unsafe (`docs/Concepts.md:281-286`). This engine replaces
  * it with a CLOSED grammar covering every shape the reference's docs and
  * plugins actually use (SURVEY.md §7.3), compiled to Catalyst `Column`
  * trees:
  *
  * {{{
  *   expr      := term (('+'|'-') term)*
  *   term      := unary (('*'|'/') unary)*
  *   unary     := '-' unary | atom
  *   atom      := number | 'string' | cast '(' expr ')' | round2
  *             | tableRef | '(' expr ')' | countWhere
  *   cast      := int | float | str | long | double
  *   round2    := round '(' expr ',' number ')'
  *   tableRef  := ident '.$index'
  *   countWhere:= len([x for x in T.values() if x <cmp> lit [and|or ...]])
  *             | len([(x,y) for (x,y) in T.items() if x in S and y in [lits]])
  *   transform := lambda x: expr [if cond else expr]      (unary lambdas)
  * }}}
  *
  * Evaluation semantics (matching `:451-541`):
  *  - target indices: explicit `indices` (J5) > `indices_from` table (J4)
  *    > index set of the first table referenced (J7);
  *  - `table.$index` lookups are inner joins on `index` — a missing key
  *    raised KeyError and skipped the row in the reference (J3);
  *  - `index_transform` remaps the group index into a target table's index
  *    space through a static mapping before the lookup (J6);
  *  - cast failures (reference `int('abc')` raising) drop the row;
  *  - a group row with any empty dimension value is dropped unless
  *    `ignoreEmptyDimensions` (P10, `:524-584`);
  *  - count-where expressions aggregate over whole tables → top-level
  *    metrics (A3).
  *
  * Scale: oid tables are per-device and small — every lookup join is a
  * broadcast; count-where aggregates are partial-aggregated map-side. At
  * 100 TB (millions of devices × tables), the same evaluation runs per
  * device partition: tables carry a `device_id` column and every join/agg
  * adds it as a leading key — the plan shape is unchanged.
  */
object MetricsDsl {

  // ------------------------------------------------------------------ AST
  sealed trait Expr
  case class Num(v: Double) extends Expr
  case class Str(v: String) extends Expr
  case class TableRef(table: String) extends Expr
  case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  case class Neg(e: Expr) extends Expr
  case class Cast(to: String, e: Expr) extends Expr
  case class Round(e: Expr, digits: Int) extends Expr
  case class Var(name: String) extends Expr // transform's lambda variable

  sealed trait Cond
  case class Cmp(op: String, l: Expr, r: Expr) extends Cond
  case class AndOr(op: String, l: Cond, r: Cond) extends Cond

  /** len([x for x in T.values() if <conds on x>]) */
  case class CountValuesWhere(table: String, cond: Cond) extends Expr
  /** len([(x,y) for (x,y) in T.items() if x in S and y in [list]]) */
  case class CountItemsKeyIn(table: String, keySet: String, values: Seq[String])
    extends Expr

  case class Lambda(body: Expr, cond: Option[Cond], orElse: Option[Expr])

  // --------------------------------------------------------------- parser
  private object P extends RegexParsers {
    val ident: Parser[String] = """[A-Za-z_]\w*""".r
    val number: Parser[Double] = """-?\d+(\.\d+)?""".r ^^ (_.toDouble)
    val strLit: Parser[String] = """'[^']*'""".r ^^ (s => s.substring(1, s.length - 1))

    def expr: Parser[Expr] = term ~ rep(("+" | "-") ~ term) ^^ {
      case t ~ rest => rest.foldLeft(t) { case (l, op ~ r) => BinOp(op, l, r) }
    }
    def term: Parser[Expr] = unary ~ rep(("*" | "/") ~ unary) ^^ {
      case t ~ rest => rest.foldLeft(t) { case (l, op ~ r) => BinOp(op, l, r) }
    }
    def unary: Parser[Expr] = ("-" ~> unary ^^ Neg.apply) | atom

    def castFn: Parser[Expr] =
      ("int" | "float" | "str" | "long" | "double") ~ ("(" ~> expr <~ ")") ^^ {
        case to ~ e => Cast(to, e)
      }
    def roundFn: Parser[Expr] =
      "round" ~> "(" ~> expr ~ ("," ~> """\d+""".r) <~ ")" ^^ {
        case e ~ d => Round(e, d.toInt)
      }
    def countValues: Parser[Expr] =
      "len" ~> "(" ~> "[" ~> ident ~ ("for" ~> ident <~ "in") ~ (ident <~ ".values()") ~
        ("if" ~> cond) <~ "]" <~ ")" ^^ {
        case _ ~ _ ~ table ~ c => CountValuesWhere(table, c)
      }
    def countItems: Parser[Expr] =
      "len" ~> "(" ~> "[" ~> "(" ~> ident ~ ("," ~> ident <~ ")") ~
        ("for" ~> "(" ~> ident ~ ("," ~> ident) <~ ")" <~ "in") ~
        (ident <~ ".items()") ~ ("if" ~> ident <~ "in") ~ ident ~
        ("and" ~> ident <~ "in") ~ ("[" ~> rep1sep(strLit, ",") <~ "]") <~
        "]" <~ ")" ^^ {
        case _ ~ _ ~ _ ~ table ~ _ ~ keySet ~ _ ~ vals =>
          CountItemsKeyIn(table, keySet, vals)
      }
    def tableRef: Parser[Expr] = ident <~ ".$index" ^^ TableRef.apply
    // lookahead: bare identifiers starting with x (e.g. xmit_errors) must
    // not be swallowed by the lambda variable
    def variable: Parser[Expr] = """x(?!\w)""".r ^^^ Var("x")

    def atom: Parser[Expr] =
      countValues | countItems | roundFn | castFn | tableRef |
        (number ^^ Num.apply) | (strLit ^^ Str.apply) |
        ("(" ~> expr <~ ")") | variable | (ident ^^ TableRef.apply)

    def cmpOp: Parser[String] = "==" | "!=" | "<=" | ">=" | "<" | ">"
    def simpleCond: Parser[Cond] = expr ~ cmpOp ~ expr ^^ {
      case l ~ op ~ r => Cmp(op, l, r)
    }
    def cond: Parser[Cond] = simpleCond ~ rep(("and" | "or") ~ simpleCond) ^^ {
      case c ~ rest => rest.foldLeft(c) { case (l, op ~ r) => AndOr(op, l, r) }
    }

    def lambda: Parser[Lambda] =
      "lambda" ~> "x" ~> ":" ~> expr ~ opt(("if" ~> cond) ~ ("else" ~> expr)) ^^ {
        case body ~ None => Lambda(body, None, None)
        case body ~ Some(c ~ e) => Lambda(body, Some(c), Some(e))
      }

    def parseExpr(s: String): Expr = parseAll(expr, s) match {
      case Success(e, _) => e
      case NoSuccess(msg, next) =>
        throw new DslParseException(s"metrics-dsl parse error at ${next.pos}: $msg in: $s")
      case other => throw new DslParseException(s"unexpected: $other")
    }
    def parseLambda(s: String): Lambda = parseAll(lambda, s) match {
      case Success(l, _) => l
      case NoSuccess(msg, next) =>
        throw new DslParseException(s"transform parse error at ${next.pos}: $msg in: $s")
      case other => throw new DslParseException(s"unexpected: $other")
    }
  }

  // --------------------------------------------------------------- config
  /** One metric or dimension target (`_process_shorthand`/`_add_defaults`,
    * `plugin_polling_generic_snmp.py:378-449`). */
  case class TargetSpec(
      value: String,
      valueType: String = "string", // type passed INTO transform (:290)
      metricType: String = "gauge", // gauge | counter (metrics only)
      transform: Option[String] = None,
      indices: Option[Seq[String]] = None,
      indicesFrom: Option[String] = None,
      indexTransform: Option[Map[String, String]] = None)

  case class GroupConfig(
      groupType: String,
      interval: Long,
      dimensions: Map[String, TargetSpec],
      metrics: Map[String, TargetSpec],
      ignoreEmptyDimensions: Boolean = false,
      schemaVersion: String = "0.2")

  /** v0.1 enrichment configs used these bare words as string literals;
    * the reference quotes them before eval
    * (`_V1_STRING_LITERALS`/`:481-483`). */
  private val V1StringLiterals = Set("data", "ctrl", "dram")

  private def parseTarget(value: String, schemaVersion: String): Expr =
    if (schemaVersion == "0.1" && V1StringLiterals.contains(value.trim))
      Str(value.trim)
    else P.parseExpr(value)

  // -------------------------------------------------------------- compile
  /** Collect the tables referenced by per-index lookups in an expression. */
  def referencedTables(e: Expr): Set[String] = e match {
    case TableRef(t)        => Set(t)
    case BinOp(_, l, r)     => referencedTables(l) ++ referencedTables(r)
    case Neg(x)             => referencedTables(x)
    case Cast(_, x)         => referencedTables(x)
    case Round(x, _)        => referencedTables(x)
    case _                  => Set.empty
  }

  private def isAggregate(e: Expr): Boolean = e match {
    case _: CountValuesWhere | _: CountItemsKeyIn => true
    case BinOp(_, l, r) => isAggregate(l) || isAggregate(r)
    case Neg(x)         => isAggregate(x)
    case Cast(_, x)     => isAggregate(x)
    case Round(x, _)    => isAggregate(x)
    case _              => false
  }

  /** Compile a per-index expression: `table.$index` refs become the table's
    * joined value column `__v_<table>`; the lambda variable binds to
    * `xCol`; aggregate leaves resolve through `aggCols` (pre-computed
    * 1-row aggregate columns) in the top-level path. */
  private def compile(e: Expr, xCol: Option[Column],
                      aggCols: Map[Expr, Column] = Map.empty): Column = e match {
    case Num(v)  => lit(v)
    case Str(v)  => lit(v)
    case Var(_)  => xCol.getOrElse(
      throw new DslParseException("x outside transform lambda"))
    case TableRef(t) => col(s"__v_$t")
    case Neg(x)      => -compile(x, xCol, aggCols)
    case BinOp("+", l, r) => compile(l, xCol, aggCols) + compile(r, xCol, aggCols)
    case BinOp("-", l, r) => compile(l, xCol, aggCols) - compile(r, xCol, aggCols)
    case BinOp("*", l, r) => compile(l, xCol, aggCols) * compile(r, xCol, aggCols)
    // ZeroDivisionError skipped the row in the reference → try_divide
    case BinOp("/", l, r) =>
      try_divide(compile(l, xCol, aggCols), compile(r, xCol, aggCols))
    case BinOp(op, _, _)  => throw new DslParseException(s"op $op")
    // reference int('bad') raised and skipped the row; ANSI cast would
    // fail the whole job — try_cast gives null → row filtered
    case Cast("int", x)    => compile(x, xCol, aggCols).try_cast("long")
    case Cast("long", x)   => compile(x, xCol, aggCols).try_cast("long")
    case Cast("float", x)  => compile(x, xCol, aggCols).try_cast("double")
    case Cast("double", x) => compile(x, xCol, aggCols).try_cast("double")
    case Cast("str", x)    => compile(x, xCol, aggCols).try_cast("string")
    case Cast(t, _)        => throw new DslParseException(s"cast $t")
    // Spark round is HALF_UP where Python's is half-to-even — a DELIBERATE
    // deviation (tie inputs only) keeping parity with SQL engines
    case Round(x, d)       => round(compile(x, xCol, aggCols), d)
    case agg @ (_: CountValuesWhere | _: CountItemsKeyIn) =>
      aggCols.getOrElse(agg, throw new DslParseException(
        "aggregate expression in per-index context"))
  }

  /** Distinct aggregate leaves of an expression, in first-appearance order. */
  private def aggLeaves(e: Expr): Seq[Expr] = (e match {
    case agg @ (_: CountValuesWhere | _: CountItemsKeyIn) => Seq(agg)
    case BinOp(_, l, r) => aggLeaves(l) ++ aggLeaves(r)
    case Neg(x)         => aggLeaves(x)
    case Cast(_, x)     => aggLeaves(x)
    case Round(x, _)    => aggLeaves(x)
    case _              => Seq.empty
  }).distinct

  /** One-row frame computing a single aggregate leaf as `alias`. */
  private def aggLeafFrame(leaf: Expr, alias: String,
                           tables: Map[String, DataFrame]): DataFrame =
    leaf match {
      case CountValuesWhere(table, cond) =>
        tables(table).agg(
          count(when(compileCond(cond, Some(col("value"))), 1)).as(alias))
      case CountItemsKeyIn(table, keySet, vals) =>
        tables(table)
          .join(tables(keySet).select(col("index")), Seq("index"), "left_semi")
          .agg(count(when(col("value").isin(vals: _*), 1)).as(alias))
      case other => throw new DslParseException(s"not an aggregate: $other")
    }

  private def compileCond(c: Cond, xCol: Option[Column]): Column = c match {
    case Cmp("==", l, r) => compile(l, xCol) === compile(r, xCol)
    case Cmp("!=", l, r) => compile(l, xCol) =!= compile(r, xCol)
    case Cmp("<", l, r)  => compile(l, xCol) < compile(r, xCol)
    case Cmp("<=", l, r) => compile(l, xCol) <= compile(r, xCol)
    case Cmp(">", l, r)  => compile(l, xCol) > compile(r, xCol)
    case Cmp(">=", l, r) => compile(l, xCol) >= compile(r, xCol)
    case Cmp(op, _, _)   => throw new DslParseException(s"cmp $op")
    case AndOr("and", l, r) => compileCond(l, xCol) && compileCond(r, xCol)
    case AndOr("or", l, r)  => compileCond(l, xCol) || compileCond(r, xCol)
    case AndOr(op, _, _)    => throw new DslParseException(s"bool $op")
  }

  /** Apply the declared value type (the type handed to the transform,
    * reference `_TYPE_MAPPING[type](value)` at `:497,520`). */
  private def applyType(c: Column, valueType: String): Column = valueType match {
    case "int" | "long"      => c.try_cast("long")
    case "float" | "double"  => c.try_cast("double")
    case "string" | "str"    => c.try_cast("string")
    case other => throw new DslParseException(s"unknown type $other")
  }

  private def applyTransform(c: Column, transform: Option[String]): Column =
    transform match {
      case None => c
      case Some(src) =>
        val l = P.parseLambda(src)
        val body = compile(l.body, Some(c))
        (l.cond, l.orElse) match {
          case (Some(cnd), Some(els)) =>
            when(compileCond(cnd, Some(c)), body)
              .otherwise(compile(els, Some(c)))
          case _ => body
        }
    }

  // ------------------------------------------------------------- evaluate
  /** Evaluate all INDEXED targets of a group: returns one row per surviving
    * index with columns (`index`, one column per dimension, one per metric).
    *
    * @param tables oid tables as DataFrames with columns (index: String,
    *               value: String) — `method=static` tables are just
    *               `spark.createDataFrame` literals (S4).
    */
  def evaluateIndexed(config: GroupConfig,
                      tables: Map[String, DataFrame]): Option[DataFrame] = {
    val targets: Seq[(String, TargetSpec, Boolean)] =
      config.dimensions.toSeq.sortBy(_._1).map { case (n, t) => (n, t, true) } ++
        config.metrics.toSeq.sortBy(_._1).map { case (n, t) => (n, t, false) }

    val parsed = targets.map { case (n, t, isDim) =>
      (n, t, isDim, parseTarget(t.value, config.schemaVersion))
    }
    val indexed = parsed.filterNot { case (_, t, _, e) =>
      isAggregate(e) || (referencedTables(e).isEmpty && t.indices.isEmpty &&
        t.indicesFrom.isEmpty)
    }
    // TOP-LEVEL dimensions (literal/constant values, any type, transform
    // applied, rendered via str() — `:516-521`) attach to EVERY emitted
    // group (`top_level_dimensions_map`, `:618-624`) as constant columns.
    val literalDims: Seq[(String, Column)] = parsed.collect {
      case (n, t, true, e)
        if !isAggregate(e) && referencedTables(e).isEmpty &&
          t.indices.isEmpty && t.indicesFrom.isEmpty =>
        (n, applyTransform(applyType(compile(e, None), t.valueType),
          t.transform).cast("string"))
    }
    if (indexed.isEmpty) return None

    // J5/J4/J7: the group's index universe comes from the first target's
    // resolution (all targets of one group share the driving index set in
    // every reference config; we take the union to be permissive).
    def indicesOf(t: TargetSpec, e: Expr): DataFrame = {
      val base = t match {
        case TargetSpec(_, _, _, _, Some(list), _, _) =>
          tables.values.head.sparkSession
            .createDataFrame(list.map(Tuple1(_))).toDF("index")
        case TargetSpec(_, _, _, _, _, Some(from), _) =>
          tables(from).select(col("index"))
        case _ =>
          val first = referencedTables(e).toSeq.sorted.headOption.getOrElse(
            throw new DslParseException(s"no table reference in ${t.value}"))
          tables(first).select(col("index"))
      }
      base.distinct()
    }

    val baseIndices = indexed.map { case (_, t, _, e) => indicesOf(t, e) }
      .reduce(_ union _).distinct()

    // Per-target evaluation over the TARGET's own resolved index set
    // (`indices = self._get_indices(target_map)` is per-target, `:467`):
    // inner-join referenced tables (J3; missing key = KeyError = row
    // skipped), remap index first if configured (J6).
    val evaluated: Seq[(String, DataFrame)] = indexed.map { case (n, t, isDim, e) =>
      val refs = referencedTables(e).toSeq.sorted
      var df = indicesOf(t, e)
      t.indexTransform match {
        case Some(mapping) =>
          val mapDf = df.sparkSession
            .createDataFrame(mapping.toSeq).toDF("index", "__to_idx")
          df = df.join(broadcast(mapDf), Seq("index"))
        case None =>
          df = df.withColumn("__to_idx", col("index"))
      }
      refs.foreach { tbl =>
        df = df.join(
          broadcast(tables(tbl).select(col("index").as("__to_idx"),
            col("value").as(s"__v_$tbl"))),
          Seq("__to_idx"))
      }
      val raw = applyType(compile(e, None), t.valueType)
      val value = applyTransform(raw, t.transform)
      // cast/eval failure (null BEFORE the transform — a conditional
      // transform's else-branch must not resurrect failed rows) =
      // reference eval error = row skipped
      (n, df.select(col("index"), raw.as("__raw"), value.as(n))
        .filter(col("__raw").isNotNull).drop("__raw"))
    }

    // Reference `:494-505`: a failed target (cast error / missing key) is
    // skipped at that index ONLY — the metrics group at the index still
    // emits with the remaining targets. Left-join every target frame onto
    // the resolved index universe; a failed target is a null column.
    // Group assembly iterates the METRICS map (`for index in metrics_map`,
    // `:603-604`), so an index emits iff ≥1 metric survived — a surviving
    // dimension alone keeps nothing alive, and a failed dimension is merely
    // absent from an emitted group.
    // No indexed METRIC targets at all → metrics_map is empty and the
    // reference's assembly takes the top-level-only branch (`:603,660`):
    // nothing indexed is emitted, even if dimensions resolved.
    val metricCols = indexed.filterNot(_._3).map(_._1)
    if (metricCols.isEmpty) return None

    var out = baseIndices
    evaluated.foreach { case (_, df) => out = out.join(df, Seq("index"), "left") }
    out = out.filter(metricCols.map(col(_).isNotNull).reduce(_ || _))

    literalDims.foreach { case (n, c) => out = out.withColumn(n, c) }

    // v0.2 merges TOP-LEVEL metrics into every indexed group
    // (`:626-633`); v0.1 emits them as a separate group instead (use
    // [[evaluateTopLevel]] for that path).
    if (config.schemaVersion != "0.1")
      topLevelMetricsFrame(config, tables).foreach(tl =>
        out = out.crossJoin(broadcast(tl)))

    // P10: empty-dimension gate — a null (failed/skipped) dimension is
    // ABSENT, not empty; only the empty string trips the gate (`:524-541`).
    val dimCols = indexed.filter(_._3).map(_._1) ++ literalDims.map(_._1)
    if (!config.ignoreEmptyDimensions && dimCols.nonEmpty) {
      val anyEmpty = dimCols
        .map(d => coalesce(col(d).cast("string") === "", lit(false)))
        .reduce(_ || _)
      out = out.filter(!anyEmpty)
    }
    Some(out)
  }

  /** Evaluate all TOP-LEVEL (non-indexed / aggregate) metric targets:
    * returns a single-row DataFrame, one column per metric (A3).
    *
    * DELIBERATE DEVIATION: the reference skips falsy top-level values
    * (`if not value: continue`, `plugin_polling_generic_snmp.py:516-521`),
    * silently dropping a legitimate count of 0 or a 0 literal. We always
    * emit the column — a fixed output schema is required for a columnar
    * engine, and emitting true zeros is strictly more informative.
    * Consumers needing bug-compatible behavior can post-filter zeros. */
  /** The metric columns of the top-level group as ONE one-row frame (also
    * merged into every indexed group under v0.2). Aggregate leaves are
    * computed as separate 1-row aggregations (cross-joined — all 1-row),
    * then the surrounding arithmetic/type/transform applies on top, so
    * composite values like `len([...]) * 8` evaluate like the reference's
    * single eval. */
  private def topLevelMetricsFrame(
      config: GroupConfig,
      tables: Map[String, DataFrame]): Option[DataFrame] = {
    val tops = config.metrics.toSeq.sortBy(_._1).flatMap { case (n, t) =>
      val e = parseTarget(t.value, config.schemaVersion)
      if (isAggregate(e)) Some((n, t, e))
      else if (referencedTables(e).isEmpty && t.indices.isEmpty &&
        t.indicesFrom.isEmpty) Some((n, t, e))
      else None
    }
    if (tops.isEmpty) return None

    val spark = tables.values.headOption.map(_.sparkSession)
    val frames = tops.map { case (n, t, e) =>
      val leaves = aggLeaves(e)
      val base: DataFrame =
        if (leaves.isEmpty)
          spark.getOrElse(throw new DslParseException("no tables"))
            .range(1).toDF()
        else leaves.zipWithIndex
          .map { case (leaf, i) => aggLeafFrame(leaf, s"__agg_$i", tables) }
          .reduce(_ crossJoin _)
      val aggCols = leaves.zipWithIndex
        .map { case (leaf, i) => leaf -> col(s"__agg_$i") }.toMap
      val value = applyTransform(
        applyType(compile(e, None, aggCols), t.valueType), t.transform)
      base.select(value.as(n))
    }
    Some(frames.reduce(_ crossJoin _))
  }

  def evaluateTopLevel(config: GroupConfig,
                       tables: Map[String, DataFrame]): Option[DataFrame] = {
    var out = topLevelMetricsFrame(config, tables).getOrElse(return None)

    // top-level dimensions attach to the top-level group too, and the
    // empty-dimension gate applies (`:660-678`, `:556-563`)
    val literalDims = config.dimensions.toSeq.sortBy(_._1).flatMap {
      case (n, t) =>
        val e = parseTarget(t.value, config.schemaVersion)
        if (!isAggregate(e) && referencedTables(e).isEmpty &&
          t.indices.isEmpty && t.indicesFrom.isEmpty)
          Some((n, applyTransform(applyType(compile(e, None), t.valueType),
            t.transform).cast("string")))
        else None
    }
    literalDims.foreach { case (n, c) => out = out.withColumn(n, c) }
    if (!config.ignoreEmptyDimensions && literalDims.nonEmpty) {
      val anyEmpty = literalDims
        .map { case (n, _) => coalesce(col(n) === "", lit(false)) }
        .reduce(_ || _)
      out = out.filter(!anyEmpty)
    }
    Some(out)
  }

  /** Parse helpers exposed for tests. */
  def parseExpression(s: String): Expr = P.parseExpr(s)
  def parseTransform(s: String): Lambda = P.parseLambda(s)
}
