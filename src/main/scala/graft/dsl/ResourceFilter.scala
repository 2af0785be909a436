package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.parsing.combinator.RegexParsers

/** Parse error for the resource-filter DSL — mirrors the reference's
  * `pyparsing.ParseException` surface (`tests/test_framework.py:482-483`). */
class DslParseException(msg: String) extends IllegalArgumentException(msg)

/** The resource-filter DSL: a SQL-WHERE-like language over the resource
  * inventory, compiled to a Catalyst `Column` predicate.
  *
  * Grammar (reference `framework/resources.py:660-701`):
  * {{{
  *   expr      := condition ((AND | OR) condition)*
  *   condition := field op value
  *              | field [NOT] LIKE value
  *              | field [NOT] IN '(' value (',' value)* ')'
  *   field     := resource_site | resource_class | resource_subclass
  *              | resource_type | resource_id | resource_endpoint    (caseless)
  *              | resource_metadata '.' [A-Za-z0-9_]+
  *   op        := '=' | '!=' | eq | ne                              (caseless)
  *   value     := '"' chars with backslash escape '"'
  * }}}
  * No parentheses/grouping (`docs/Concepts.md:113-114`). Keywords are
  * case-insensitive. `eq`/`ne` are synonyms of `=`/`!=`.
  *
  * Semantics:
  *  - The reference compiles to a SQL string executed by SQLite
  *    (`resources.py:714-787`), so `AND` binds tighter than `OR`; we
  *    reproduce that precedence.
  *  - Metadata predicates compile to EAV id-set INTERSECT/UNION in the
  *    reference — an artifact of SQLite lacking map types (SURVEY.md §4.1).
  *    With a `MapType` metadata column they are ordinary predicates:
  *    `resource_metadata.k <op> "v"` → `resource_metadata[k] <op> v`
  *    (absent key → NULL → row filtered, matching the EAV inner-join).
  *  - LIKE is case-sensitive (ANSI; SQLite's ASCII case-folding is a
  *    backend quirk we deliberately do not copy).
  *
  * Scale: the output is a plain `Column`, so Catalyst pushes it into the
  * parquet scan (PushedFilters) and prunes partitions — the 100 TB path is
  * the same code as the unit test.
  */
object ResourceFilter extends RegexParsers {
  override def skipWhitespace = true

  private sealed trait Field
  private case class Fixed(name: String) extends Field
  private case class Meta(key: String) extends Field

  private sealed trait Cond
  private case class Cmp(f: Field, neg: Boolean, value: String) extends Cond
  private case class Like(f: Field, neg: Boolean, pattern: String) extends Cond
  private case class In(f: Field, neg: Boolean, values: List[String]) extends Cond

  // --- lexical ---------------------------------------------------------
  private def kw(s: String): Parser[String] =
    ("""(?i)\b""" + s + """\b""").r ^^ (_.toUpperCase)

  private val quoted: Parser[String] =
    """"(\\.|[^"\\])*"""".r ^^ { raw =>
      val body = raw.substring(1, raw.length - 1)
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        val c = body.charAt(i)
        if (c == '\\' && i + 1 < body.length) { sb += body.charAt(i + 1); i += 2 }
        else { sb += c; i += 1 }
      }
      sb.toString
    }

  private val field: Parser[Field] =
    ("""(?i)resource_metadata\.""".r ~> """\w+""".r ^^ (k => Meta(k))) |
    ("""(?i)resource_(site|class|subclass|type|id|endpoint)\b""".r ^^ { f =>
      Fixed(f.toLowerCase)
    })

  private val cmpOp: Parser[Boolean] = // true = negated
    ("!=" ^^^ true) | ("=" ^^^ false) | (kw("eq") ^^^ false) | (kw("ne") ^^^ true)

  private val condition: Parser[Cond] =
    (field ~ opt(kw("not")) ~ kw("like") ~ quoted ^^ {
      case f ~ n ~ _ ~ v => Like(f, n.isDefined, v)
    }) |
    (field ~ opt(kw("not")) ~ kw("in") ~ ("(" ~> rep1sep(quoted, ",") <~ ")") ^^ {
      case f ~ n ~ _ ~ vs => In(f, n.isDefined, vs)
    }) |
    (field ~ cmpOp ~ quoted ^^ { case f ~ neg ~ v => Cmp(f, neg, v) })

  // AND binds tighter than OR (the compiled-SQL precedence of the reference).
  private val andChain: Parser[List[Cond]] = rep1sep(condition, kw("and"))
  private val expr: Parser[List[List[Cond]]] = rep1sep(andChain, kw("or"))

  // --- compile ----------------------------------------------------------
  private def fieldCol(f: Field, metadataCol: String): Column = f match {
    case Fixed(n) => col(n)
    case Meta(k)  => col(metadataCol).getItem(k)
  }

  private def condCol(c: Cond, metadataCol: String): Column = c match {
    case Cmp(f, false, v)  => fieldCol(f, metadataCol) === lit(v)
    case Cmp(f, true, v)   => fieldCol(f, metadataCol) =!= lit(v)
    case Like(f, false, p) => fieldCol(f, metadataCol).like(p)
    case Like(f, true, p)  => !fieldCol(f, metadataCol).like(p)
    case In(f, false, vs)  => fieldCol(f, metadataCol).isin(vs: _*)
    case In(f, true, vs)   => !fieldCol(f, metadataCol).isin(vs: _*)
  }

  /** Parse a DSL query into a `Column` predicate over a resources DataFrame
    * whose metadata lives in map column `metadataCol`. */
  def parse(query: String, metadataCol: String = "resource_metadata"): Column = {
    if (query == null || query.trim.isEmpty)
      throw new DslParseException("query must be a non-empty string")
    parseAll(expr, query) match {
      case Success(orChains, _) =>
        orChains
          .map(_.map(condCol(_, metadataCol)).reduce(_ && _))
          .reduce(_ || _)
      case NoSuccess(msg, next) =>
        throw new DslParseException(
          s"parse error at ${next.pos}: $msg in query: $query")
      case other =>
        throw new DslParseException(s"unexpected parse result: $other")
    }
  }
}
