package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal Lucene-style query-string language over the analyzed token
  * stream (ES `query_string` analog — the reference's `q` is a plain
  * `multi_match`, models.py:120-127; this is the boolean upgrade a
  * search user reaches for next): `AND`, `OR`, `NOT`, parentheses,
  * implicit AND between adjacent terms, terms analyzed with the same
  * [[Analyzer]] the index uses. Parsed ONCE driver-side by a
  * recursive-descent parser; the tree compiles to (a) a codegen'd
  * Column predicate over the token array and (b) the equivalent DuckDB
  * list_contains SQL — one tree, two renderings, so the engines cannot
  * drift on semantics (the decayCaseSql single-source discipline).
  *
  * Precedence (Lucene's): NOT > AND (and adjacency) > OR.
  */
object QueryString {

  sealed trait Node
  final case class Term(t: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node

  /** Parse a query string; throws IllegalArgumentException on malformed
    * input (unbalanced parens, dangling operator, empty query).
    */
  def parse(q: String): Node = {
    val toks = lex(q)
    val (node, rest) = parseOr(toks)
    require(rest.isEmpty, s"trailing tokens in query: ${rest.mkString(" ")}")
    node
  }

  private def lex(q: String): List[String] =
    q.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").toList.filter(_.nonEmpty)

  private def parseOr(ts: List[String]): (Node, List[String]) = {
    var (node, rest) = parseAnd(ts)
    while (rest.headOption.contains("OR")) {
      val (r, rr) = parseAnd(rest.tail)
      node = Or(node, r); rest = rr
    }
    (node, rest)
  }

  private def parseAnd(ts: List[String]): (Node, List[String]) = {
    var (node, rest) = parseUnary(ts)
    var done = false
    while (!done) rest.headOption match {
      case Some("AND") =>
        val (r, rr) = parseUnary(rest.tail); node = And(node, r); rest = rr
      case Some(t) if t != "OR" && t != ")" =>
        // implicit AND between adjacent terms / NOT / parens
        val (r, rr) = parseUnary(rest); node = And(node, r); rest = rr
      case _ => done = true
    }
    (node, rest)
  }

  private def parseUnary(ts: List[String]): (Node, List[String]) = ts match {
    case "NOT" :: rest =>
      val (n, rr) = parseUnary(rest); (Not(n), rr)
    case "(" :: rest =>
      val (n, rr) = parseOr(rest)
      require(rr.headOption.contains(")"), "unbalanced parentheses")
      (n, rr.tail)
    case w :: rest if w != ")" && w != "AND" && w != "OR" =>
      val analyzed = Analyzer.analyzeQuery(w)
      require(analyzed.nonEmpty, s"term '$w' analyzes to nothing")
      (analyzed.map(Term).reduceLeft[Node](And), rest)
    case other =>
      throw new IllegalArgumentException(s"dangling operator at: ${other.mkString(" ")}")
  }

  /** Compile to a Column predicate over an analyzed token-array column. */
  def toPredicate(n: Node, toks: Column): Column = n match {
    case Term(t)   => array_contains(toks, t)
    case And(l, r) => toPredicate(l, toks) && toPredicate(r, toks)
    case Or(l, r)  => toPredicate(l, toks) || toPredicate(r, toks)
    case Not(x)    => !toPredicate(x, toks)
  }

  /** Render the same tree as DuckDB SQL over a token-list expression. */
  def toSql(n: Node, toksExpr: String): String = n match {
    case Term(t)   => s"list_contains($toksExpr, '$t')"
    case And(l, r) => s"(${toSql(l, toksExpr)} AND ${toSql(r, toksExpr)})"
    case Or(l, r)  => s"(${toSql(l, toksExpr)} OR ${toSql(r, toksExpr)})"
    case Not(x)    => s"(NOT ${toSql(x, toksExpr)})"
  }

  /** Driver-side evaluator over a token set — the spec's independent
    * replay path (never used in the shipped plans).
    */
  def eval(n: Node, toks: Set[String]): Boolean = n match {
    case Term(t)   => toks(t)
    case And(l, r) => eval(l, toks) && eval(r, toks)
    case Or(l, r)  => eval(l, toks) || eval(r, toks)
    case Not(x)    => !eval(x, toks)
  }
}
