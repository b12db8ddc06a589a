package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint for the DECIMAL(38,0) product-overflow class — the one
  * defect family that has recurred three rounds running (r6 hash-FAILs,
  * r7 ADVICE staged-division items, r8 qRollingCorr/assortativity fixes;
  * VERDICT r8 next-round #6 asks for exactly this gate).
  *
  * The failure shape: an `expr` chain that multiplies two or more
  * non-trivial operands under DECIMAL(38,0) staging and feeds a `div`.
  * Spark's non-ANSI decimal arithmetic NULLs on overflow while the
  * DuckDB oracle's HUGEINT keeps going, so the two engines diverge
  * exactly when the data grows past the staging headroom — invisible at
  * the gated SFs, a hash-FAIL at the next scale-up.
  *
  * The rule: every multi-factor DECIMAL(38,0) product that feeds a
  * `div` must carry an explicit `overflow-bound:` comment within the
  * 14 lines above it stating the magnitude ceiling that keeps the
  * product inside 38 digits (and therefore when the expression would
  * need the staged-division rewrite: ⌊A·s/(B·C)⌋ = ⌊⌊A·s/B⌋/C⌋ with
  * the exact two-term expansion of ⌊A·s/B⌋). A site with no provable
  * bound should be restructured, not annotated.
  */
class OverflowLintSpec extends AnyFunSuite {

  /** Main-source files that build SQL expr strings. */
  private val sources: Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    walk(new java.io.File("src/main/scala")).map(_.getPath).sorted
  }

  private def isComment(l: String): Boolean = {
    val t = l.trim
    t.startsWith("*") || t.startsWith("//") || t.startsWith("/*")
  }

  /** Sites: up-to-4-line windows of consecutive non-comment code
    * containing a DECIMAL(38-staged multi-factor product and a `div`,
    * i.e. at least two `*` multiplications in the same window as the
    * staging cast and the division. 4 lines (ADVICE r9: 2 missed a div
    * landing two lines below the multiplication in a wrapped expr
    * string). Returns (lineIdx, window) pairs, 0-based.
    */
  private[graft] def sites(lines: Vector[String]): Seq[(Int, String)] = {
    // the window is the next 4 NON-comment lines, scanning past interior
    // comments (ADVICE r10: takeWhile truncated at the first comment, so
    // a div landing below a mid-expression comment was never flagged)
    def window(i: Int): String =
      lines.iterator.drop(i).filterNot(isComment).take(4).mkString(" ")
    def hitAt(i: Int): Boolean = !isComment(lines(i)) && {
      val w = window(i)
      w.contains("DECIMAL(38") && w.count(_ == '*') >= 2 &&
        "\\bdiv\\b".r.findFirstIn(w).isDefined
    }
    // j's window covers line i iff ≤4 non-comment lines span [j, i]
    def covers(j: Int, i: Int): Boolean =
      !isComment(lines(j)) && (j to i).count(k => !isComment(lines(k))) <= 4
    lines.indices.flatMap { i =>
      // only charge the FIRST line of an overlapping chain so a wrapped
      // expression doesn't report once per line it spans
      val prevHit = (math.max(0, i - 12) until i).exists(j => covers(j, i) && hitAt(j))
      if (hitAt(i) && !prevHit) Some(i -> window(i).trim.take(120)) else None
    }
  }

  /** A site is justified iff `overflow-bound:` appears within the 14
    * lines above it (usually the expression's scaladoc/comment) or the
    * 6 lines below its first line — a wrapped expr chain often carries
    * the bound comment mid-expression, after the first flagged line.
    */
  private[graft] def violations(lines: Vector[String]): Seq[(Int, String)] =
    sites(lines).filterNot { case (i, _) =>
      lines.slice(math.max(0, i - 14), math.min(lines.length, i + 7))
        .exists(_.contains("overflow-bound:"))
    }

  test("every DECIMAL(38,0) product-div site carries an overflow-bound justification") {
    val bad = sources.flatMap { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
      violations(lines).map { case (i, w) => s"$f:${i + 1}  $w" }
    }
    assert(bad.isEmpty,
      "DECIMAL(38,0) multi-factor product feeding a div with no " +
        "overflow-bound: comment (state the magnitude ceiling or use a " +
        s"staged division):\n${bad.mkString("\n")}")
  }

  test("a synthetic violation trips the lint; a justified one does not") {
    val bad = Vector(
      "  .withColumn(\"x\",",
      "    expr(\"CAST(a AS DECIMAL(38,0)) * b * 1000000 div c\"))")
    assert(violations(bad).nonEmpty, "lint must flag an unjustified product-div")
    val ok = Vector(
      "  // overflow-bound: a,b < 1e9 so a*b*1e6 < 1e24 << 1e38",
      "  .withColumn(\"x\",",
      "    expr(\"CAST(a AS DECIMAL(38,0)) * b * 1000000 div c\"))")
    assert(violations(ok).isEmpty, "a justified site must pass")
    // the staged rewrite still star-counts as a site — intended: its
    // bound comment documents why each factor stays small (the r8 fixes
    // all carry one). Direct assertion, not the r9 tautology (ADVICE r9).
    val staged = Vector(
      "    expr(\"(CAST(a AS DECIMAL(38,0)) div b) * 1000000 + ((a % b) * 1000000) div b\")")
    assert(sites(staged).nonEmpty, "the staged form must still be a site")
    // a div landing two lines below the multiplication (wrapped expr
    // string) is now inside the 4-line window — the r9 escape hatch
    val gap = Vector(
      "    expr(\"\"\"CAST(a AS DECIMAL(38,0)) * b * 1000000",
      "      + carry",
      "      div c\"\"\")")
    assert(violations(gap).nonEmpty, "a 3-line-wrapped product-div must be flagged")
    // a div landing BELOW a mid-expression comment line is flagged too —
    // the window scans past interior comments instead of truncating at
    // the first one (ADVICE r10 false negative)
    val interior = Vector(
      "    expr(\"\"\"CAST(a AS DECIMAL(38,0)) * b * 1000000",
      "      // carry the scaled numerator",
      "      div c\"\"\")")
    assert(violations(interior).nonEmpty,
      "a product-div split by an interior comment must be flagged")
  }
}
