package graft

/** COVERAGE.md is 500+ lines of prose tables that drift (round 8's
  * line-rule near-miss was exactly this risk class). This spec makes it
  * machine-checked in both directions the r8 verdict asked for:
  *
  *  1. every public method on the [[DocArray]] facade appears somewhere
  *     in COVERAGE.md — an operator added to the surface without a
  *     coverage row fails the suite;
  *  2. every `qNNN` a `+gated` row cites exists in
  *     [[SparkEntry.queries]] — a stale gate citation fails the suite.
  */
class CoverageDocSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val coverage: String = {
    val p = java.nio.file.Paths.get("COVERAGE.md")
    assert(java.nio.file.Files.exists(p),
      s"COVERAGE.md not found at ${p.toAbsolutePath}")
    java.nio.file.Files.readString(p)
  }

  test("every public DocArray facade method is documented in COVERAGE.md") {
    val skip = Set( // case-class / scala machinery, not API surface
      "apply", "unapply", "copy", "toString", "hashCode", "equals",
      "canEqual", "productArity", "productElement", "productIterator",
      "productPrefix", "productElementName", "productElementNames",
      "df", "idCol", "curried", "tupled", "andThen", "compose")
    val methods = (classOf[DocArray].getDeclaredMethods ++
        DocArray.getClass.getDeclaredMethods).toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .map(_.getName)
      .filterNot(n => n.contains("$") || skip.contains(n))
      .distinct.sorted
    assert(methods.size > 100, s"reflection saw only ${methods.size} " +
      "facade methods — the walk itself is broken")
    val missing = methods.filterNot(coverage.contains)
    assert(missing.isEmpty,
      s"facade methods absent from COVERAGE.md (${missing.size}): " +
        missing.mkString(", "))
  }

  test("every qNNN cited on a +gated coverage row exists in SparkEntry.queries") {
    val gatePrefixes = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    val q = raw"q(\d{2,3})".r
    val bad = coverage.linesIterator.zipWithIndex
      .filter(_._1.contains("+gated"))
      .flatMap { case (line, i) =>
        q.findAllMatchIn(line).map(m => (i + 1, m.matched))
      }
      .filterNot { case (_, qn) => gatePrefixes.contains(qn) }
      .toSeq
    assert(bad.isEmpty,
      s"+gated rows cite gates missing from SparkEntry.queries: " +
        bad.map { case (ln, qn) => s"$qn (line $ln)" }.mkString(", "))
  }

  test("every +gated row actually names a gate") {
    val q = raw"q\d{2,3}".r
    val silent = coverage.linesIterator.zipWithIndex
      .filter(_._1.contains("+gated"))
      .filterNot(_._1.startsWith("Status legend")) // the legend defines the tag
      .filter { case (line, _) => q.findFirstIn(line).isEmpty }
      .map(_._2 + 1).toSeq
    assert(silent.isEmpty,
      s"+gated rows citing no qNNN at lines: ${silent.mkString(", ")}")
  }
}
