package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable driver-altitude audit (VERDICT r10 item 5): the
  * `.collect()` allowlist that `Guards.scala`'s scaladoc used to
  * promise in prose, enforced by CI. Every `.collect()` in
  * src/main/scala must either live inside [[graft.ext.Guards]]
  * (whose `boundedGrid` is the sanctioned guarded collect) or carry
  * a `collect-ok:` justification marker on the same line or within
  * the six preceding lines — the classification discipline that
  * keeps the q315 failure class (an unguarded vocabulary-assumption
  * collect that OOMs the driver on adversarial data) from silently
  * recurring: a new collect site fails THIS spec until its bound is
  * stated next to the code.
  *
  * Pure-JVM spec — reads the source tree, starts no SparkSession. */
class GuardAuditSpec extends AnyFunSuite {

  private val markerWindow = 6
  // collectAsList / toLocalIterator are the same altitude hazard by
  // other names; audited by the same rule (currently zero sites)
  private val collectRe =
    """\.(collect|collectAsList|toLocalIterator)\(\)""".r.unanchored

  private def scalaSources(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    java.nio.file.Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
      override def visitFile(f: java.nio.file.Path,
          a: java.nio.file.attribute.BasicFileAttributes) = {
        if (f.toString.endsWith(".scala")) out += f
        java.nio.file.FileVisitResult.CONTINUE
      }
    })
    out.toSeq
  }

  test("every driver-side collect in src/main is classified (collect-ok or the boundedGrid guard)") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"audit must run from the repo root; missing $root")
    val files = scalaSources(root)
    assert(files.nonEmpty)
    val unclassified = files.flatMap { f =>
      val lines = java.nio.file.Files.readAllLines(f)
        .toArray(Array.empty[String])
      lines.zipWithIndex.collect {
        case (line, i)
            if collectRe.findFirstIn(line).isDefined &&
              !line.trim.startsWith("//") &&
              !line.trim.startsWith("*") &&
              !(math.max(0, i - markerWindow) to i)
                .exists(j => lines(j).contains("collect-ok:")) =>
          s"$f:${i + 1}: ${line.trim}"
      }
    }
    assert(unclassified.isEmpty,
      "unclassified driver-side collect site(s) — state the bound " +
        "with a `// collect-ok: <why this is bounded>` marker within " +
        s"$markerWindow lines, or route through Guards.boundedGrid:\n" +
        unclassified.mkString("\n"))
  }

  test("the audit itself still sees the known guarded sites (no silent regex rot)") {
    // if the regex or the tree layout drifts, this spec must not
    // degenerate into vacuously-green: the sanctioned guard site and
    // at least one classified production site must be visible to it
    val guards = java.nio.file.Paths.get(
      "src/main/scala/graft/ext/Guards.scala")
    val text = java.nio.file.Files.readString(guards)
    assert(collectRe.findFirstIn(text).isDefined,
      "boundedGrid's collect vanished from Guards.scala — audit blind")
    assert(text.contains("collect-ok:"))
    val all = scalaSources(java.nio.file.Paths.get("src/main/scala"))
      .map(f => java.nio.file.Files.readString(f))
    assert(all.count(collectRe.findFirstIn(_).isDefined) >= 4,
      "audit sees fewer collect-bearing files than the known floor")
  }
}
