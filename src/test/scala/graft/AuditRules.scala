package graft

/** Shared machinery for the executable source-tree audits
  * ([[GuardAuditSpec]], [[ScaleAuditSpec]]): walk src/main, find
  * hazard sites by regex, and require a justification marker
  * ADJACENT to each site — same line, or reachable upward through a
  * contiguous run of lines that are blank, comments, or other sites
  * of the same hazard (a multi-line .agg of three percentiles shares
  * one marker). Any intervening plain code line BREAKS the chain, so
  * a marker can never bless an unrelated later site (the ADVICE r11
  * window-leak: one marker used to cover everything within 6 lines). */
object AuditRules {

  def scalaSources(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    java.nio.file.Files.walkFileTree(root,
      new java.nio.file.SimpleFileVisitor[java.nio.file.Path] {
        override def visitFile(f: java.nio.file.Path,
            a: java.nio.file.attribute.BasicFileAttributes) = {
          if (f.toString.endsWith(".scala")) out += f
          java.nio.file.FileVisitResult.CONTINUE
        }
      })
    out.toSeq
  }

  private def isComment(t: String): Boolean =
    t.isEmpty || t.startsWith("//") || t.startsWith("*") ||
      t.startsWith("/*") || t.startsWith("*/")

  /** Site at line `i` (0-based) carries `marker` on its own line or
    * above it through only blank/comment/same-hazard lines. The break
    * check runs BEFORE the marker check: a marker riding an unrelated
    * plain-code line (e.g. a trailing `// …-ok:` on some other
    * statement directly above the site) must NOT bless the site —
    * markers only count on comment/blank lines or lines of the same
    * hazard family. */
  def classified(lines: Array[String], i: Int, marker: String,
      siteRe: scala.util.matching.Regex): Boolean = {
    if (lines(i).contains(marker)) return true
    var j = i - 1
    while (j >= 0) {
      val t = lines(j).trim
      if (!isComment(t) && siteRe.findFirstIn(lines(j)).isEmpty)
        return false
      if (lines(j).contains(marker)) return true
      j -= 1
    }
    false
  }

  /** All unclassified sites in the tree as "file:line: text" rows. */
  def unclassifiedSites(root: java.nio.file.Path,
      siteRe: scala.util.matching.Regex, marker: String,
      exempt: java.nio.file.Path => Boolean): Seq[String] =
    scalaSources(root).filterNot(exempt).flatMap { f =>
      val lines = java.nio.file.Files.readAllLines(f)
        .toArray(Array.empty[String])
      lines.zipWithIndex.collect {
        case (line, i)
            if siteRe.findFirstIn(line).isDefined &&
              !line.trim.startsWith("//") &&
              !line.trim.startsWith("*") &&
              !classified(lines, i, marker, siteRe) =>
          s"$f:${i + 1}: ${line.trim}"
      }
    }
}
