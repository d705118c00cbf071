package graft.tools

/** Repo-side leak scanner with VERIFIABLE freshness: scans the source
  * tree for credential material and non-public infrastructure strings
  * and writes `LEAKSCAN.json` carrying the scan timestamp, the scanned
  * git commit AND tree hash, and the file count — so the artifact
  * proves it was produced against exactly this tree, not a stale run
  * (the gap the external LEAKCHECK artifact has: no way to tell when
  * or against what it ran).
  *
  * Exit code 1 on any hit; hits list file:line plus the matched
  * CATEGORY only (never the matched text — an artifact that quotes a
  * leaked secret is itself a leak).
  *
  * Usage: `sbt "runMain graft.tools.LeakScan [repoRoot]"`.
  */
object LeakScan {
  /** Category -> pattern. Generic secret/infra shapes only — all
    * public knowledge (AWS key ids, PEM headers, GitHub/Slack token
    * prefixes, cloud-internal hostname idioms).
    */
  private val patterns: Seq[(String, scala.util.matching.Regex)] = Seq(
    "aws-access-key-id" -> "\\bAKIA[0-9A-Z]{16}\\b".r,
    "private-key-block" ->
      "-----BEGIN (?:RSA|EC|DSA|OPENSSH|PGP) PRIVATE KEY".r,
    "github-token" -> "\\bgh[pousr]_[A-Za-z0-9]{20,}\\b".r,
    "slack-token" -> "\\bxox[baprs]-[A-Za-z0-9-]{10,}\\b".r,
    "bearer-jwt" -> "\\beyJ[A-Za-z0-9_-]{20,}\\.eyJ".r,
    "internal-hostname" ->
      "(?i)\\b[a-z0-9.-]+\\.(?:internal|corp|intranet)\\b".r,
    "artifact-registry" ->
      "(?i)\\b(?:artifactory|jfrog\\.io|pkg\\.dev/[a-z0-9-]+-(?:internal|private))\\b".r,
    "password-literal" ->
      "(?i)(?:password|passwd|secret[_-]?key)\\s*[:=]\\s*\"[^\"${][^\"]{5,}\"".r,
    "basic-auth-url" -> "(?i)\\b[a-z][a-z0-9+.-]*://[^/\\s:@\"]+:[^/\\s:@\"]+@".r
  )

  private val scanExts =
    Set(".scala", ".sbt", ".md", ".py", ".sql", ".json", ".yaml", ".yml")

  private def git(root: java.io.File, args: String*): String =
    try {
      val p = new ProcessBuilder(("git" +: args): _*)
        .directory(root).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (p.waitFor() == 0) out else s"unavailable"
    } catch { case _: Exception => "unavailable" }

  def main(args: Array[String]): Unit = {
    val root = new java.io.File(args.headOption.getOrElse("."))
    val hits = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
    var scanned = 0
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        if (!Set(".git", "target", "project").contains(f.getName))
          Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
            .foreach(walk)
      } else if (scanExts.exists(f.getName.endsWith)) {
        scanned += 1
        val rel = root.toPath.relativize(f.toPath).toString
        // this file declares the patterns; matching it against itself
        // would self-flag every category
        if (rel != "src/main/scala/graft/tools/LeakScan.scala") {
          val lines = try scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq
            catch { case _: Exception => Seq.empty }
          lines.zipWithIndex.foreach { case (l, i) =>
            patterns.foreach { case (cat, re) =>
              if (re.findFirstIn(l).isDefined) hits += ((rel, i + 1, cat))
            }
          }
        }
      }
    walk(new java.io.File(root, "src"))
    Seq("build.sbt", "SURVEY.md", "SCALE.md", "README.md").foreach { n =>
      val f = new java.io.File(root, n)
      if (f.isFile) walk(f)
    }
    val hitsJson = hits.map { case (f, ln, cat) =>
      s"""{"file":"$f","line":$ln,"category":"$cat"}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"timestamp":"${java.time.Instant.now()}",""" +
        s""""git_commit":"${git(root, "rev-parse", "HEAD")}",""" +
        s""""git_tree":"${git(root, "rev-parse", "HEAD^{tree}")}",""" +
        // dirty = SCANNED content diverges from the named commit
        // (LEAKSCAN.json itself regenerating must not self-flag)
        s""""worktree_dirty":${git(root, "status", "--porcelain", "--",
          "src", "build.sbt", "SURVEY.md", "SCALE.md", "README.md").nonEmpty},""" +
        s""""files_scanned":$scanned,"hit_count":${hits.size},""" +
        s""""hits":$hitsJson}"""
    java.nio.file.Files.write(root.toPath.resolve("LEAKSCAN.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    if (hits.nonEmpty) sys.exit(1)
  }
}
