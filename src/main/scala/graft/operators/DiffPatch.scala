package graft.operators

/** Reverse-application of unified diffs — the core of the incremental
  * snapshot machinery (SURVEY §2.11 I2): bug history stores each
  * user-story change as a unified diff of the NEW text; reconstructing
  * prior states walks the history backwards, un-applying each diff
  * (reference: /root/reference/jobs/webcompat-kb/webcompat_kb/etl/
  * metric_changes.py:183-225 `reverse_apply_diff`).
  *
  * Semantics mirrored exactly: hunk headers `@@ -a,b +c,d @@` are
  * validated; `+` lines are consumed from the input without being
  * emitted, `-` lines are emitted (restored), context lines must match
  * (whitespace-trimmed comparison) and are emitted. Driver/executor-side
  * pure function — used inside mapGroups over per-bug history, so the
  * work distributes by bug id.
  */
object DiffPatch {

  private val headerPattern = """^@@ -(\d+),?(\d+)? \+(\d+),?(\d+)? @@$""".r

  final case class BadDiff(msg: String) extends RuntimeException(msg)

  /** Split preserving line terminators (Python splitlines(True)). */
  private def splitKeepEnds(s: String): Vector[String] = {
    if (s.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\n') { out += s.substring(start, i + 1); start = i + 1 }
      i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  /** Apply `diff` in reverse to `input` to recover the original text. */
  def reverseApplyDiff(input: String, diff: String): String = {
    val inputLines = splitKeepEnds(input)
    val diffLines = splitKeepEnds(diff)
    val out = new StringBuilder
    var inputIdx = 0
    var diffIdx = 0
    while (diffIdx < diffLines.length) {
      val header = diffLines(diffIdx).stripLineEnd
      val m = headerPattern.findFirstMatchIn(header)
        .getOrElse(throw BadDiff(s"Bad user story diff (missing header line):\n$diff"))
      val startLineNumber = m.group(3).toInt
      val endLineNumber = Option(m.group(4)).map(_.toInt)
      val startIdx = math.max(startLineNumber - 1, 0)
      if (startIdx < inputIdx || endLineNumber.exists(_ > inputLines.length))
        throw BadDiff(s"Bad user story diff (index out of bounds):\n$diff")
      inputLines.slice(inputIdx, startIdx).foreach(out ++= _)
      diffIdx += 1
      inputIdx = startIdx
      while (diffIdx < diffLines.length && !diffLines(diffIdx).startsWith("@")) {
        val line = diffLines(diffIdx)
        val changeChar = line.charAt(0)
        val data = line.substring(1)
        changeChar match {
          case '+' => inputIdx += 1
          case ' ' =>
            if (inputIdx >= inputLines.length ||
                inputLines(inputIdx).trim != data.trim)
              throw BadDiff(s"Bad user story diff (patch doesn't match):\n$diff")
            out ++= data
            inputIdx += 1
          case _ => out ++= data
        }
        diffIdx += 1
      }
    }
    inputLines.drop(inputIdx).foreach(out ++= _)
    out.toString
  }
}
