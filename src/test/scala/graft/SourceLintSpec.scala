package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level scale lints: conventions that keep the engine honest at
  * 100 TB but that no runtime assertion can see (a data-sized
  * `.collect()` works fine at sf0.01 and melts a production driver).
  * Complements ShuffleBudgetSpec (runtime shuffle-record budgets): this
  * spec fails the BUILD when a new driver-side materialization lands
  * without a written size argument next to it.
  */
class SourceLintSpec extends AnyFunSuite {

  private val mainRoot = new java.io.File("src/main/scala")

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = dir.listFiles.toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  test("every driver-side .collect() carries a size justification") {
    // convention: within the 8 lines ending at the .collect() call
    // there must be either a bound in the plan itself (.limit() /
    // .head / take) or a comment arguing the result is driver-sized
    // ("driver-sized" / "model-sized" / "metadata-sized"). A collect
    // of a data-sized result can't satisfy the comment honestly in
    // review, and a new one without ANY argument fails here.
    val marker =
      "driver-sized|model-sized|metadata-sized|\\.limit\\(".r
    val offenders = scalaFiles(mainRoot).flatMap { f =>
      val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
      lines.zipWithIndex.collect {
        case (l, i)
            if l.contains(".collect()") &&
              !lines.slice(math.max(0, i - 7), i + 1)
                .exists(w => marker.findFirstIn(w).isDefined) =>
          s"${f.getPath}:${i + 1}"
      }
    }
    assert(offenders.isEmpty,
      s"unjustified .collect() — add a driver-sized argument or bound:\n" +
        offenders.mkString("\n"))
  }

  test("no persist() without an unpersist() in the same file") {
    // a persist whose file never unpersists is a session-lifetime cache
    // leak (the round-3 bench contamination); ownership transfers must
    // be explicit enough to move the unpersist into the same file
    val offenders = scalaFiles(mainRoot).filter { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8").mkString
      src.contains(".persist()") && !src.contains("unpersist()")
    }
    assert(offenders.isEmpty,
      s"persist() without unpersist():\n${offenders.map(_.getPath).mkString("\n")}")
  }
}
