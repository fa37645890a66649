package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Provenance hygiene: every absolute `/root/reference/...` path cited
  * in `src/main` scaladoc must exist on disk. Extension operators with
  * no reference analog must say so instead of citing files that were
  * never there (the round-8 verdict found three such dead paths). */
class CitationsSpec extends AnyFunSuite {

  private val CitePattern = "/root/reference/[A-Za-z0-9_/.-]*[A-Za-z0-9_]".r

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("every /root/reference path cited in src/main exists on disk") {
    val srcMain = Paths.get("src/main/scala")
    assert(Files.isDirectory(srcMain), s"run from repo root; missing $srcMain")
    val dead = for {
      f <- scalaFiles(srcMain)
      text = new String(Files.readAllBytes(f), "UTF-8")
      cite <- CitePattern.findAllIn(text).toSeq.distinct
      if !Files.exists(Paths.get(cite))
    } yield s"$f cites nonexistent $cite"
    assert(dead.isEmpty, dead.mkString("\n"))
  }
}
