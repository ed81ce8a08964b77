package graft.jobs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Pipe-separated CSV fixture writer — the Scala analogue of the
  * reference's write_csv helper (reference: src/utils/spark_utils.py:25-31). */
object TestCsv {
  def write(path: String, header: Seq[String], rows: Seq[Seq[String]]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    val content = (header +: rows).map(_.mkString("|")).mkString("\n") + "\n"
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
  }
}
