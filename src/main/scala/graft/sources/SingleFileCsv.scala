package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Single-file CSV sink (SURVEY.md §2.1 S11): `coalesce(1)` into a temp
  * dir, then move the lone part file to the exact target path — the
  * reference's write-then-rename pattern (reference:
  * src/utils/write_metrics.py:18-25, schema_evolution_step1.py:43-74).
  *
  * Driver-side single-file collection is for small outputs (metrics,
  * reports) only — never the data path: coalesce(1) funnels the whole
  * dataset through one task. */
object SingleFileCsv {

  /** @return the number of bytes written */
  def write(df: DataFrame, target: String,
            header: Boolean = true, sep: String = ","): Long = {
    val tmpRoot = Files.createTempDirectory("graft-singlecsv")
    val tmp = s"$tmpRoot/out"
    df.coalesce(1).write
      .option("header", header.toString).option("sep", sep).csv(tmp)
    val part = new File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException(s"no part file written under $tmp"))
    val t = Paths.get(target)
    if (t.getParent != null) Files.createDirectories(t.getParent)
    Files.move(part.toPath, t, StandardCopyOption.REPLACE_EXISTING)
    val size = Files.size(t)
    new File(tmp).listFiles().foreach(_.delete())
    Files.deleteIfExists(Paths.get(tmp))
    Files.deleteIfExists(tmpRoot)
    size
  }
}
