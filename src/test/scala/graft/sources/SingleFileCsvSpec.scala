package graft.sources

import java.nio.file.{Files, Paths}

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class SingleFileCsvSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("writes exactly one CSV file at the target path, round-trips") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sfc").toString
    val target = s"$root/reports/metrics.csv"
    val df = Seq(("b1", 10L, 1.5), ("b2", 20L, 2.5)).toDF("batch", "n", "sec")
    val bytes = SingleFileCsv.write(df, target, header = true, sep = "|")
    assert(bytes > 0 && Files.exists(Paths.get(target)))
    assert(new java.io.File(s"$root/reports").listFiles().length == 1)
    val back = spark.read.option("header", "true").option("sep", "|")
      .option("inferSchema", "true").csv(target)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("batch", "n", "sec"))
    // overwrite is idempotent
    SingleFileCsv.write(df.limit(1), target, header = true, sep = "|")
    assert(spark.read.option("header", "true").option("sep", "|").csv(target).count() == 1)
  }
}
