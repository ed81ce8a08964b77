package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The salted rewrite must be invisible in the result (row-for-row equal
  * to the plain equi-join, duplicates included) while actually spreading
  * a hot key across salt partitions (the sf-scale check is q46's
  * plain-join oracle). */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // key 1 is hot (4 rows with distinct payloads), key 2 cold, key 3
  // unmatched on the build side, key 4 build-only
  private lazy val probe = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), (2L, "e"), (3L, "f"))
    .toDF("k", "pv")
  private lazy val build = Seq(
    (1L, 10.0), (1L, 11.0), (2L, 20.0), (4L, 40.0))
    .toDF("k", "bv")

  test("equals the plain join exactly, duplicate matches included") {
    val plain = probe.join(build, Seq("k"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = SkewJoin.saltedEquiJoin(probe, build, Seq("k"), 5)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted === plain) // 1L matches 4×2=8 rows, multiplicity kept
    assert(salted.values.sum === 9)
  }

  test("column layout matches the plain join (drop-in replacement)") {
    assert(SkewJoin.saltedEquiJoin(probe, build, Seq("k"), 3).columns.toSeq
      === probe.join(build, Seq("k")).columns.toSeq)
  }

  test("rows of a hot key with differing payloads spread over salts") {
    val salts = probe
      .withColumn("s", pmod(xxhash64(probe.columns.map(col): _*), lit(5)))
      .filter($"k" === 1L).select("s").distinct().count()
    assert(salts > 1, "4 distinct hot-key rows should land on >1 salt")
  }

  test("saltFactor 1 degenerates to the plain join") {
    val one = SkewJoin.saltedEquiJoin(probe, build, Seq("k"), 1)
    assert(one.count() === 9)
  }

  test("q46's salted join takes the shuffle path, not a broadcast") {
    val plan = graft.SparkEntry.queries("q46_skew_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected the hinted sort-merge join in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"broadcast would bypass the salt entirely:\n$plan")
  }
}
