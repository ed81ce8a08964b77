package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", cores = 4)
}

class SparkEntrySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("every query runs and yields rows on sf0.001") {
    val s = SharedSpark.spark
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(s, sf).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(SharedSpark.spark).count() > 0)
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries must be justified; keep the set tight.
    assert(missing.forall(SparkEntry.rowsOnlyJustified.contains),
      s"queries without oracle justification: ${missing -- SparkEntry.rowsOnlyJustified}")
  }
}
