package graft.ops

import graft.SharedSpark
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the composable ops, each checked against
  * an independent in-memory reference implementation over RANDOM inputs —
  * the distributed window/join plans must agree with a sequential fold on
  * every generated case. */
class OpsPropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def run(prop: Prop, cases: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withInitialSeed(Seed(20260812L)), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- sessionize ------------------------------------------------------

  private case class Row(user: Long, id: Long, tsMicros: Long)

  private val eventsGen: Gen[List[Row]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 100L) // coarse grid → frequent exact-gap ties
    } yield (u, t * 60L * 1000000L))
  } yield rows.zipWithIndex.map { case ((u, t), i) => Row(u, i.toLong, t) }

  /** Sequential reference: per user, sort by (ts, id), open a session on
    * the first row or when the gap strictly exceeds `gapMicros`. */
  private def referenceSessions(rows: List[Row], gapMicros: Long): Map[Long, Long] =
    rows.groupBy(_.user).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.tsMicros, r.id))
      var sid = 0L
      var prev = Long.MinValue
      sorted.map { r =>
        if (prev == Long.MinValue || r.tsMicros - prev > gapMicros) sid += 1
        prev = r.tsMicros
        r.id -> sid
      }
    }

  test("sessionize agrees with the sequential fold on random event sets") {
    import spark.implicits._
    val prop = Prop.forAll(eventsGen, Gen.choose(1L, 10L)) { (rows, gapMin) =>
      val gapMicros = gapMin * 60L * 1000000L
      val df = rows
        .map(r => (r.user, r.id, new java.sql.Timestamp(r.tsMicros / 1000L)))
        .toDF("user_id", "event_id", "ts")
      val got = Sessionize
        .sessionize(df, Seq("user_id"), "ts", gapMicros, Seq("event_id"))
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
      got == referenceSessions(rows, gapMicros)
    }
    run(prop)
  }

  // ---- salted skew join ------------------------------------------------

  private val joinGen: Gen[(List[(Long, Long)], List[(Long, Double)], Int)] = for {
    np <- Gen.choose(0, 30)
    probe <- Gen.listOfN(np, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 1000L)))
    nb <- Gen.choose(0, 15)
    build <- Gen.listOfN(nb, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0.0, 9.0)))
    salt <- Gen.choose(1, 7)
  } yield (probe, build, salt)

  test("salted join equals the plain join on random skewed frames") {
    import spark.implicits._
    val prop = Prop.forAll(joinGen) { case (probe, build, salt) =>
      val p = probe.toDF("k", "pv")
      val b = build.toDF("k", "bv")
      val plain = p.join(b, Seq("k")).collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = SkewJoin.saltedEquiJoin(p, b, Seq("k"), salt).collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      salted == plain
    }
    run(prop)
  }
}
