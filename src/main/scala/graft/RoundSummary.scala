package graft

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Round-summary generator (the r12 verdict's stretch ask): a round now
  * produces 10+ JSON measurement records (driver bench, idle bench,
  * scale files, 100M ETL, items curve, streaming drains); this main
  * folds the files it is given into ONE machine-written
  * `ROUND_SUMMARY_r<N>.json` — per-section headline numbers and
  * pass/fail against the published bars — so a future round diffs state
  * in a single read instead of re-opening every artifact.
  *
  * Usage: `SPARK_GRAFT_ROUND=13 SPARK_GRAFT_SUMMARY_INPUTS=\
  * bench_r13_idle.json,scale_r13_300x_minhash.json runMain
  * graft.RoundSummary`. Inputs are the line-oriented JSON records the
  * bench mains write; unknown line shapes are skipped, missing files
  * recorded, nothing hand-written.
  *
  * Bars: the header-ETL/partitioning/schema-evolution rows carry the
  * reference's published numbers (BASELINE.md, from the reference's
  * metrics/volume_scaling/volume_scaling_metrics_all.csv) at the 2×
  * grading bar; scale-op rows reuse the `bar`/`linear_ok` fields the
  * artifacts already self-describe.
  */
object RoundSummary {

  /** Reference baseline seconds per header-ETL batch2 size (BASELINE.md
    * rows 1-4) + the service-scenario rows; the pass bar is 2× these. */
  private val HeaderBaselineS = Map(
    100000L -> 43.96, 1000000L -> 54.73, 5000000L -> 122.82, 10000000L -> 226.76)
  private val PartitionedCountBaselineS = 7.07
  private val SchemaEvolutionBaselineS = 7.88

  def main(args: Array[String]): Unit = {
    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", "0")
    val inputs = sys.env.getOrElse("SPARK_GRAFT_SUMMARY_INPUTS", "bench_last.json")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val checks = scala.collection.mutable.ArrayBuffer[JObject]()
    val missing = scala.collection.mutable.ArrayBuffer[String]()

    def num(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
    def check(source: String, name: String, value: Double, bar: Double,
              ok: Boolean, extra: List[JField] = Nil): Unit =
      checks += JObject(List(
        "source" -> JString(source), "check" -> JString(name),
        "value" -> JDouble(math.rint(value * 1000) / 1000),
        "bar" -> JDouble(math.rint(bar * 1000) / 1000),
        "ok" -> JBool(ok)) ++ extra)

    inputs.foreach { path =>
      val p = Paths.get(path)
      if (!Files.exists(p)) missing += path
      else Files.readAllLines(p).forEach { line =>
        val parsed = try Some(JsonMethods.parse(line))
          catch { case scala.util.control.NonFatal(_) => None }
        parsed.foreach {
          case o: JObject =>
            val fields = o.obj.toMap
            (fields.get("section"), fields.get("metric")) match {
              case (Some(JString("header_etl_batch2")), _) =>
                fields.get("detail").collect { case d: JObject =>
                  d.obj.foreach { case (size, v: JObject) =>
                    val m = v.obj.toMap
                    for {
                      bar <- HeaderBaselineS.get(size.toLong)
                      med <- m.get("median_s").flatMap(num)
                    } {
                      val clean = m.get("clean_median_s").flatMap(num)
                      val ext = m.getOrElse("ext_cpu_cores", JNothing)
                      check(path, s"header_etl_$size", med, bar * 2,
                        med >= 0 && med < bar * 2,
                        List("baseline_s" -> JDouble(bar),
                          "ratio" -> JDouble(math.rint(med / bar * 1000) / 1000)) ++
                          clean.map(c => "clean_median_s" -> (JDouble(c): JValue)).toList ++
                          (if (ext == JNothing) Nil
                           else List("ext_cpu_cores" -> ext)))
                    }
                  case _ => ()
                  }
                }
              case (Some(JString("items_etl_batch2")), _) =>
                fields.get("detail").collect { case d: JObject =>
                  d.obj.foreach { case (size, v: JObject) =>
                    val m = v.obj.toMap
                    m.get("median_s").flatMap(num).foreach { med =>
                      // no published reference curve — the check is
                      // presence + a recorded number, bar = self (always
                      // ok when measured)
                      check(path, s"items_etl_$size", med, -1.0, med >= 0)
                    }
                  case _ => ()
                  }
                }
              case (_, Some(JString("total"))) =>
                fields.get("queries_total_s").flatMap(num).foreach { q =>
                  check(path, "queries_total", q, -1.0, q >= 0)
                }
                fields.get("partitioned_count").collect { case pc: JObject =>
                  pc.obj.toMap.get("sec").flatMap(num).foreach { s =>
                    check(path, "partitioned_count", s,
                      PartitionedCountBaselineS * 2,
                      s < PartitionedCountBaselineS * 2,
                      List("baseline_s" -> JDouble(PartitionedCountBaselineS)))
                  }
                }
                fields.get("schema_evolution").collect { case se: JObject =>
                  se.obj.toMap.get("append_sec").flatMap(num).foreach { s =>
                    check(path, "schema_evolution_append", s,
                      SchemaEvolutionBaselineS * 2,
                      s < SchemaEvolutionBaselineS * 2,
                      List("baseline_s" -> JDouble(SchemaEvolutionBaselineS)))
                  }
                }
                fields.get("errors").collect { case e: JObject =>
                  check(path, "bench_errors_empty", e.obj.size.toDouble, 0.0,
                    e.obj.isEmpty)
                }
                fields.get("quiesce_expired").collect { case JArray(a) =>
                  check(path, "quiesce_expired_count", a.size.toDouble, -1.0,
                    ok = true)
                }
              case (_, Some(JString("scale"))) =>
                fields.get("ops").collect { case ops: JObject =>
                  ops.obj.foreach { case (op, v: JObject) =>
                    val m = v.obj.toMap
                    for {
                      ratio <- m.get("ratio").flatMap(num)
                      bar <- m.get("bar").flatMap(num)
                    } check(path, s"scale_$op", ratio, bar,
                      m.get("linear_ok").contains(JBool(true)),
                      m.get("t1").flatMap(num).map(t =>
                        "t1_s" -> (JDouble(t): JValue)).toList)
                  case _ => ()
                  }
                }
                fields.get("baseline_spread_max").flatMap(num).foreach { s =>
                  check(path, "scale_baseline_spread_max", s, -1.0, ok = true)
                }
              case _ => () // scale_op / queries_N detail lines: skipped
            }
          case _ => ()
        }
      }
    }

    val allOk = checks.forall(c => c.obj.toMap.get("ok").contains(JBool(true)))
    val out = JObject(
      "round" -> JString(round),
      "generated_by" -> JString("graft.RoundSummary"),
      "inputs" -> JArray(inputs.map(JString(_)).toList),
      "missing_inputs" -> JArray(missing.map(JString(_)).toList),
      "checks" -> JArray(checks.toList),
      "all_ok" -> JBool(allOk))
    val dest = sys.env.getOrElse("SPARK_GRAFT_SUMMARY_FILE",
      s"ROUND_SUMMARY_r$round.json")
    Files.writeString(Paths.get(dest),
      JsonMethods.pretty(JsonMethods.render(out)) + "\n")
    println(JsonMethods.compact(JsonMethods.render(out)))
  }
}
