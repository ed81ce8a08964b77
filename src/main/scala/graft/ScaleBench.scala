package graft

import java.nio.file.Files

import graft.tools.CorpusDataGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity measurement for the LLM-pipeline flagships: runs each
  * operator on a generated corpus at 1× and `factor`× (default 10×) and
  * reports the time ratio — the empirical check behind every
  * "corpus-linear, would hold at 100 TB" claim that was previously only
  * plan-audited (exchange counts). A corpus-linear op with shuffle
  * constants should land well under ratio ≈ factor × 1.5; an op whose
  * ratio approaches factor² is quadratic and the claim is wrong.
  *
  * Protocol per (op, size): one untimed warmup absorbs the op's codegen
  * (otherwise the SMALL size pays compilation and every ratio flatters),
  * then `reps` timed runs, median. Inputs are written to parquet first
  * and read back, so each measurement includes the scan but not the
  * generator. Planted duplicate/span/near-dup rates in the generator are
  * scale-independent, so per-row work is constant across sizes.
  *
  * Output: one JSON line per op + a `"metric":"scale"` summary line, and
  * the whole record to SPARK_GRAFT_SCALE_FILE (default scale_last.json).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    val baseDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "30000").toLong
    val baseVecs = sys.env.getOrElse("SPARK_GRAFT_SCALE_VECS", "20000").toLong
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    val root = Files.createTempDirectory("graft-scale").toString

    // between reps: release registered caches, then force-drop ANY block
    // still held (iterative ops leave truncated-lineage localCheckpoint
    // RDDs whose async ContextCleaner removal otherwise lands inside the
    // next rep's window and reads as op variance), sync, GC
    def purge(): Unit = {
      graft.ops.Caches.releaseAll()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(r => try r.unpersist(blocking = true)
        catch { case scala.util.control.NonFatal(_) => })
      try Runtime.getRuntime.exec(Array("sync")).waitFor()
      catch { case scala.util.control.NonFatal(_) => }
      System.gc()
      Thread.sleep(200)
    }

    // ---- the five flagship claims-at-scale -----------------------------
    // each op returns its result FRAME; the measurement materializes it
    // with queryExecution.toRdd.count() — executing the op's OWN plan
    // with all output columns live. A plain .count() would let Catalyst
    // prune unused projections (it deletes shuffleShards' whole Window,
    // turning the measurement into a scan count).
    val ops: Seq[(String, (DataFrame, DataFrame, Int) => DataFrame)] = Seq(
      "minhash_lsh_pairs" -> ((docs, _, _) =>
        graft.ops.TextDedup.minHashLshPairs(docs, "doc_id", "text")),
      "span_dedup" -> ((docs, _, _) =>
        graft.ops.TextDedup.repeatedSpanDedup(docs, "doc_id", "text")),
      // LSH sized to the corpus (standard rule: buckets ∝ n, i.e.
      // bits += log2(scale)) so expected bucket occupancy — and with it
      // candidate pairs per row — stays constant; near-identical planted
      // dups agree on the extra hyperplane signs w.h.p., so recall holds
      "semantic_dedup" -> ((_, embs, scale) =>
        graft.ops.SemanticDedup
          .semanticDedup(embs, "vec_id", "embedding", threshold = 0.9,
            bits = 10 + (math.log(scale) / math.log(2)).ceil.toInt)),
      "curation_pipeline" -> ((docs, _, _) =>
        graft.ops.Curation.chain(docs)), // the exact q77 chain, shared
      // shards scale with the corpus (the documented contract: a shard is
      // output-file-sized), so per-shard sort work stays constant
      "shuffle_shards" -> ((docs, _, scale) =>
        graft.ops.Sampling
          .shuffleShards(docs, "doc_id", numShards = 64 * scale))
    )

    val out = scala.collection.mutable.ArrayBuffer[String]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // op -> scale -> median seconds
    val med = scala.collection.mutable.LinkedHashMap[(String, Int), Double]()
    val counts = scala.collection.mutable.LinkedHashMap[(String, Int), Long]()

    Seq(1, factor).foreach { scale =>
      val nd = baseDocs * scale
      val nv = baseVecs * scale
      val dDir = s"$root/docs_$scale"
      val eDir = s"$root/embs_$scale"
      CorpusDataGen.documents(spark, nd, partitions = cpus.toInt)
        .write.parquet(dDir)
      CorpusDataGen.embeddings(spark, nv, partitions = cpus.toInt)
        .write.parquet(eDir)
      val docs = spark.read.parquet(dDir)
      val embs = spark.read.parquet(eDir)
      ops.foreach { case (name, fn) =>
        try {
          def run(): Long = fn(docs, embs, scale).queryExecution.toRdd.count()
          run() // untimed warmup: codegen + page-cache
          purge()
          val runs = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            val rows = run()
            val sec = (System.nanoTime() - t0) / 1e9
            counts((name, scale)) = rows
            purge()
            sec
          }.sorted
          med((name, scale)) = runs(runs.size / 2)
          val line =
            s"""{"section":"scale_op","op":"$name","scale":$scale,"docs":$nd,"vecs":$nv,""" +
              s""""rows_out":${counts((name, scale))},"median_s":${r3(med((name, scale)))},""" +
              s""""runs":${runs.map(r3).mkString("[", ",", "]")}}"""
          out += line
          println(line) // progress is visible live; the summary reprints nothing
        } catch {
          case e: Throwable =>
            errors(s"${name}_$scale") =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
      }
    }

    val ratios = ops.map(_._1).flatMap { name =>
      for (t1 <- med.get((name, 1)); tN <- med.get((name, factor)))
        yield s""""$name":{"t1":${r3(t1)},"t$factor":${r3(tN)},""" +
          s""""ratio":${r3(tN / math.max(t1, 1e-9))},"linear_ok":${tN / math.max(t1, 1e-9) < factor * 1.5}}"""
    }
    val errJson = errors
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    val summary =
      s"""{"metric":"scale","unit":"ratio","base_docs":$baseDocs,"base_vecs":$baseVecs,""" +
        s""""factor":$factor,"cpus":$cpus,"ops":{${ratios.mkString(",")}},"errors":$errJson}"""
    out += summary

    try {
      val dest = sys.env.getOrElse("SPARK_GRAFT_SCALE_FILE", "scale_last.json")
      Files.writeString(java.nio.file.Paths.get(dest), out.mkString("", "\n", "\n"))
    } catch { case scala.util.control.NonFatal(_) => }
    println(summary)
    GraftSession.deleteRec(new java.io.File(root))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }

  private def r3(d: Double): Double = math.rint(d * 1000) / 1000
  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => " "
                case '\r' => ""; case c if c < ' ' => " "; case c => c.toString }
}
