package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-13 optimization plan-evidence generator. The two structural
  * changes of the round live in SIDE EFFECTS (a merge's internal rewrite
  * join; a streaming drain's state partitioning), so a plain
  * `.explain()` of any declared query's returned frame cannot show them.
  * This main produces the checkable artifacts instead:
  *
  *  1. Merge rewrite plans: runs the q25-shaped header SCD2 fixture and
  *     the q24-shaped items fixture with `spark.graft.merge.explainDir`
  *     set, so every merge dumps its rewrite join's formatted plan
  *     (join strategy, source subtree — cached vs replayed).
  *  2. Streaming state partitioning: runs the real q57/q60 queries, then
  *     counts the state-partition dirs their checkpoints created
  *     (`state/0/<partition>/`) BEFORE cache release deletes them —
  *     the direct record of how many state stores each micro-batch pays.
  *
  * Usage: runMain graft.PlanEvidence <sfDir> <outDir> <suffix>
  */
object PlanEvidence {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanEvidence <sfDir> <outDir> <suffix>")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Files.createDirectories(Paths.get(outDir))
    val mergePlansDir = s"$outDir/.merge_plans_$suffix"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.merge.explainDir", mergePlansDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    // ---- 1. merge rewrite plans (header q25 fixture, items q24 fixture).
    // With mode=etl1m the header job also runs at 1M generated rows:
    // fixture-scale plans mask the join-strategy difference (Catalyst's
    // EliminateOuterJoin already narrows a no-insert full-outer whose
    // downstream filter is target-null-rejecting, and a 5-row source
    // broadcasts under any policy) — the source-persist and
    // measured-size-broadcast effects only show at volume.
    if (args.length > 3 && args(3) == "etl1m") {
      val w = Files.createTempDirectory("graft-evidence-etl").toString
      tools.HeaderDataGen.writeBatch1(spark, 1000000, "20230127", s"$w/crm",
        cpus.toInt, seed = 42)
      tools.HeaderDataGen.writeBatch2(spark, 1000000, "20230228", s"$w/crm",
        cpus.toInt, seed = 43, existingCount = 1000000, pctNew = 50.0)
      jobs.HeaderEtlJob.run(spark, s"$w/crm/header_20230127.csv",
        s"$w/table", s"$w/discarded", s"$w/metrics")
      jobs.HeaderEtlJob.run(spark, s"$w/crm/header_20230228.csv",
        s"$w/table", s"$w/discarded", s"$w/metrics")
      GraftSession.deleteRec(new java.io.File(w))
      // rename the 1M dumps so they don't collide with the fixture ones
      Option(new java.io.File(mergePlansDir).listFiles()).getOrElse(Array.empty)
        .foreach { f =>
          Files.move(f.toPath,
            Paths.get(mergePlansDir, "etl1m_" + f.getName),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
    }
    SparkEntry.queries("q25_header_scd2")(spark, sfDir).count()
    SparkEntry.queries("q24_items_scd2")(spark, sfDir).count()
    // copy out each dumped merge plan under a stable name
    val dumped = Option(new java.io.File(mergePlansDir).listFiles()).getOrElse(Array.empty)
    dumped.sortBy(_.getName).foreach { f =>
      Files.copy(f.toPath,
        Paths.get(s"$outDir/merge_${f.getName.stripSuffix(".txt")}_$suffix.txt"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    GraftSession.deleteRec(new java.io.File(mergePlansDir))
    graft.ops.Caches.releaseAll()

    // ---- 2. streaming state partition counts (real q57 + q60 runs) ----
    def statePartitionDirs(tmpPrefix: String): Seq[(String, Int)] = {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith(tmpPrefix))
        .toSeq.flatMap { d =>
          val state0 = new java.io.File(d, "ckpt/state/0")
          if (state0.isDirectory)
            Some(d.getName ->
              Option(state0.listFiles()).map(_.count(_.isDirectory)).getOrElse(0))
          else None
        }
    }
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    Seq("q57_stream_session_window" -> "graft-q57",
        "q60_dedup_watermark" -> "graft-q60").foreach { case (q, prefix) =>
      SparkEntry.queries(q)(spark, sfDir).count()
      statePartitionDirs(prefix).foreach { case (d, n) =>
        lines += s"$q ($d): state/0 has $n partition dirs (= state stores per stateful operator per micro-batch)"
      }
      graft.ops.Caches.releaseAll()
    }
    Files.writeString(Paths.get(s"$outDir/streaming_state_partitions_$suffix.txt"),
      s"== streaming state partition counts ($suffix, sf=$sfDir, session shuffle partitions=$cpus) ==\n" +
        lines.mkString("\n") + "\n")
    lines.foreach(println)
    spark.stop()
  }
}
