package graft.tools

import graft.GraftSession
import graft.jobs.{HeaderEtlJob, ItemsEtlJob}
import graft.sources.SingleFileCsv
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** spark-submit entry points mirroring the reference's four CLI surfaces
  * (SURVEY.md §3): header ETL, items ETL, dataset generation, the
  * schema-evolution step and the partitioning timing probe. Each is a
  * thin arg-parsing shell over the library operators. */

/** `runMain graft.tools.HeaderEtlMain <read_path> <base_write_path>`
  * (reference: src/header_etl.py:343-369 — wires landing/, discarded/,
  * metrics/ under the base path). */
object HeaderEtlMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: HeaderEtlMain <read_path> <base_write_path>")
    val Array(readPath, base) = args.take(2)
    val spark = GraftSession.local("graft-header-etl")
    val m = HeaderEtlJob.run(spark, readPath,
      s"$base/landing/header", s"$base/discarded/header", s"$base/metrics/header")
    println(s"batch=${m.batch_id} staged=${m.staged_count} " +
      s"inserted=${m.inserted_count} closed=${m.closed_count} " +
      s"kept=${m.dq_kept} discarded=${m.dq_discarded} " +
      f"total=${m.duration_s}%.2fs merge=${m.duration_s_merge}%.2fs")
    spark.stop()
  }
}

/** `runMain graft.tools.ItemsEtlMain <read_path> <write_path>`
  * (reference: src/items_etl.py:147-157). */
object ItemsEtlMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ItemsEtlMain <read_path> <write_path>")
    val spark = GraftSession.local("graft-items-etl")
    val dups = ItemsEtlJob.run(spark, args(0), args(1))
    println(s"duplicated_rows_dropped=$dups")
    spark.stop()
  }
}

/** `runMain graft.tools.GenerateHeaderDatasets <size> <outdir> [partitions]
  * [pctNew] [seed] [batch1_date] [batch2_date]`
  * (reference: src/utils/generate_header_datasets.py:221-246). */
object GenerateHeaderDatasets {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenerateHeaderDatasets <size> <outdir> ...")
    val size = args(0).toLong
    val outDir = args(1)
    val partitions = if (args.length > 2) args(2).toInt else 16
    val pctNew = if (args.length > 3) args(3).toDouble else 50.0
    val seed = if (args.length > 4) args(4).toLong else 42L
    val d1 = if (args.length > 5) args(5) else "20230127"
    val d2 = if (args.length > 6) args(6) else "20230228"
    val spark = GraftSession.local("graft-datagen")
    println("written: " +
      HeaderDataGen.writeBatch1(spark, size, d1, outDir, partitions, seed))
    println("written: " +
      HeaderDataGen.writeBatch2(spark, size, d2, outDir, partitions, seed + 1, size, pctNew))
    spark.stop()
  }
}

/** `runMain graft.tools.SchemaEvolutionStep <table_path> <metrics_csv>` —
  * read latest version, append 100 rows with a new nullable column via
  * mergeSchema, re-read previous + current versions, write one metrics
  * row (reference: schema_evolution_step1.py:96-199). */
object SchemaEvolutionStep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SchemaEvolutionStep <table_path> <metrics_csv>")
    val Array(path, metricsCsv) = args.take(2)
    val spark = GraftSession.local("graft-schema-evolution")
    import spark.implicits._
    val t = VersionedTable.forPath(spark, path)
    val prevVersion = t.currentVersion
    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    val sample = t.read.limit(100).withColumn("schema_evo_col", lit("x"))
    val (wSec, _) = timed { t.append(sample, mergeSchema = true) }
    val (pSec, prevRows) = timed { t.readVersion(prevVersion).count() }
    val (cSec, curRows) = timed { t.read.count() }
    val metrics = Seq((prevVersion, prevVersion + 1, wSec, pSec, prevRows, cSec, curRows))
      .toDF("prev_version", "new_version", "append_sec",
        "read_prev_sec", "prev_rows", "read_cur_sec", "cur_rows")
    SingleFileCsv.write(metrics, metricsCsv)
    println(f"append=$wSec%.2fs read_prev=$pSec%.2fs($prevRows) read_cur=$cSec%.2fs($curRows)")
    spark.stop()
  }
}

/** `runMain graft.tools.PartitioningTest <table_path>` — the timed
  * partition-pruned count probe
  * (reference: src/utils/partitioning_test.py:21-34). */
object PartitioningTest {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PartitioningTest <table_path>")
    val spark = GraftSession.local("graft-partitioning-test")
    val t = VersionedTable.forPath(spark, args(0))
    val t0 = System.nanoTime()
    val n = t.read.filter(col("valid_from_year") === 2023 &&
      col("valid_from_month") === 2 && col("valid_from_day") === 28 &&
      col("is_current") === true).count()
    println(f"rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}

/** `runMain graft.tools.TableMaintenanceMain <table_path> [targetMB]
  * [retainVersions] [clusterCol ...]` — OPTIMIZE (small-file
  * bin-packing, optionally clustered) followed by VACUUM. The
  * maintenance pass a daily-merged table needs to stay scan-healthy. */
object TableMaintenanceMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: TableMaintenanceMain <table_path> [targetMB] [retainVersions] [clusterCol ...]")
    val path = args(0)
    val targetMB = if (args.length > 1) args(1).toLong else 128L
    val retain = if (args.length > 2) args(2).toInt else 2
    val clusterBy = args.drop(3).toSeq
    val spark = GraftSession.local("graft-table-maintenance")
    val t = VersionedTable.forPath(spark, path)
    val compacted = t.compact(targetMB * 1024 * 1024, clusterBy)
    val deleted = t.vacuum(retain)
    println(s"compacted_files=$compacted vacuumed_files=$deleted " +
      s"version=${t.currentVersion}")
    spark.stop()
  }
}
