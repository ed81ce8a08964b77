package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-evidence tool for the optimization rounds: dump
  * `.explain("formatted")` of declared queries to
  * `<outDir>/<query>_<suffix>.txt` so plan-shape claims (Exchange count,
  * join strategy, PushedFilters/ReadSchema, WholeStageCodegen spans) are
  * checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * (no query list = all declared queries). Queries with side-effecting
  * builds (fixture tables, streaming drains) run those effects as usual;
  * the dumped plan is the returned frame's — for streaming queries that is
  * the sink read, noted as such in the file header.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [names]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(",")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    Files.createDirectories(Paths.get(outDir))

    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val header = s"== $name ($suffix) sf=$sfDir ==\n" +
          "(formatted physical plan of the query's returned frame, pre-execution/AQE-initial)\n\n"
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), header + plan)
        println(s"dumped $name")
      } catch {
        case e: Throwable =>
          println(s"FAILED $name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(200)}")
      } finally {
        graft.ops.Caches.releaseAll()
      }
    }
    spark.stop()
  }
}
