package graft.sources

import graft.tables.VersionedTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` — the interop surface over
  * [[VersionedTable]] for SQL and non-Scala users:
  *
  * {{{
  *   spark.read.format("graft").load(path)                       // current
  *   spark.read.format("graft").option("versionAsOf", 3).load(p) // time travel
  *   CREATE TABLE t USING graft OPTIONS (path '...');            -- SQL
  * }}}
  *
  * Implemented on the stable DSv1 relation API as a thin shell: scans
  * delegate to the table's own parquet read, so column pruning and
  * filter pushdown reach the parquet scan through the inner DataFrame.
  * The one cost of this interop path is the Row conversion at the
  * relation boundary — performance-critical Scala/Java code should use
  * `VersionedTable.read` directly, which stays whole-stage-codegen'd
  * end to end.
  */
class GraftSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a 'path' option"))
    val versionAsOf = parameters.get("versionAsOf").map(_.toLong)
    new GraftRelation(sqlContext, path, versionAsOf)
  }
}

class GraftRelation(val sqlContext: SQLContext,
                    path: String,
                    versionAsOf: Option[Long]) extends BaseRelation
    with PrunedFilteredScan {

  private def table: VersionedTable =
    VersionedTable.forPath(sqlContext.sparkSession, path)
  private def df: DataFrame =
    versionAsOf.fold(table.read)(v => table.readVersion(v))

  override val schema: StructType = df.schema

  /** Filters are pushed into the inner DataFrame (and from there into
    * the parquet scan); anything not translated is left for Spark,
    * which re-applies every filter above this scan (the default
    * `unhandledFilters` contract), so translation is an optimization,
    * never a correctness dependency. */
  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(toColumn).foldLeft(df)(_.filter(_))
    val pruned = filtered.select(requiredColumns.toSeq.map(col): _*)
    pruned.rdd
  }

  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case EqualNullSafe(a, v) => Some(col(a) <=> v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}
