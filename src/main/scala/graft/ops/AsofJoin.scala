package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, attach the LATEST
  * right row whose timestamp is ≤ the left row's timestamp, per key.
  * The classic time-series primitive Spark has no built-in operator for
  * (SURVEY.md §7.6 extension; semantics match DuckDB/pandas `ASOF JOIN`,
  * inclusive on equal timestamps).
  *
  * Implementation is the union+window formulation, NOT a range join:
  * both sides are tagged and unioned, then one window pass per key in
  * (ts, side) order carries the most recent right row forward onto each
  * left row (`last(…, ignoreNulls)` over rows-unbounded-preceding).
  *
  * Scale: exactly ONE shuffle (the window partition on the key), cost
  * O((|L|+|R|) log batch) for the per-key sort — the same work a
  * merge-join based as-of does on a cluster, and it inherits Spark's
  * spill-safe window execution. The naive alternatives either explode
  * (inequality theta-join → BroadcastNestedLoopJoin) or need a per-key
  * collect. No UDFs; everything stays inside whole-stage codegen except
  * the window itself.
  *
  * The matched right row travels as ONE struct column so that a NULL in
  * a right payload field cannot make `last(ignoreNulls)` skip back to an
  * older right row — the struct itself is non-null on every right row.
  *
  * Requirements: right rows should be unique per (key, rightTs); on a
  * duplicate the row sorted last within the tie wins (nondeterministic,
  * as in DuckDB). Right payload column names must not collide with left
  * column names — pre-alias the right frame.
  *
  * @param keyCols   equality keys present on both sides
  * @param leftTs    left timestamp (or any orderable) column
  * @param rightTs   right timestamp column, same type as leftTs
  * @param rightCols right payload columns to attach (may include rightTs)
  * @param tolerance optional predicate (leftTs, matchedRightTs) => keep;
  *                  when it returns false the match is nulled out (e.g.
  *                  a max-lookback window)
  * @return all left columns (left schema order) + rightCols; rightCols
  *         are NULL where no right row precedes the left row
  */
object AsofJoin {
  def asofJoin(left: DataFrame,
               right: DataFrame,
               keyCols: Seq[String],
               leftTs: String,
               rightTs: String,
               rightCols: Seq[String],
               tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one equality key")
    require(rightCols.nonEmpty, "asofJoin needs at least one right payload column")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")} — alias the right frame first")
    val leftOther = left.columns.toSeq.filterNot(keyCols.contains)

    // A NULL right timestamp matches nothing in ASOF semantics (DuckDB's
    // c.ts >= s.ts is never true on NULL) — drop those rows up front;
    // unfiltered they would sort nulls-first and be carried onto every
    // left row that precedes the key's first real right row
    val rValid = right.filter(col(rightTs).isNotNull)

    // __rts rides inside the struct: it is the matched row's timestamp,
    // needed by the tolerance check even when rightTs ∉ rightCols
    val rTagged = rValid.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rightCols.map(col) :+ col(rightTs).as("__rts"): _*).as("__r")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val rType = rTagged.schema("__r").dataType
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rType).as("__r")) ++
        leftOther.map(col): _*)

    // side 0 (right) sorts before side 1 (left) on an equal timestamp →
    // a right row AT the left timestamp is matched (inclusive semantics)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(p) => matched.withColumn("__m",
        when(col("__m").isNotNull && p(col("__ts"), col("__m.__rts")), col("__m")))
      case None => matched
    }
    bounded.select(left.columns.toSeq.map(col) ++
      rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
