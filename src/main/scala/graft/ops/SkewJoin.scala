package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the manual mitigation for the
  * shuffle-join failure mode AQE's skew split can't always fix (a single
  * hot key whose rows exceed one executor's memory, or a skewed key that
  * is hot on BOTH sides so splitting one side still stragglers).
  *
  * The rewrite is the classic salt-and-replicate: the probe side gets a
  * deterministic salt in [0, saltFactor) appended to its join key, the
  * build side is replicated once per salt value, and the join runs on
  * (keys..., salt) — spreading each hot key over `saltFactor` reducers.
  * Output equals the plain equi-join exactly (verified row-for-row by
  * q46's oracle); the cost is `saltFactor`× the build side's shuffle
  * volume, which is why the build side should be the smaller input —
  * too big to broadcast, small enough to replicate a few times.
  *
  * The salt is a hash of the probe row's full content, not `rand()`:
  * the same input always lands on the same reducer, so retried tasks
  * and re-runs are deterministic (a `rand()` salt breaks speculative
  * execution and makes failures non-reproducible). Caveat: byte-identical
  * duplicate rows share a salt — spreading a hot key requires its rows to
  * differ somewhere outside the key, which holds for any fact table with
  * a row-level id or measure.
  */
object SkewJoin {

  /** Inner equi-join of `probe` (large, skewed) with `build` (replicated)
    * on `keys`, spread over `saltFactor` reducers per key.
    *
    * Column layout matches `probe.join(build, keys)`: key columns first,
    * then the remaining probe columns, then the remaining build columns
    * — drop-in for the plain join it replaces. Non-key column names must
    * be disjoint, as in any USING-style join.
    */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                     saltFactor: Int): DataFrame = {
    require(keys.nonEmpty, "saltedEquiJoin needs at least one key column")
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salt = "__graft_salt"
    require(!probe.columns.contains(salt) && !build.columns.contains(salt),
      s"column $salt already exists")
    // deterministic per-row salt: hash of the whole probe row
    val salted = probe.withColumn(
      salt, pmod(xxhash64(probe.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val replicated = build.withColumn(
      salt, explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ salt).drop(salt)
  }
}
