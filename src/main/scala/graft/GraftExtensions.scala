package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions._

/** SQL surface for the native sketch expressions: registers them as
  * functions so a pure-SQL user gets the same codegen'd hot paths the
  * DataFrame operators use — `SELECT graft_cosine(a.embedding,
  * b.embedding) FROM ...` plans the identical whole-stage-codegen loop
  * as the Scala API.
  *
  * Two installation routes:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard `SparkSessionExtensions` injection point), or
  *  - `GraftExtensions.install(spark)` on a live session (the driver
  *    contract builds its sessions before library code runs).
  *
  * Config arguments (hash counts, seeds, centroids) must be literals —
  * they parameterize codegen, so a non-literal is rejected at analysis
  * with a clear message rather than failing inside codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def arity(es: Seq[Expression], n: Int, fn: String, sig: String): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments — usage: $sig, got ${es.length}")

  // Matching `v: Number` directly (not an erased asInstanceOf) so a
  // string literal like graft_shingles(text, '3') gets the designed
  // analysis error instead of a raw ClassCastException.
  private def numLit(e: Expression, fn: String, what: String): Number = e match {
    case Literal(v: Number, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a non-null numeric literal, got $other")
  }
  private def intLit(e: Expression, fn: String, what: String): Int =
    numLit(e, fn, what).intValue()
  private def longLit(e: Expression, fn: String, what: String): Long =
    numLit(e, fn, what).longValue()

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (identifier, info, builder) triples in `injectFunction` shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (es: Seq[Expression]) => {
        arity(es, 2, "graft_cosine", "graft_cosine(a, b)")
        CosineSim(es(0), es(1))
      }),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles",
        "graft_shingles(text, n) - distinct hashed word n-gram shingles"),
      (es: Seq[Expression]) => {
        arity(es, 2, "graft_shingles", "graft_shingles(text, n)")
        HashedShingles(es(0), intLit(es(1), "graft_shingles", "n"))
      }),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(hashes) - 64-bit SimHash of an array<bigint>"),
      (es: Seq[Expression]) => {
        arity(es, 1, "graft_simhash64", "graft_simhash64(hashes)")
        SimHash64(es(0))
      }),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(hashes, k, seed) - k-hash MinHash signature"),
      (es: Seq[Expression]) => {
        arity(es, 3, "graft_minhash", "graft_minhash(hashes, k, seed)")
        MinHashSig(es(0),
          intLit(es(1), "graft_minhash", "k"),
          longLit(es(2), "graft_minhash", "seed"))
      }),
    (FunctionIdentifier("graft_randproj_sig"),
      info("graft_randproj_sig",
        "graft_randproj_sig(embedding, planes, seed) - hyperplane LSH signature"),
      (es: Seq[Expression]) => {
        arity(es, 3, "graft_randproj_sig", "graft_randproj_sig(embedding, planes, seed)")
        RandProjSig(es(0),
          intLit(es(1), "graft_randproj_sig", "planes"),
          longLit(es(2), "graft_randproj_sig", "seed"))
      }),
    (FunctionIdentifier("graft_randproj_buckets"),
      info("graft_randproj_buckets",
        "graft_randproj_buckets(embedding, tables, bits, seed) - LSH bucket keys"),
      (es: Seq[Expression]) => {
        arity(es, 4, "graft_randproj_buckets",
          "graft_randproj_buckets(embedding, tables, bits, seed)")
        RandProjBuckets(es(0),
          intLit(es(1), "graft_randproj_buckets", "tables"),
          intLit(es(2), "graft_randproj_buckets", "bits"),
          longLit(es(3), "graft_randproj_buckets", "seed"))
      }))

  /** Register on an already-built session (idempotent — re-registering
    * overwrites with the same builder). */
  def install(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, inf, builder) =>
      registry.registerFunction(ident, inf, builder)
    }
  }
}
