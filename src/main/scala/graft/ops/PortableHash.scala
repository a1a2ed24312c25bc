package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing — the single source of truth for
  * every hash that must agree bit-for-bit between the Spark queries and
  * the DuckDB oracle (round-1 used `xxhash64`, which DuckDB lacks, so the
  * near-dup family was un-oracle-able).
  *
  * The primitive: the first 15 hex digits of md5 parsed as a BIGINT.
  * Both engines expose md5 as lowercase hex; 15 hex digits < 2^60 always
  * fits a signed 64-bit value, so no overflow semantics come into play.
  *
  * Scale note: at 100 TB you would swap `hashCol` for `xxhash64` (≈4×
  * faster, still deterministic across executors) — only the oracle needs
  * md5. The pipelines below take the hash as a pluggable Column so that
  * swap is one line.
  */
object PortableHash {
  /** 60-bit portable hash of a string column (Spark side): the native
    * [[org.apache.spark.sql.graft.Md5Hash60]] expression — bit-identical
    * to `conv(substring(md5(c),1,15),16,10)` (= [[hashColMd5Text]], which
    * Hash60Spec pins against this) but one digest + shift instead of a
    * hex encode, string slice, and two string parses per value. Works
    * inside Column-API lambdas, so the 8-gram fingerprint pipelines use
    * it per gram position.
    */
  def hashCol(c: Column): Column = graft.functions.GraftFunctions.hash60(c)

  /** The original built-in-composed formula. The contract [[hashCol]]
    * must keep honoring (and the shape the DuckDB oracle mirrors, see
    * [[hashSql]]) — kept as the differential-test reference.
    */
  def hashColMd5Text(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same hash as DuckDB SQL text. */
  def hashSql(s: String): String =
    s"CAST(('0x' || substr(md5($s), 1, 15)) AS BIGINT)"

  /** DuckDB integer dot product of two list expressions — the oracle
    * twin of [[graft.functions.GraftFunctions.dotLong]]. The lambda
    * variable is deliberately obscure to dodge shadowing of outer
    * table aliases.
    */
  def dotSqlDuck(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), zz -> zz[1]*zz[2])) AS BIGINT)"
}

/** Deterministic ±1 random-hyperplane sign matrix for embedding LSH.
  *
  * Generated once from a fixed-seed PRNG and inlined as literal arrays
  * into BOTH the Spark expressions and the DuckDB oracle SQL — single
  * source of truth, no cross-engine drift, and (unlike round-1's
  * `xxhash64(plane, dim)` signs) fully oracle-checkable.
  */
object Hyperplanes {
  val Planes = 16
  val Dim = 64

  val signs: Array[Array[Long]] = {
    val rng = new scala.util.Random(77)
    Array.fill(Planes, Dim)(if (rng.nextBoolean()) 1L else -1L)
  }

  /** Spark SQL-expr literal array for plane `p`, e.g. `array(1,-1,...)`. */
  def sparkArray(p: Int): String = signs(p).mkString("array(", ",", ")")

  /** DuckDB literal list for plane `p`, e.g. `[1,-1,...]`. */
  def duckArray(p: Int): String = signs(p).mkString("[", ",", "]")

  /** Hyperplane-signature bucket over a quantized vector column: bit p
    * set iff dot(q, plane_p) >= 0. Shared by the similarity tiers and
    * the embedding near-dup — ONE formulation, one oracle twin below.
    */
  def bucketCol(q: Column, planes: Int): Column = {
    import graft.functions.GraftFunctions.dotLong
    (0 until planes)
      .map(p => dotLong(q, org.apache.spark.sql.functions.expr(sparkArray(p))))
      .zipWithIndex
      .map { case (d, p) =>
        org.apache.spark.sql.functions.when(d >= 0,
          org.apache.spark.sql.functions.lit(1L << p))
          .otherwise(org.apache.spark.sql.functions.lit(0L)) }
      .reduce(_ + _)
  }

  /** [[bucketCol]] as DuckDB SQL over a list expression `q`. */
  def bucketSqlDuck(q: String, planes: Int): String =
    (0 until planes).map(p =>
      s"(CASE WHEN ${PortableHash.dotSqlDuck(q, duckArray(p))} >= 0 " +
        s"THEN (CAST(1 AS BIGINT) << $p) ELSE 0 END)")
      .mkString(" + ")
}
