// Host-package shim for the same reason as ArrayMath.scala: the
// input-cast trait types are `private[sql]` in Spark 4.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit portable hash: the value of
  * `conv(substring(md5(x), 1, 15), 16, 10)` as a BIGINT, computed
  * directly from the digest bytes.
  *
  * The first 15 hex digits of an md5 are exactly the top 60 bits of the
  * first 8 digest bytes, so `bigEndianLong(digest[0..7]) >>> 4` is
  * bit-identical to the hex-string formula — the DuckDB oracle keeps the
  * md5-text form (PortableHash.hashSql) with zero drift.
  *
  * Why native: the composable chain pays, per value, a 32-char hex
  * encode (md5), a string slice (substring), a base-16 *string* parse
  * to a base-10 *string* (conv), and a decimal parse (cast). On the
  * fingerprint hot paths the hash runs once per 8-gram position — tens
  * of hashes per document row, inside interpreted higher-order lambdas
  * where per-call constants multiply. This expression is one digest +
  * one shift, and codegens to a static call.
  *
  * Null in → null out, matching the md5-chain's propagation. The
  * digest instance is thread-local (task threads reuse it; matches the
  * per-call `DigestUtils` allocation Spark's own Md5 makes, minus the
  * provider lookup).
  */
case class Md5Hash60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.Md5Hash60$$.MODULE$$.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** top 60 bits of md5(utf8 bytes) — always in [0, 2^60). */
  def hash60(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (dig(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
