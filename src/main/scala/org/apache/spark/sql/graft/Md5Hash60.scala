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

  /** [[hash60]] of every `win`-codepoint window of `s` (positions
    * 1..numChars-win+1), in ONE pass over the bytes: the value of
    * `transform(sequence(1, greatest(numChars - win + 1, 1)),
    * i -> hash60(substring(s, i, win)))` — including that formula's
    * short-string fallback (numChars < win → ONE window, the whole
    * string, because `substring` truncates past the end). Codepoint
    * offsets are computed once per string; each window digests the
    * byte range in place (MessageDigest.update(bytes, off, len)) — no
    * per-window substring allocation, no interpreted lambda.
    */
  def hash60Windows(s: UTF8String,
      win: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = s.numChars()
    val d = digest.get()
    def hashRange(off: Int, len: Int): Long = {
      d.reset()
      d.update(bytes, off, len)
      val dig = d.digest()
      var acc = 0L
      var i = 0
      while (i < 8) { acc = (acc << 8) | (dig(i) & 0xffL); i += 1 }
      acc >>> 4
    }
    if (n < win)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(hashRange(0, bytes.length)))
    // codepoint start offsets (offs(k) = byte offset of codepoint k)
    val offs = new Array[Int](n + 1)
    var k = 0
    var p = 0
    while (p < bytes.length) {
      offs(k) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      k += 1
    }
    offs(n) = bytes.length
    val out = new Array[Long](n - win + 1)
    var w = 0
    while (w <= n - win) {
      out(w) = hashRange(offs(w), offs(w + win) - offs(w))
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Array form of [[Md5Hash60]]: the 60-bit portable hash of EVERY
  * `win`-codepoint window of the input string, equal element-for-element
  * to `transform(sequence(1, greatest(length(s) - win + 1, 1)),
  * i -> graft_hash60(substring(s, i, win)))` (Hash60Spec pins the
  * equivalence, short-string fallback included).
  *
  * Why native: the rolling-fingerprint pipelines (CDC chunking, span
  * anchors, winnowing, rolling fp) evaluate that formula once per
  * CHARACTER of the corpus, inside an interpreted higher-order lambda
  * that allocates a substring per position. One pass computing the
  * codepoint offsets once and digesting byte ranges in place removes
  * the per-position allocation and the lambda interpreter from the
  * hottest text scan in the engine. The VALUES are unchanged — the
  * DuckDB oracles keep their per-position md5-text formula.
  */
case class Hash60Windows(child: Expression, win: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(win > 0, s"window length must be positive, got $win")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash60_windows"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60Windows(input.asInstanceOf[UTF8String], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.Md5Hash60$$.MODULE$$" +
        s".hash60Windows($c, $win)")

  override protected def withNewChildInternal(
      newChild: Expression): Hash60Windows =
    copy(child = newChild)
}
