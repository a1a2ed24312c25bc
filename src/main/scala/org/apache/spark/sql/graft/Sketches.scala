// Host-package shim (see ArrayMath.scala for why): BloomFilterAggregate /
// BloomFilterMightContain are catalyst-internal expressions (Spark's own
// InjectRuntimeFilter optimizer rule builds them; they are not in the
// public FunctionRegistry), so constructing them requires the
// Column<->Expression bridge that is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Explicit bloom-filter semi-join reduction, the mechanics Spark's
  * `InjectRuntimeFilter` rule applies when its size thresholds allow
  * (`spark.sql.optimizer.runtime.bloomFilter.*` — creation side ≤ 10 MB,
  * application side ≥ 10 GB by default, so it never fires at gate scale;
  * building it explicitly demonstrates the 100 TB mechanism AND keeps it
  * exercised by the correctness gate).
  *
  * Build side: `bloom_filter_agg(xxhash64(key))` — a mergeable
  * TypedImperativeAggregate; each mapper folds its keys into a local
  * sketch, partials OR together, one binary blob results. Probe side:
  * `might_contain(blob, xxhash64(key))` inside a scan filter. Both
  * sides hash with the same XxHash64(seed=42), matching the optimizer
  * rule's own convention (catalyst InjectRuntimeFilter).
  */
object Sketches {

  /** aggregate Column: bloom filter over `key` (hashed to long). */
  def bloomFilterAgg(key: Column, estimatedNumItems: Long, numBits: Long): Column =
    Interop.column(new BloomFilterAggregate(
      new XxHash64(Seq(Interop.expression(key))),
      Literal(estimatedNumItems), Literal(numBits)).toAggregateExpression())

  /** membership probe; `bloom` must be foldable or a scalar subquery
    * (pass `df.agg(bloomFilterAgg(...)).scalar()`).
    */
  def mightContain(bloom: Column, key: Column): Column =
    Interop.column(BloomFilterMightContain(
      Interop.expression(bloom),
      new XxHash64(Seq(Interop.expression(key)))))

  /** Driver-side (coordinator-style) probe of a serialized bloom blob —
    * `BloomFilterMightContain` insists its bloom side be foldable or a
    * scalar subquery, so a PER-FILE bloom manifest (one blob per row)
    * is probed the way a table format's query coordinator probes its
    * manifest metadata: deserialize the KB-scale blob and test the
    * same `xxhash64(seed=42)` key hash [[bloomFilterAgg]] inserted.
    */
  def readBloom(bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  /** the agg's key hash: XxHash64(seed 42) of a LongType value */
  def xxhash64Long(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      v, org.apache.spark.sql.types.LongType, 42L)
}
