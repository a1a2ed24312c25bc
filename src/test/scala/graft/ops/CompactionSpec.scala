package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-files compaction — the lake-maintenance job that keeps file
  * counts sane (every file costs a task + a footer read + a catalog
  * entry; at 100 TB a fragmented table can spend longer planning than
  * scanning). The invariant that makes compaction safe to run blindly:
  * the content fingerprint (order-insensitive XOR/sum of row hashes,
  * the ax_table_checksum primitive) must be IDENTICAL before and after
  * — only the file count changes.
  */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(path: String): Int =
    Option(new java.io.File(path).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)

  private def fingerprint(path: String): (Long, Long, Long) = {
    val h = graft.ops.PortableHash.hashCol(
      concat_ws("|", col("event_id"), col("user_id"), col("event_type")))
    val r = spark.read.parquet(path)
      .select(h.as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"),
        sum(pmod(col("h"), lit(1000000007L))))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("compaction shrinks the file count and preserves the fingerprint") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val fragmented = s"$root/fragmented"
    val compacted = s"$root/compacted"

    // fragmented ingest: many tiny files (streaming sinks and
    // per-partition writers do this naturally)
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .repartition(32)
      .write.mode("overwrite").parquet(fragmented)
    val nFrag = parquetFiles(fragmented)
    assert(nFrag >= 16, s"fixture should be fragmented, got $nFrag files")

    // the compaction job: read, coalesce to a target size, rewrite
    spark.read.parquet(fragmented)
      .repartition(2)
      .write.mode("overwrite").parquet(compacted)
    val nComp = parquetFiles(compacted)
    assert(nComp <= 2, s"compaction should yield <= 2 files, got $nComp")

    assert(fingerprint(compacted) === fingerprint(fragmented),
      "compaction must never change content, only layout")
  }
}
