package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Each dump runs under the same per-query wall-clock budget as Bench
  * ([[QueryBudget]]) — one hanging query must cost its own CORRECTNESS
  * entry, never the whole round's gate (the round-1 rc=124 failure
  * mode, on the correctness side).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "300").toLong
    val spark = Sessions.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val budget = new QueryBudget(spark, timeoutSec)
    // Dev loop: SPARK_GRAFT_ONLY=comma,separated,prefixes limits the dump
    // (the driver never sets it, so the gate always runs everything).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    // ADVICE: a filtered dump must leave a loud trace — stderr plus a
    // marker file in outDir — so a dev-loop env leak can never make a
    // partial dump look like the full gate.
    only.foreach { o =>
      System.err.println(s"[verify] WARNING: SPARK_GRAFT_ONLY=${o.mkString(",")}"
        + s" — dumping ${selected.size}/${SparkEntry.queries.size} queries")
      Files.writeString(Paths.get(s"$outDir/FILTERED_BY_SPARK_GRAFT_ONLY"),
        s"${o.mkString(",")}: ${selected.size}/${SparkEntry.queries.size}\n")
    }
    selected.foreach { case (name, fn) =>
      budget.run(name) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }._2.foreach { case (tag, detail) =>
        System.err.println(s"[verify] $name failed: $tag ($detail)")
        // a timed-out/failed write can leave a partial directory the
        // compare would read as a (wrong) result — remove it so the
        // query surfaces as MISSING, not as silently corrupt data.
        // Best effort for "timeout_stuck": the abandoned worker may
        // still be writing and could re-create files after this
        // delete — that residue hash-mismatches rather than passes,
        // and the stderr line above records the query as failed.
        org.apache.hadoop.fs.FileSystem
          .get(spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(s"$outDir/$name"), true)
      }
    }
    budget.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
