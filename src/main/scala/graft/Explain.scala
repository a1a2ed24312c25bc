package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: print the formatted executed plan of one or
  * more `SparkEntry.queries` — the feedback loop for shuffle/pushdown/
  * codegen auditing (run after every operator change; see BASELINE.md).
  *
  * Usage: runMain graft.Explain <sfDir> <queryName> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = Sessions.configure(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
