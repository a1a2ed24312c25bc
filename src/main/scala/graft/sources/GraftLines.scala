package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, Statistics, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan,
  LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 connector for a tab-separated document-metadata
  * format — the custom-source tier of the engine (SURVEY.md §2b
  * scans/sources/sinks): not another built-in format roundtrip, but
  * the full `TableProvider → Table → ScanBuilder → Batch → reader`
  * stack with REAL column pruning and filter pushdown, the two
  * contracts that decide whether a source is usable at 100 TB.
  *
  * - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *   materializes only the requested fields — `.explain` shows the
  *   pruned ReadSchema, and a projection of two columns never pays for
  *   four.
  * - **Filter pushdown** (`SupportsPushDownFilters`): comparison and
  *   equality predicates on any column are accepted, evaluated inside
  *   the partition reader BEFORE a row is built, and reported back so
  *   Catalyst drops its residual — the scan's description carries the
  *   pushed set for plan pins.
  * - **Parallelism**: one InputPartition per `splitBytes` byte range
  *   under the Hadoop line-split protocol (a range owns every line
  *   that starts in it), so one big file scans as many parallel tasks
  *   exactly like any file source.
  *
  * Rows are `doc_id BIGINT \t lang \t source \t n_chars BIGINT`; the
  * format forbids tabs/newlines in field values by construction (the
  * fixture projects scalar metadata only). Fully handled pushdown is
  * only claimed for predicates this reader evaluates EXACTLY; the
  * fixture carries no nulls and `IsNotNull` is therefore trivially
  * true.
  */
class GraftLines extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLines.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftLinesTable(properties.get("path"),
      Option(properties.get("splitBytes")).map(_.toLong)
        .getOrElse(GraftLines.DefaultSplitBytes))
}

object GraftLines {
  /** target split size — a 10 GB file scans as ~320 parallel ranges */
  val DefaultSplitBytes: Long = 32L * 1024 * 1024

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private[sources] val FieldIndex: Map[String, Int] =
    Schema.fieldNames.zipWithIndex.toMap

  /** name of the per-file doc_id min/max sidecar the sink maintains
    * (the connector's "parquet footer": written at COMMIT time by the
    * 2PC driver, consumed by the scan's runtime filter)
    */
  private[sources] val RangesFile = "_ranges.tsv"

  /** Test/plan instrumentation ONLY: how many data files the last
    * `planInputPartitions` kept, and whether a runtime filter pruned
    * any. Specs read these after an action; no engine behavior depends
    * on them.
    */
  val lastPlannedFiles = new java.util.concurrent.atomic.AtomicInteger(-1)
  val lastRuntimePruned = new java.util.concurrent.atomic.AtomicBoolean(false)
  val lastStaticPruned = new java.util.concurrent.atomic.AtomicBoolean(false)
}

final class GraftLinesTable(path: String, splitBytes: Long) extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graftlines requires option(\"path\", ...)")
  require(splitBytes > 0, "splitBytes must be positive")

  override def name(): String = s"graftlines($path)"
  override def schema(): StructType = GraftLines.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLinesScanBuilder(path, splitBytes,
      Option(options.get("maxBytesPerTrigger")).map(_.toLong)
        .getOrElse(0L))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftLinesWriteBuilder(path, info.schema())
}

final class GraftLinesScanBuilder(path: String, splitBytes: Long,
    maxBytesPerTrigger: Long = 0L)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = GraftLines.Schema
  private var pushed: Array[Filter] = Array.empty
  private var aggKinds: Option[Seq[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** accept exactly the predicates the reader evaluates; everything
    * else stays with Catalyst as a residual
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo(a, _) => GraftLines.FieldIndex.contains(a)
      case GreaterThan(a, _) => GraftLines.FieldIndex.contains(a)
      case GreaterThanOrEqual(a, _) => GraftLines.FieldIndex.contains(a)
      case LessThan(a, _) => GraftLines.FieldIndex.contains(a)
      case LessThanOrEqual(a, _) => GraftLines.FieldIndex.contains(a)
      case IsNotNull(a) => GraftLines.FieldIndex.contains(a)
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  // ----- aggregate pushdown (metadata-only queries) --------------------
  // COUNT(*) / MIN(doc_id) / MAX(doc_id) with no grouping and no
  // pushed predicates are answered from the `_ranges.tsv` sidecar
  // ALONE — zero file opens, the metadata-only-query contract parquet
  // footers give (`SELECT count(*) FROM t` never scans data). Pushdown
  // is accepted only when EVERY data file carries a full sidecar entry
  // (range + row count): a missing or pre-row-count entry refuses the
  // pushdown and the query scans — stats can prune work, never change
  // answers. Partial pushdown (supportCompletePushDown = false): the
  // scan emits one partial row, Spark's final aggregate folds it.

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = false

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{
      CountStar, Max, Min}
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return false
    def isDocId(
        e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case f: org.apache.spark.sql.connector.expressions.NamedReference =>
          f.fieldNames.toSeq == Seq("doc_id")
        case _ => false
      }
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if isDocId(m.column) => Some("min")
      case m: Max if isDocId(m.column) => Some("max")
      case _ => None
    }
    if (kinds.isEmpty || kinds.exists(_.isEmpty)) return false
    // the sidecar must fully cover the current data files
    val conf = org.apache.spark.SparkContext.getOrCreate()
      .hadoopConfiguration
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, conf)
    val stats = GraftLinesRanges.read(fs, root)
    val files = fs.listStatus(root).toSeq.filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_") && s.getLen > 0)
    if (!files.forall(f =>
      stats.get(f.getPath.getName).exists(_.rows >= 0))) return false
    aggKinds = Some(kinds.map(_.get))
    true
  }

  override def build(): Scan =
    new GraftLinesScan(path, splitBytes, required, pushed,
      maxBytesPerTrigger, aggKinds)
}

/** Hadoop `Configuration` is not Java-serializable; this 12-line
  * envelope ships it driver → executor the way every file connector
  * must (readers NEVER touch SparkContext — it does not exist on an
  * executor; the first cut did, which only works in local mode).
  */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends java.io.Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

final class GraftLinesScan(path: String, splitBytes: Long,
    required: StructType, pushed: Array[Filter],
    maxBytesPerTrigger: Long = 0L,
    aggKinds: Option[Seq[String]] = None)
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  /** partial-aggregation output schema when an aggregate was pushed:
    * one column per pushed function, positional (Spark maps by index);
    * count is never null, min/max are null on an empty table
    */
  private def aggSchema(kinds: Seq[String]): StructType =
    StructType(kinds.zipWithIndex.map { case (k, i) =>
      StructField(s"agg_${k}_$i", LongType, nullable = k != "count")
    })

  override def readSchema(): StructType =
    aggKinds.map(aggSchema).getOrElse(required)

  override def description(): String =
    s"GraftLines path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
      aggKinds.map(k =>
        s"PushedAggregation: [${k.mkString(", ")}], ").getOrElse("") +
      s"ReadSchema: ${readSchema().catalogString}"

  override def toBatch: Batch = this

  // driver side: SparkContext is available here, and only here
  private def driverConf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration

  /** the data files under `path` (driver-side metadata listing, shared
    * by partition planning and statistics)
    */
  private lazy val dataFiles: Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, driverConf)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        s.getLen > 0)
      .sortBy(_.getPath.getName)
  }

  /** Honest size reporting (`SupportsReportStatistics`): without it,
    * Catalyst prices a V2 relation at `defaultSizeInBytes` (effectively
    * infinite), so a small side of a join is NEVER elected for
    * broadcast and every join over the connector pays a shuffle. The
    * estimate is the listed byte total, scaled by the fraction of
    * columns the (already-pruned) read schema keeps — the same
    * column-ratio heuristic Spark's own file sources apply. Row count
    * is left empty: the format has no row-count metadata, and a made-up
    * number would poison cardinality estimates downstream.
    */
  override def estimateStatistics(): Statistics = {
    val total = dataFiles.map(_.getLen).sum
    val scaled = math.max(1L,
      total * math.max(1, required.size) / GraftLines.Schema.size)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(scaled)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  // ----- runtime filtering (DPP for the connector) ---------------------
  // `SupportsRuntimeFiltering` (which IS a `SupportsRuntimeV2Filtering`)
  // lets a broadcast dim side prune this scan's input at RUNTIME: the
  // optimizer's PartitionPruning rule plants a DynamicPruning subquery
  // on doc_id, the engine evaluates it off the reused broadcast, and
  // `filter` receives the surviving keys before `planInputPartitions`
  // re-plans. Pruning is file-granular against the `_ranges.tsv`
  // sidecar the SINK wrote at commit time (per-file doc_id min/max —
  // the connector's parquet-footer analogue): a file whose range holds
  // none of the keys is never opened. At 100 TB this is the difference
  // between scanning the whole fact and scanning the slice a selective
  // dim actually joins — the same contract parquet partition pruning
  // gives, carried by a custom source. Files without sidecar entries
  // are kept (no stats never means wrong answers).

  @volatile private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (aggKinds.isDefined)
      Array.empty // a metadata-answered aggregate has no scan to prune
    else Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("doc_id"))

  override def filter(filters: Array[Filter]): Unit = {
    val ids = filters.flatMap {
      case org.apache.spark.sql.sources.In("doc_id", vs) =>
        vs.collect { case n: Number => n.longValue() }
      case EqualTo("doc_id", v: Number) => Array(v.longValue())
      case _ => Array.empty[Long]
    }
    if (ids.nonEmpty) runtimeIds = Some(ids.sorted)
  }

  /** sidecar: published file name → doc_id min/max + row count */
  private lazy val fileRanges: Map[String, GraftFileStat] = {
    val root = new Path(path)
    GraftLinesRanges.read(FileSystem.get(root.toUri, driverConf), root)
  }

  // ----- static zone-map pruning off the same sidecar -----------------
  // The runtime leg above prunes against join-produced keys; STATIC
  // pushed doc_id comparisons (EqualTo/GreaterThan/...) are evaluated
  // inside the readers, but without this leg every file is still
  // OPENED. Folding the pushed comparisons into one inclusive interval
  // and intersecting it with each file's sidecar range completes the
  // parquet min/max footer contract: a file whose range misses the
  // interval is never opened. Saturating arithmetic over-keeps at the
  // Long extremes, and a file without a sidecar entry is always kept —
  // pruning can only ever skip files proven empty of matches.

  /** static doc_id interval [lo, hi] implied by the pushed filters */
  private lazy val staticIdBounds: Option[(Long, Long)] = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var any = false
    pushed.foreach {
      case EqualTo("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue()); hi = math.min(hi, v.longValue())
        any = true
      case GreaterThan("doc_id", v: Number) =>
        if (v.longValue() < Long.MaxValue) lo = math.max(lo, v.longValue() + 1)
        else lo = Long.MaxValue // x > MaxValue is empty; over-keep is safe
        any = true
      case GreaterThanOrEqual("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue()); any = true
      case LessThan("doc_id", v: Number) =>
        if (v.longValue() > Long.MinValue) hi = math.min(hi, v.longValue() - 1)
        else hi = Long.MinValue
        any = true
      case LessThanOrEqual("doc_id", v: Number) =>
        hi = math.min(hi, v.longValue()); any = true
      case _ =>
    }
    if (any) Some((lo, hi)) else None
  }

  /** any of the (sorted) ids inside [lo, hi]? */
  private def anyIdIn(ids: Array[Long], lo: Long, hi: Long): Boolean = {
    var l = 0
    var r = ids.length // first index with ids(i) >= lo
    while (l < r) {
      val m = (l + r) >>> 1
      if (ids(m) < lo) l = m + 1 else r = m
    }
    l < ids.length && ids(l) <= hi
  }

  /** one partition per byte range (Hadoop line-split semantics: a
    * range owns every line that STARTS inside it, so ranges need no
    * line alignment and a 10 GB file scans as ~len/splitBytes parallel
    * tasks — whole-file partitions would serialize exactly the big
    * files that matter)
    */
  override def planInputPartitions(): Array[InputPartition] = {
    aggKinds.foreach { kinds =>
      // metadata-only answer: the sidecar covered every data file when
      // the pushdown was ACCEPTED; a file added since would make the
      // stats answer wrong, so that race fails loudly instead
      val stats = fileRanges
      val files = dataFiles.map(_.getPath.getName)
      val missing = files.filterNot(f => stats.get(f).exists(_.rows >= 0))
      if (missing.nonEmpty) sys.error(
        s"graftlines aggregate pushdown planned against a sidecar that " +
          s"no longer covers: ${missing.mkString(", ")}")
      val sts = files.map(stats)
      val n = sts.map(_.rows).sum
      val values: Array[Long] = kinds.map {
        case "count" => n
        case "min" => if (sts.isEmpty) 0L else sts.map(_.lo).min
        case "max" => if (sts.isEmpty) 0L else sts.map(_.hi).max
      }.toArray
      val nulls: Array[Boolean] =
        kinds.map(k => k != "count" && sts.isEmpty).toArray
      GraftLines.lastPlannedFiles.set(0)
      GraftLines.lastStaticPruned.set(false)
      GraftLines.lastRuntimePruned.set(false)
      return Array(GraftLinesAggPartition(values, nulls))
    }
    val afterRuntime = runtimeIds match {
      case Some(ids) if fileRanges.nonEmpty =>
        dataFiles.filter { s =>
          fileRanges.get(s.getPath.getName) match {
            case Some(st) => anyIdIn(ids, st.lo, st.hi)
            case None => true // no stats for this file: never prune it
          }
        }
      case _ => dataFiles
    }
    GraftLines.lastRuntimePruned.set(afterRuntime.size < dataFiles.size)
    val kept = staticIdBounds match {
      case Some((lo, hi)) if fileRanges.nonEmpty =>
        afterRuntime.filter { s =>
          fileRanges.get(s.getPath.getName) match {
            case Some(st) => st.lo <= hi && st.hi >= lo
            case None => true // no stats for this file: never prune it
          }
        }
      case _ => afterRuntime
    }
    GraftLines.lastStaticPruned.set(kept.size < afterRuntime.size)
    GraftLines.lastPlannedFiles.set(kept.size)
    kept
      .flatMap { s =>
        (0L until s.getLen by splitBytes).map { start =>
          GraftLinesPartition(s.getPath.toString, start,
            math.min(start + splitBytes, s.getLen)): InputPartition
        }
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLinesReaderFactory(required, pushed,
      new SerializableHadoopConf(driverConf))

  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftLinesMicroBatchStream(path, splitBytes, required, pushed,
      maxBytesPerTrigger, new SerializableHadoopConf(driverConf))
}

/** Streaming offset: how many bytes of each file have been consumed
  * (file name → byte position). JSON is a sorted-key object so equal
  * offsets serialize identically.
  */
final case class GraftLinesOffset(files: Map[String, Long])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + v
      }
      .mkString("{", ",", "}")
}

object GraftLinesOffset {
  /** parse the json() form above (keys are part-file names — no
    * unescaped quotes/braces by construction, but the parser honors
    * the two escapes json() emits)
    */
  def fromJson(s: String): GraftLinesOffset = {
    // a real character-level parse of the json() emission above — NOT
    // a split-on-comma heuristic: offsets come from checkpoints, so a
    // mis-parse (e.g. a file name containing a comma or colon) would
    // silently corrupt stream progress. Anything that isn't exactly
    // the emitted shape fails the restart loudly instead.
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"malformed graftlines offset ($why): $s")
    val t = s.trim
    if (!(t.startsWith("{") && t.endsWith("}"))) fail("no object braces")
    val body = t.substring(1, t.length - 1)
    if (body.trim.isEmpty) return GraftLinesOffset(Map.empty)
    val out = Map.newBuilder[String, Long]
    var i = 0
    val n = body.length
    while (i < n) {
      if (body.charAt(i) != '"') fail(s"expected key quote at $i")
      i += 1
      val key = new StringBuilder
      var closed = false
      while (i < n && !closed) body.charAt(i) match {
        case '\\' =>
          if (i + 1 >= n) fail("dangling escape")
          key.append(body.charAt(i + 1)); i += 2
        case '"' => closed = true; i += 1
        case c => key.append(c); i += 1
      }
      if (!closed) fail("unterminated key")
      if (i >= n || body.charAt(i) != ':') fail(s"expected ':' at $i")
      i += 1
      val numStart = i
      while (i < n && body.charAt(i) != ',') i += 1
      val num = body.substring(numStart, i)
      val value =
        try num.toLong
        catch { case _: NumberFormatException => fail(s"bad value '$num'") }
      out += key.result() -> value
      if (i < n) { // consume the pair separator; trailing comma is malformed
        i += 1
        if (i >= n) fail("trailing comma")
      }
    }
    GraftLinesOffset(out.result())
  }
}

/** The streaming leg of the connector — byte-offset micro-batching
  * under the SAME line-split protocol as the batch scan: an offset is
  * the per-file consumed-byte position, a micro-batch is the byte
  * window (start, end] per file, and each window's reader discards the
  * partial line straddling its start (unless 0) while owning the line
  * straddling its end — so ANY byte cut (including an admission-cap
  * cut mid-line) reads every line exactly once across batches, which
  * Dsv2SourceSpec pins across checkpointed restarts. Admission control
  * (`maxBytesPerTrigger`) bounds a trigger's window; files are
  * processed in name order and growth (appended bytes, new files) is
  * picked up on the next trigger.
  */
final class GraftLinesMicroBatchStream(path: String, splitBytes: Long,
    required: StructType, pushed: Array[Filter],
    maxBytesPerTrigger: Long, conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => StreamOffset, ReadLimit}

  private def listNow(): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf.value)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        s.getLen > 0)
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1)
  }

  /** Trigger.AvailableNow contract: the target is SNAPSHOTTED here, so
    * the drain terminates even if the directory keeps growing — each
    * trigger still advances by at most the admission cap, and the
    * stream stops once the snapshot is consumed.
    */
  @volatile private var availableNowTarget: Option[Map[String, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(listNow().toMap)

  override def initialOffset(): StreamOffset = GraftLinesOffset(Map.empty)

  override def deserializeOffset(json: String): StreamOffset =
    GraftLinesOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** admission-controlled advance: consume up to maxBytesPerTrigger
    * new bytes (0 = unbounded) from the current listing (or the
    * AvailableNow snapshot), files in name order — the rate-limit
    * contract that keeps a backlogged start from becoming one giant
    * first batch
    */
  override def latestOffset(
      start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val from = start.asInstanceOf[GraftLinesOffset].files
    var budget =
      if (maxBytesPerTrigger > 0) maxBytesPerTrigger else Long.MaxValue
    val target = availableNowTarget match {
      case Some(snap) => snap.toSeq.sortBy(_._1)
      case None => listNow()
    }
    val out = Map.newBuilder[String, Long]
    // carry forward every consumed position from the start offset,
    // including files absent from the current listing — a file that
    // disappears and later REAPPEARS must resume from its consumed
    // position, not re-read from byte 0 (exactly-once would otherwise
    // hold only while files are never removed and re-added)
    out ++= from
    target.foreach { case (name, len) =>
      val already = from.getOrElse(name, 0L)
      val take = math.min(math.max(0L, len - already), budget)
      budget -= take
      out += name -> (already + take)
    }
    GraftLinesOffset(out.result())
  }

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry")

  override def planInputPartitions(
      start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftLinesOffset].files
    val to = end.asInstanceOf[GraftLinesOffset].files
    to.toSeq.sortBy(_._1).flatMap { case (name, endPos) =>
      val startPos = from.getOrElse(name, 0L)
      (startPos until endPos by splitBytes).map { s =>
        GraftLinesPartition(s"$path/$name", s,
          math.min(s + splitBytes, endPos)): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLinesReaderFactory(required, pushed, conf)

  override def commit(end: StreamOffset): Unit = () // files are durable
  override def stop(): Unit = ()
}

final case class GraftLinesPartition(file: String, start: Long, end: Long)
    extends InputPartition

/** the single metadata-answer partition of a pushed aggregation: the
  * driver already computed the partial values off the sidecar; the
  * reader just emits one row (positional, nulls for min/max of an
  * empty table)
  */
final case class GraftLinesAggPartition(
    values: Array[Long], nulls: Array[Boolean]) extends InputPartition

final class GraftLinesReaderFactory(required: StructType,
    pushed: Array[Filter], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case agg: GraftLinesAggPartition =>
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean =
            if (emitted) false else { emitted = true; true }
          override def get(): InternalRow =
            InternalRow.fromSeq(agg.values.toIndexedSeq
              .zip(agg.nulls.toIndexedSeq)
              .map { case (v, isNull) => if (isNull) null else (v: Any) })
          override def close(): Unit = ()
        }
      case p: GraftLinesPartition =>
        new GraftLinesReader(p, required, pushed, conf)
    }
}

final class GraftLinesReader(part: GraftLinesPartition,
    required: StructType, pushed: Array[Filter],
    conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  // Hadoop line-split protocol: seek to the range start, discard the
  // (possibly partial) line straddling it UNLESS this is offset 0, then
  // own every line that STARTS at byte position <= end — the line
  // straddling `end` belongs to THIS range, the next range discards it
  // as its partial head. Byte positions are tracked by LineReader's
  // consumed-byte counts (a char-level BufferedReader can't do this).
  private val p = new Path(part.file)
  private val stream = FileSystem.get(p.toUri, conf.value).open(p)
  private var pos: Long = part.start
  private val lines = {
    stream.seek(part.start)
    val lr = new org.apache.hadoop.util.LineReader(stream)
    if (part.start > 0) {
      pos += lr.readLine(new org.apache.hadoop.io.Text())
    }
    lr
  }
  private val text = new org.apache.hadoop.io.Text()

  /** the next owned raw line, or null when the range is exhausted */
  private def readOwnedLine(): String = {
    if (pos > part.end) return null
    val n = lines.readLine(text)
    if (n == 0) null
    else {
      pos += n
      text.toString
    }
  }

  private val outIdx: Array[Int] =
    required.fieldNames.map(GraftLines.FieldIndex)
  private var row: InternalRow = _

  /** evaluate one pushed predicate against the parsed full-width line */
  private def keep(f: Array[String]): Boolean = pushed.forall {
    case EqualTo(a, v) => cmp(f, a, v) == 0
    case GreaterThan(a, v) => cmp(f, a, v) > 0
    case GreaterThanOrEqual(a, v) => cmp(f, a, v) >= 0
    case LessThan(a, v) => cmp(f, a, v) < 0
    case LessThanOrEqual(a, v) => cmp(f, a, v) <= 0
    case IsNotNull(_) => true
    case other => sys.error(s"unpushable filter leaked in: $other")
  }

  private def cmp(f: Array[String], attr: String, v: Any): Int =
    GraftLines.Schema(attr).dataType match {
      case LongType =>
        java.lang.Long.compare(f(GraftLines.FieldIndex(attr)).toLong,
          v.asInstanceOf[Number].longValue())
      case _ =>
        // Spark orders strings by UTF-8 BYTE order (UTF8String), while
        // java.lang.String.compareTo is UTF-16 code-unit order — the two
        // disagree on supplementary code points (a 4-byte UTF-8 emoji
        // sorts ABOVE U+FFFF in byte order but BELOW it in UTF-16). A
        // fully-pushed filter gets no Catalyst residual, so the reader
        // must reproduce Spark's order exactly.
        UTF8String.fromString(f(GraftLines.FieldIndex(attr)))
          .compareTo(UTF8String.fromString(v.toString))
    }

  override def next(): Boolean = {
    var line = readOwnedLine()
    while (line != null) {
      val f = line.split("\t", -1)
      if (f.length == GraftLines.Schema.size && keep(f)) {
        val values: Array[Any] = outIdx.map { i =>
          GraftLines.Schema(i).dataType match {
            case LongType => f(i).toLong
            case _ => UTF8String.fromString(f(i)): Any
          }
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        return true
      }
      line = readOwnedLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = {
    lines.close()
    stream.close()
  }
}

// ---------------------------------------------------------------------
// Write side — the sink contract with a real TWO-PHASE COMMIT: each
// task writes its rows to a hidden staging file and reports the path in
// its commit message; only the DRIVER's commit() renames staged files
// into place (and, for truncate mode, clears previous data first), so a
// failed or speculative task can never leave a visible partial file —
// abort() deletes the stage. This is the same protocol every production
// file sink implements, demonstrated end to end on the TSV format.
// ---------------------------------------------------------------------

final class GraftLinesWriteBuilder(path: String,
    schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {

  private var truncateMode = false

  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    truncateMode = true
    this
  }

  private def checkSchema(): Unit =
    require(schema.fieldNames.sameElements(
      GraftLines.Schema.fieldNames),
      s"graftlines writes exactly ${GraftLines.Schema.fieldNames
        .mkString("(", ", ", ")")}; got ${schema.fieldNames
        .mkString("(", ", ", ")")}")

  private def hadoopConf(): SerializableHadoopConf =
    new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch
          : org.apache.spark.sql.connector.write.BatchWrite = {
        checkSchema()
        new GraftLinesBatchWrite(path, truncateMode, hadoopConf())
      }
      override def toStreaming: org.apache.spark.sql.connector.write
          .streaming.StreamingWrite = {
        checkSchema()
        new GraftLinesStreamingWrite(path, hadoopConf())
      }
    }
}

/** Task commit message: the hidden staged path, plus (streaming only)
  * the deterministic published name. Batch leaves `dstName` empty and
  * publishes under the staged name minus `.tmp`; streaming publishes
  * under `part-e<epoch>-p<partition>.tsv` — a name REPLAY-STABLE across
  * restarts (task ids are not), which is what makes a re-published
  * epoch overwrite its own files instead of duplicating rows.
  */
final case class GraftLinesCommit(staged: String, dstName: String = "",
    minId: Long = Long.MaxValue, maxId: Long = Long.MinValue,
    rowCount: Long = 0L)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage {
  def publishedName: String =
    if (dstName.nonEmpty) dstName
    else new Path(staged).getName.stripSuffix(".tmp")
  /** the task observed at least one row (min/max are real) */
  def hasRange: Boolean = minId <= maxId
}

/** Per-file sidecar statistics: doc_id min/max plus the exact row
  * count (`rows` = -1 when the entry predates row counting — range
  * pruning still works, aggregate pushdown refuses).
  */
final case class GraftFileStat(lo: Long, hi: Long, rows: Long)

/** The `_ranges.tsv` sidecar: published file name → doc_id min/max,
  * maintained by the DRIVER at commit time (never by tasks — a task
  * can't know whether it will commit). Merge is idempotent by file
  * name, so a re-published streaming epoch converges here too.
  */
private[sources] object GraftLinesRanges {

  def read(fs: FileSystem, root: Path): Map[String, GraftFileStat] = {
    val p = new Path(root, GraftLines.RangesFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      try Iterator.continually(in.readLine()).takeWhile(_ != null)
        .flatMap { line =>
          line.split("\t", -1) match {
            case Array(name, lo, hi) => // v1 entry: no row count
              try Some(name -> GraftFileStat(lo.toLong, hi.toLong, -1L))
              catch { case _: NumberFormatException => None }
            case Array(name, lo, hi, n) =>
              try Some(name -> GraftFileStat(lo.toLong, hi.toLong, n.toLong))
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        }.toMap
      finally in.close()
    }
  }

  def update(fs: FileSystem, root: Path,
      messages: Seq[GraftLinesCommit], truncate: Boolean): Unit = {
    val entries = messages.collect {
      case m if m.hasRange =>
        m.publishedName -> GraftFileStat(m.minId, m.maxId, m.rowCount)
    }
    val merged =
      (if (truncate) Map.empty[String, GraftFileStat] else read(fs, root)) ++
        entries
    val p = new Path(root, GraftLines.RangesFile)
    if (merged.isEmpty) { fs.delete(p, false); return }
    // publish atomically (stage + rename), never rewrite in place: a
    // concurrent scan reads the sidecar lazily at plan time, and a torn
    // read whose truncated line still parses as three longs would yield
    // a wrong range and OVER-prune — silently missing rows. The rename
    // window (old deleted, new not yet renamed) degrades to "no sidecar
    // → keep every file": unpruned, never wrong.
    val tmp = new Path(root, GraftLines.RangesFile + ".tmp")
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(tmp, true), "UTF-8"))
    try merged.toSeq.sortBy(_._1).foreach { case (n, st) =>
      out.write(s"$n\t${st.lo}\t${st.hi}\t${st.rows}")
      out.newLine()
    } finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      sys.error(s"graftlines sidecar publish failed: rename $tmp -> $p " +
        "returned false")
  }
}

final class GraftLinesBatchWrite(path: String, truncate: Boolean,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private val stageDir = s"$path/_staging"

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new GraftLinesWriterFactory(stageDir, conf)

  override def commit(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, conf.value)
    if (truncate) {
      // clear previous VISIBLE data only after all tasks staged cleanly
      if (fs.exists(root)) fs.listStatus(root).foreach { s =>
        if (s.isFile && !s.getPath.getName.startsWith("_"))
          fs.delete(s.getPath, false)
      }
    }
    val commits = messages.collect { case m: GraftLinesCommit => m }
    commits.foreach { m =>
      val src = new Path(m.staged)
      val dst = new Path(root, m.publishedName)
      // a silent rename failure (pre-existing dst, missing parent, FS
      // race) would drop this task's rows while the job still reports
      // success — the exact partial-commit the 2PC protocol exists to
      // prevent. Fail the JOB instead.
      if (!fs.rename(src, dst))
        sys.error(s"graftlines 2PC publish failed: rename $src -> $dst " +
          "returned false; aborting commit")
    }
    GraftLinesRanges.update(fs, root, commits.toSeq, truncate)
    fs.delete(new Path(stageDir), true)
  }

  override def abort(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(path).toUri, conf.value)
    fs.delete(new Path(stageDir), true)
  }
}

final class GraftLinesWriterFactory(stageDir: String,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftLinesWriter(stageDir, partitionId, taskId, conf)
}

final class GraftLinesWriter(stageDir: String, partitionId: Int,
    taskId: Long, conf: SerializableHadoopConf, dstName: String = "")
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  // the STAGED name keeps the task id (two speculative attempts of one
  // partition must never collide mid-write); the PUBLISHED name is the
  // driver's business (GraftLinesCommit.publishedName)
  private val staged =
    new Path(s"$stageDir/part-$partitionId-$taskId.tsv.tmp")
  private val fs = FileSystem.get(staged.toUri, conf.value)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(staged, true), "UTF-8"))

  // per-file doc_id bounds, reported in the commit message so the
  // driver can maintain the _ranges.tsv sidecar (the runtime-filter
  // pruning stats) — the write pays nothing beyond two comparisons
  private var minId = Long.MaxValue
  private var maxId = Long.MinValue
  private var nRows = 0L

  override def write(r: InternalRow): Unit = {
    val id = r.getLong(0)
    if (id < minId) minId = id
    if (id > maxId) maxId = id
    nRows += 1
    out.write(s"$id\t${r.getUTF8String(1)}\t" +
      s"${r.getUTF8String(2)}\t${r.getLong(3)}")
    out.newLine()
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    GraftLinesCommit(staged.toString, dstName, minId, maxId, nRows)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(staged, false)
  }

  override def close(): Unit = ()
}

// ---------------------------------------------------------------------
// Streaming write — the same 2PC protocol, epoch-keyed for EXACTLY-ONCE
// across restarts: each epoch stages into its own hidden directory and
// publishes under replay-stable names (part-e<epoch>-p<partition>.tsv),
// and a `_committed-<epoch>` marker records a fully-published epoch.
// The streaming engine may re-run the last epoch after a restart whose
// sink commit never reached the checkpoint log; the marker makes that
// replay a no-op, and a crash BETWEEN renames re-publishes over the
// same deterministic names (replay from the same offsets writes the
// same bytes), so the visible directory converges instead of
// duplicating. Readers skip '_'-prefixed entries, so markers and stage
// dirs are invisible to both the batch scan and the stream source.
// ---------------------------------------------------------------------

final class GraftLinesStreamingWrite(path: String,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private def stageDir(epochId: Long) =
    new Path(path, s"_staging-epoch-$epochId")
  private def marker(epochId: Long) =
    new Path(path, s"_committed-$epochId")

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming
        .StreamingDataWriterFactory =
    new GraftLinesStreamingWriterFactory(path, conf)

  override def commit(epochId: Long, messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = FileSystem.get(root.toUri, conf.value)
    if (fs.exists(marker(epochId))) {
      // full-epoch replay after restart: already published exactly once
      fs.delete(stageDir(epochId), true)
      return
    }
    val commits = messages.collect { case m: GraftLinesCommit => m }
    commits.foreach { m =>
      val src = new Path(m.staged)
      val dst = new Path(root, m.publishedName)
      // re-publish after a mid-commit crash: same deterministic name,
      // same replayed bytes — overwrite, don't duplicate
      if (fs.exists(dst)) fs.delete(dst, false)
      if (!fs.rename(src, dst))
        sys.error(s"graftlines streaming 2PC publish failed: rename " +
          s"$src -> $dst returned false; aborting epoch $epochId")
    }
    // a crashed FIRST attempt may have published more partitions than
    // this replay planned (source listing change, upstream shuffle
    // nondeterminism): any part-e<epoch>-* file NOT in this commit's
    // set is a first-attempt orphan and would duplicate rows — delete
    // them before the marker seals the epoch. (Orphans are never in
    // the sidecar: the crashed attempt died before its sidecar update.)
    val published = commits.map(_.publishedName).toSet
    fs.listStatus(root).foreach { s =>
      val n = s.getPath.getName
      if (s.isFile && n.startsWith(s"part-e$epochId-") &&
          !published.contains(n))
        fs.delete(s.getPath, false)
    }
    // sidecar before marker: a crash between them re-runs this epoch,
    // and the name-keyed merge makes the replayed update idempotent
    GraftLinesRanges.update(fs, root, commits.toSeq, truncate = false)
    fs.create(marker(epochId), true).close()
    fs.delete(stageDir(epochId), true)
  }

  override def abort(epochId: Long, messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new Path(path).toUri, conf.value)
    fs.delete(stageDir(epochId), true)
  }
}

final class GraftLinesStreamingWriterFactory(path: String,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming
      .StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftLinesWriter(s"$path/_staging-epoch-$epochId", partitionId,
      taskId, conf, dstName = s"part-e$epochId-p$partitionId.tsv")
}
