package graft.sources

import java.io.{BufferedReader, File}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import scala.annotation.tailrec
import scala.collection.JavaConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Kafka-shaped DataSource V2 micro-batch streaming SOURCE + SINK over
  * partitioned, append-only JSON-lines "topic" directories — the executable
  * stand-in for the reference's Kafka edge (S1 `kafka_to_clickhouse.py:50-58`
  * consume, S3 `sales_producer.py:160-165` produce), built so the exact
  * engine API surface the Kafka connector implements — offsets,
  * `planInputPartitions`, admission control, `commit`/`abort` — runs for
  * real in this environment (no broker / connector jar available; the
  * `format("kafka")` wiring in [[graft.streaming.StreamAssembly]] stays the
  * deployment path and becomes a jar-swap).
  *
  * Topic layout (what [[GraftLog.stageTopic]] writes):
  * {{{
  *   <topic>/p=<k>/part-*.txt     // JSON-lines segment files, log order =
  *                                // (mtime, name) — appends stage strictly
  *                                // newer segments, like Kafka log segments
  * }}}
  * A record's offset within topic-partition k is its line index in that
  * concatenated segment order; offsets are therefore stable across
  * re-listings (segments are immutable once written) and a committed offset
  * replays to byte-identical records — the property exactly-once recovery
  * rests on.
  *
  * Read path: `partition INT, offset LONG, value STRING` (the Kafka wire
  * shape). `maxRecordsPerTrigger` is admission control
  * ([[SupportsTriggerAvailableNow]] ⊃ [[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]]),
  * distributed across partitions proportionally to their backlog — the same
  * contract as the Kafka connector's `maxOffsetsPerTrigger`. `minPartitions`
  * splits offset ranges into more input partitions than topic partitions
  * (again mirroring Kafka's option) so a 1000-executor cluster isn't capped
  * by topic-partition count.
  *
  * Write path: requires a single `value STRING` column (the Kafka producer
  * shape). Executors append segment files directly (no data through the
  * driver); the driver-side `commit(epoch, messages)` publishes an atomic
  * per-epoch MANIFEST listing exactly the files of the winning task
  * attempts, `abort` deletes them. Readers ([[GraftLog.readCommitted]]) see
  * only manifested files, so a crash between sink write and checkpoint
  * commit replays the epoch and REPLACES its manifest — exactly-once
  * downstream, the stronger contract the reference's at-least-once consumer
  * lacks.
  */
class GraftLog extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.readSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftLogTable
}

private[graft] class GraftLogTable extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = "graftlog"
  override def schema(): StructType = GraftLog.readSchema
  // ACCEPT_ANY_SCHEMA: the WRITE schema (a single `value` column) is not the
  // READ schema (partition/offset/value) — same asymmetry as Kafka; the
  // write builder does its own validation
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftLog.readSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftLogMicroBatchStream(
            GraftLog.requirePath(options),
            Option(options.get("maxRecordsPerTrigger")).map(_.toLong),
            Option(options.get("minPartitions")).map(_.toInt).getOrElse(1))
        // batch backfill over the same topic (the Kafka `spark.read
        // .format("kafka")` analogue): a snapshot of the current segment
        // list planned as the same offset-ranged partitions the stream
        // reads — one history-replay path, two trigger disciplines
        override def toBatch(): Batch = {
          val stream = new GraftLogMicroBatchStream(
            GraftLog.requirePath(options), None,
            Option(options.get("minPartitions")).map(_.toInt).getOrElse(1))
          new Batch {
            override def planInputPartitions(): Array[InputPartition] =
              stream.planInputPartitions(
                stream.initialOffset(), stream.latestOffset())
            override def createReaderFactory(): PartitionReaderFactory =
              new LogReaderFactory
          }
        }
        override def description(): String = "graftlog"
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.length == 1 && s.head.dataType == StringType &&
      s.head.name == "value",
      s"graftlog sink requires a single `value STRING` column " +
        s"(the Kafka producer shape), got ${s.simpleString}")
    val dir = GraftLog.requirePath(info.options())
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new GraftLogStreamingWrite(dir)
        override def description(): String = s"graftlog($dir)"
      }
    }
  }
}

object GraftLog {
  /** Usable directly as `.format(GraftLog.format)`; `.format("graftlog")`
    * also resolves via the `DataSourceRegister` service file.
    */
  val format: String = classOf[GraftLog].getName

  val readSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  private[graft] def requirePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graftlog requires option(\"path\", dir)")
    p
  }

  /** PRODUCER staging: append `df` to the topic as JSON-lines segment files,
    * key-partitioned into `nPartitions` topic partitions (the
    * `sales_producer.py:160-165` role, executed by Spark tasks — no data
    * through the driver). New segment files are stamped strictly newer than
    * every existing one so the per-partition log ORDER is append-stable
    * (the property committed offsets need to survive later appends).
    */
  def stageTopic(df: DataFrame, dir: String, nPartitions: Int,
                 key: Column): Unit = {
    val root = new File(dir)
    def files(): Array[File] =
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).filter(_.getName.startsWith("p="))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))
    val before = files().map(_.getPath).toSet
    val prevMax = (0L +: files().map(_.lastModified)).max
    df.withColumn("p", pmod(key.cast("long"), lit(nPartitions)).cast("int"))
      .repartition(nPartitions, col("p"))
      .select(col("p"),
        to_json(struct(df.columns.map(col): _*),
          Map("timestampFormat" -> timestampFormat)).as("value"))
      .write.mode("append").partitionBy("p").text(dir)
    files().filterNot(f => before(f.getPath))
      .foreach(_.setLastModified(prevMax + 60000L))
  }

  /** Micro-precision roundtrip format shared by producer staging and
    * consumers: the default JSON timestamp pattern truncates to millis,
    * which would silently move sub-millisecond events across window edges.
    */
  val timestampFormat: String = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** CONSUMER read side of the sink: only files listed in committed epoch
    * manifests are visible (orphans from replaced epoch attempts are not).
    * Returns the single-`value` frame the sink was given.
    */
  def readCommitted(spark: SparkSession, dir: String): DataFrame = {
    val mdir = new File(s"$dir/manifests")
    val listed = Option(mdir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("epoch-"))
      .sortBy(_.getName)
      .flatMap(m => Files.readAllLines(m.toPath, UTF_8).asScala)
      .map(rel => s"$dir/$rel")
    if (listed.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](),
        StructType(Seq(StructField("value", StringType))))
    else spark.read.text(listed.toIndexedSeq: _*)
  }
}

/** One immutable run of records `[start, end)` of a topic partition. */
private[graft] case class LogSegment(path: String, start: Long, end: Long)

/** Per-topic-partition offset map; JSON form `{"0":123,"1":456}` (sorted,
  * so equal offsets serialize identically — offset equality is how the
  * engine detects "no new data").
  */
private[graft] case class LogOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String =
    parts.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[graft] object LogOffset {
  def parse(s: String): LogOffset = {
    val body = s.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) LogOffset(Map.empty)
    else LogOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }
  def of(o: Offset): LogOffset = o match {
    case l: LogOffset => l
    case other => parse(other.json())
  }
}

/** The engine-facing stream: offset bookkeeping on the driver (the broker-
  * metadata role — segment listing + record counts, cached per immutable
  * file identity), record reads on executors.
  */
private[graft] class GraftLogMicroBatchStream(
    topicDir: String,
    maxPerTrigger: Option[Long],
    minPartitions: Int)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  // (path, mtime, length) → line count: segments are immutable, so counting
  // happens once per file, not once per trigger poll
  private val countCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long), Long]

  private def countLines(f: File): Long =
    countCache.getOrElseUpdate((f.getPath, f.lastModified, f.length), {
      val br = Files.newBufferedReader(f.toPath, UTF_8)
      try {
        var n = 0L
        while (br.readLine() != null) n += 1
        n
      } finally br.close()
    })

  private def listSegments(): Map[Int, Seq[LogSegment]] = {
    val root = new File(topicDir)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("p="))
      .map { d =>
        val pid = d.getName.stripPrefix("p=").toInt
        val files = Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && !f.getName.startsWith(".") &&
            !f.getName.startsWith("_"))
          .sortBy(f => (f.lastModified, f.getName))
        var off = 0L
        val segs = files.map { f =>
          val n = countLines(f)
          val s = LogSegment(f.getPath, off, off + n)
          off += n
          s
        }
        pid -> segs.toSeq
      }.toMap
  }

  @volatile private var segments: Map[Int, Seq[LogSegment]] = listSegments()
  // Trigger.AvailableNow contract: offsets visible at prepare time are the
  // drain target; segments appended after it are left for the next run
  @volatile private var availableNowEnd: Option[Map[Int, Long]] = None

  private def endOffsets: Map[Int, Long] =
    segments.map { case (p, ss) => p -> ss.lastOption.map(_.end).getOrElse(0L) }

  override def prepareForTriggerAvailableNow(): Unit = {
    segments = listSegments()
    availableNowEnd = Some(endOffsets)
  }

  override def initialOffset(): Offset =
    LogOffset(segments.keys.map(_ -> 0L).toMap)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    LogOffset(availableNowEnd.getOrElse { segments = listSegments(); endOffsets })

  private def maxRowsOf(limit: ReadLimit): Option[Long] = limit match {
    case r: ReadMaxRows => Some(r.maxRows())
    case c: CompositeReadLimit =>
      val caps = c.getReadLimits.toSeq.flatMap(maxRowsOf)
      if (caps.isEmpty) None else Some(caps.min)
    case _: ReadAllAvailable => None
    case _ => None
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    if (availableNowEnd.isEmpty) segments = listSegments()
    val end = availableNowEnd.getOrElse(endOffsets)
    val from = LogOffset.of(start).parts
    val avail = end.map { case (p, e) =>
      p -> math.max(0L, e - from.getOrElse(p, 0L))
    }
    val total = avail.values.sum
    val next = maxRowsOf(limit).filter(_ < total) match {
      case None => end
      case Some(cap) =>
        // Kafka-style proportional admission: each backlogged partition
        // advances ⌊cap·availᵖ/total⌋ but at least 1, so progress is
        // monotone even when cap < partition count (slight overshoot over
        // cap is the documented Kafka behavior too)
        end.map { case (p, e) =>
          val a = avail(p)
          val adv = if (a == 0) 0L else math.max(1L, cap * a / total)
          p -> math.min(e, from.getOrElse(p, 0L) + adv)
        }
    }
    LogOffset(next)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = LogOffset.of(start).parts
    val until = LogOffset.of(end).parts
    until.toSeq.sortBy(_._1).flatMap { case (pid, hi) =>
      val lo = from.getOrElse(pid, 0L)
      val n = hi - lo
      if (n <= 0) Nil
      else {
        val segs = segments.getOrElse(pid, Nil)
          .filter(s => s.end > lo && s.start < hi)
        // minPartitions: split the offset range into more input partitions
        // than topic partitions (Kafka's option of the same name) — reader
        // parallelism is then a config, not a topic-layout ceiling
        val splits = math.min(math.max(1, minPartitions), n).toInt
        val step = (n + splits - 1) / splits
        (0 until splits).map { i =>
          val a = lo + i.toLong * step
          val b = math.min(hi, a + step)
          LogInputPartition(pid, segs.filter(s => s.end > a && s.start < b), a, b)
        }.filter(p => p.until > p.from)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory

  override def deserializeOffset(json: String): Offset = LogOffset.parse(json)
  // a broker GC's consumed segments on retention, not on consumer commit;
  // the checkpoint owns progress (same as the Kafka source: no broker-side
  // offset commit)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class LogInputPartition(
    pid: Int, segs: Seq[LogSegment], from: Long, until: Long)
  extends InputPartition

private[graft] class LogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LogPartitionReader(partition.asInstanceOf[LogInputPartition])
}

/** Executor-side record reader: per overlapping segment, skip to the range
  * start and emit `(partition, offset, value)` rows until the range end.
  * The line-skip is O(segment prefix) on a local-FS fixture; a deployment
  * impl indexes segment byte offsets (Kafka's `.index` role) — the engine
  * contract exercised here is identical.
  */
private[graft] class LogPartitionReader(p: LogInputPartition)
  extends PartitionReader[InternalRow] {

  private val segIter =
    p.segs.filter(s => s.end > p.from && s.start < p.until).iterator
  private var br: BufferedReader = null
  private var segEnd = 0L
  private var curOffset = 0L
  private var current: String = null

  @tailrec private def ensureSegment(): Boolean =
    if (br != null && curOffset < segEnd) true
    else {
      if (br != null) { br.close(); br = null }
      if (!segIter.hasNext) false
      else {
        val seg = segIter.next()
        br = Files.newBufferedReader(Paths.get(seg.path), UTF_8)
        var skip = math.max(p.from, seg.start) - seg.start
        while (skip > 0) { br.readLine(); skip -= 1 }
        curOffset = math.max(p.from, seg.start)
        segEnd = math.min(p.until, seg.end)
        if (curOffset < segEnd) true else ensureSegment()
      }
    }

  override def next(): Boolean =
    if (!ensureSegment()) false
    else {
      current = br.readLine()
      if (current == null)
        throw new IllegalStateException(
          s"graftlog segment truncated under committed offset $curOffset " +
            s"in partition ${p.pid} — segments must be immutable")
      curOffset += 1
      true
    }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      p.pid, curOffset - 1, UTF8String.fromString(current)))

  override def close(): Unit = if (br != null) { br.close(); br = null }
}

private[graft] case class LogFileMessage(file: String, rows: Long)
  extends WriterCommitMessage

/** Driver-side transactional publish: executors stream rows straight to
  * per-attempt segment files (never through the driver); `commit` writes
  * the epoch's manifest ATOMICALLY (tmp + atomic move), listing exactly the
  * winning attempts' files. An epoch replayed after a crash re-runs its
  * tasks under new attempt ids and REPLACES the manifest — the replaced
  * attempt's files become invisible orphans, so readers see each epoch's
  * data exactly once.
  */
private[graft] class GraftLogStreamingWrite(outDir: String)
  extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    LogWriterFactory(outDir)

  // default useCommitCoordinator=true: at most one task attempt per
  // partition gets its message into `messages` — the attempt dedup a
  // speculative retry needs

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val mdir = Paths.get(outDir, "manifests")
    Files.createDirectories(mdir)
    val body = messages.collect { case LogFileMessage(f, _) => f }
      .sorted.mkString("", "\n", "\n")
    val tmp = mdir.resolve(f".epoch-$epochId%09d.tmp")
    Files.write(tmp, body.getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, mdir.resolve(f"epoch-$epochId%09d"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case LogFileMessage(f, _) => f }
      .foreach(f => Files.deleteIfExists(Paths.get(outDir, f)))
}

private[graft] case class LogWriterFactory(outDir: String)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new LogDataWriter(outDir, partitionId, taskId, epochId)
}

/** Executor-side writer: one segment file per (epoch, partition, attempt).
  * The attempt id in the name keeps concurrent speculative attempts from
  * clobbering each other; only the committed attempt's file reaches the
  * manifest, `abort` deletes the loser's.
  */
private[graft] class LogDataWriter(outDir: String, partitionId: Int,
                                     taskId: Long, epochId: Long)
  extends DataWriter[InternalRow] {

  private val rel = f"data/e$epochId%09d-p$partitionId%05d-t$taskId.txt"
  private val path = Paths.get(outDir, rel)
  Files.createDirectories(path.getParent)
  private val out = Files.newBufferedWriter(path, UTF_8,
    StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (!row.isNullAt(0)) out.write(row.getUTF8String(0).toString)
    out.write('\n')
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    LogFileMessage(rel, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(path)
    ()
  }

  override def close(): Unit = out.close()
}
