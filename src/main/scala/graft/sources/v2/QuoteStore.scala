package graft.sources.v2

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.LocalDate
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A day-partitioned quote STORE behind a [[TableCatalog]] — the WRITE side
  * of the DSv2 surface, completing [[QuoteFeedProvider]] (read-only feed)
  * with the same semantics [[graft.sources.Sinks]] provides over parquet:
  *
  *   - `append`            ⇔ Sinks.writeByDay     (add rows to day dirs)
  *   - `overwritePartitions` ⇔ Sinks.restateDays  (replace ONLY the days
  *     present in the incoming frame — the late-correction path; dynamic
  *     partition overwrite, TableCapability.OVERWRITE_DYNAMIC)
  *   - `overwrite(true)`   ⇔ full truncate-and-load
  *
  * Registration (any catalog name):
  * {{{
  *   spark.conf.set("spark.sql.catalog.quotes", classOf[QuoteStoreCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.quotes.root", "/data/quote-stores")
  *   df.writeTo("quotes.nyse").append()
  *   corrections.writeTo("quotes.nyse").overwritePartitions()
  * }}}
  *
  * Storage is one directory per day (`day=YYYY-MM-DD/part-*.csv`, the day
  * itself lives only in the directory key, exactly like parquet
  * partitioning) so day-ranged reads prune directories before any file
  * opens. Commit protocol: writers stage under `_staging/<queryId>` and
  * commit MOVES files in after clearing replaced partitions — idempotent
  * on re-run but, like any plain file sink, not crash-atomic mid-commit
  * (same contract as Sinks.restateDays; a transaction-log table format is
  * the upgrade when that window matters).
  */
class QuoteStoreCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-quote-store")
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (root +: (ident.namespace() :+ ident.name()).toSeq).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new File((root +: namespace.toSeq).mkString("/"))
    if (!dir.isDirectory) Array.empty
    else dir.listFiles().filter(_.isDirectory).map(f => Identifier.of(namespace, f.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = new File(pathOf(ident))
    if (!dir.isDirectory) throw new NoSuchTableException(ident)
    new QuoteStoreTable(pathOf(ident), ident.toString)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(schema.fieldNames.sorted.sameElements(QuoteFeed.schema.fieldNames.sorted),
      s"quote store tables have the fixed quote schema, got ${schema.simpleString}")
    Files.createDirectories(Paths.get(pathOf(ident)))
    new QuoteStoreTable(pathOf(ident), ident.toString)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTable(ident,
      StructType(columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable()))),
      partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("quote store tables have a fixed schema")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = new File(pathOf(ident))
    if (!dir.isDirectory) return false
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("quote store tables do not rename")
}

object QuoteStore {
  val DAY_PREFIX = "day="

  /** The data-file columns, in file order — `day` is NOT among them: the
    * partition value lives in the directory key alone, like parquet.
    */
  val fileColumns: Seq[String] = Seq("ticker", "open", "high", "low", "close", "volume")

  def dayDirs(tablePath: String): Seq[(Int, File)] = {
    val dir = new File(tablePath)
    if (!dir.isDirectory) Nil
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(DAY_PREFIX))
      .map(f => (LocalDate.parse(f.getName.stripPrefix(DAY_PREFIX)).toEpochDay.toInt, f))
      .sortBy(_._1)
  }
}

class QuoteStoreTable(val path: String, ident: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_quote_store($ident)"
  override def schema(): StructType = QuoteFeed.schema
  override def partitioning(): Array[Transform] = Array(Expressions.identity("day"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QuoteStoreScanBuilder(path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new QuoteStoreWriteBuilder(path, info)
}

/** Read side: one input partition per day directory; day predicates prune
  * DIRECTORIES before any file opens (the restatement read path: "re-read
  * the corrected day" costs one directory), ticker equality/membership
  * predicates are pushed INTO the line reader (rows for other tickers are
  * skipped at parse time, before any numeric conversion or InternalRow
  * allocation — the store's files are day-partitioned so ticker can't
  * prune directories, but it can prune every row the engine never needs
  * to see), and column pruning reaches the line parser. Mirrors the feed
  * side's ticker pushdown (QuoteFeed.scala), where per-ticker partitioning
  * makes the same predicate prune whole partitions.
  */
class QuoteStoreScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = QuoteFeed.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("day", _) | In("day", _) | GreaterThan("day", _) |
           GreaterThanOrEqual("day", _) | LessThan("day", _) | LessThanOrEqual("day", _) => true
      case EqualTo("ticker", _: String) | In("ticker", _) => true
      case _ => false
    }
    pushed = supported
    residual
  }

  /** Conjunction of the pushed ticker predicates as an allow-set; None =
    * unconstrained. An In with non-string members is conservative
    * (unconstrained) — pushFilters never accepts one, belt and braces.
    */
  private def tickerAllow: Option[Set[String]] = {
    val sets = pushed.collect {
      case EqualTo("ticker", t: String) => Set(t)
      case In("ticker", vs) if vs.forall(_.isInstanceOf[String]) =>
        vs.map(_.asInstanceOf[String]).toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def epochDay(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: LocalDate => d.toEpochDay.toInt
    case other => throw new IllegalArgumentException(s"unexpected day literal: $other")
  }

  private def keepDay(day: Int): Boolean = pushed.forall {
    case EqualTo("day", v) => day == epochDay(v)
    case In("day", vs) => vs.exists(epochDay(_) == day)
    case GreaterThan("day", v) => day > epochDay(v)
    case GreaterThanOrEqual("day", v) => day >= epochDay(v)
    case LessThan("day", v) => day < epochDay(v)
    case LessThanOrEqual("day", v) => day <= epochDay(v)
    case _ => true
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-quote-store path=$path cols=${required.fieldNames.mkString(",")} " +
        s"pushed=[${pushed.mkString(",")}]"
    override def planInputPartitions(): Array[InputPartition] =
      QuoteStore.dayDirs(path)
        .filter { case (day, _) => keepDay(day) }
        .map { case (day, dir) =>
          QuoteStorePartition(day,
            dir.listFiles().filter(_.getName.endsWith(".csv")).map(_.getAbsolutePath),
            required.fieldNames, tickerAllow): InputPartition
        }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
          new QuoteStoreReader(partition.asInstanceOf[QuoteStorePartition])
      }
  }
}

case class QuoteStorePartition(day: Int, files: Array[String], columns: Array[String],
                               tickerAllow: Option[Set[String]])
    extends InputPartition

class QuoteStoreReader(p: QuoteStorePartition) extends PartitionReader[InternalRow] {
  private val lines: Iterator[String] = p.files.iterator.flatMap { f =>
    Files.readAllLines(Paths.get(f), StandardCharsets.UTF_8).asScala
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    var parts: Array[String] = null
    // pushed ticker predicate: skip foreign-ticker lines at parse time,
    // before any numeric conversion or row allocation
    while (parts == null && lines.hasNext) {
      val cand = lines.next().split(',')
      if (p.tickerAllow.forall(_.contains(cand(0)))) parts = cand
    }
    if (parts == null) return false
    val all = Map[String, Any](
      "ticker" -> UTF8String.fromString(parts(0)),
      "day" -> p.day,
      "open" -> parts(1).toDouble,
      "high" -> parts(2).toDouble,
      "low" -> parts(3).toDouble,
      "close" -> parts(4).toDouble,
      "volume" -> parts(5).toLong)
    row = InternalRow.fromSeq(p.columns.toIndexedSeq.map(all))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Write side. Mode is chosen by Spark's V2 write planning:
  * AppendData → append, OverwritePartitionsDynamic → dynamic,
  * OverwriteByExpression(true) → truncate.
  */
class QuoteStoreWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate with SupportsDynamicOverwrite {
  private var mode: String = "append"

  override def truncate(): WriteBuilder = { mode = "truncate"; this }
  override def overwriteDynamicPartitions(): WriteBuilder = { mode = "dynamic"; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new QuoteStoreBatchWrite(
      path, mode, info.queryId(), info.schema())
  }
}

case class QuoteStoreCommit(stagedByDay: Seq[(String, String)]) extends WriterCommitMessage

class QuoteStoreBatchWrite(path: String, mode: String, queryId: String,
                           writeSchema: StructType) extends BatchWrite {
  private val staging = s"$path/_staging/$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(staging))
    new QuoteStoreWriterFactory(staging, writeSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.flatMap {
      case QuoteStoreCommit(s) => s
      case _ => Nil
    }
    val tableDir = new File(path)
    def clearDay(dirName: String): Unit = {
      val d = new File(tableDir, dirName)
      if (d.isDirectory) d.listFiles().foreach(_.delete())
    }
    mode match {
      case "truncate" =>
        // full overwrite: every existing partition goes, incl. days the
        // incoming frame doesn't mention
        tableDir.listFiles().toSeq
          .filter(f => f.isDirectory && f.getName.startsWith(QuoteStore.DAY_PREFIX))
          .foreach(d => { d.listFiles().foreach(_.delete()); d.delete() })
      case "dynamic" =>
        // restatement: replace ONLY the days the write touched
        staged.map(_._1).distinct.foreach(clearDay)
      case _ => // append clears nothing
    }
    staged.foreach { case (dayDir, file) =>
      val target = new File(new File(tableDir, dayDir), new File(file).getName)
      Files.createDirectories(target.getParentFile.toPath)
      Files.move(Paths.get(file), target.toPath, StandardCopyOption.REPLACE_EXISTING)
    }
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanupStaging()

  private def cleanupStaging(): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val s = new File(staging)
    if (s.exists()) rm(s)
    // drop the _staging parent when no other query is mid-flight
    val parent = new File(s"$path/_staging")
    if (parent.isDirectory && parent.listFiles().isEmpty) parent.delete()
  }
}

class QuoteStoreWriterFactory(staging: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new QuoteStoreWriter(staging, schema, partitionId, taskId)
}

/** Buffers rows per day and stages one file per (task, day); the commit
  * message carries (day dir, staged file) pairs so the driver-side commit
  * knows exactly which partitions the write touched — that list IS the
  * dynamic-overwrite scope.
  */
class QuoteStoreWriter(staging: String, schema: StructType,
                       partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val idx: Map[String, Int] =
    QuoteFeed.schema.fieldNames.map(n => n -> schema.fieldIndex(n)).toMap
  private val byDay = scala.collection.mutable.Map.empty[Int, StringBuilder]

  override def write(row: InternalRow): Unit = {
    val day = row.getInt(idx("day"))
    val sb = byDay.getOrElseUpdate(day, new StringBuilder)
    sb.append(row.getUTF8String(idx("ticker")).toString).append(',')
      .append(row.getDouble(idx("open"))).append(',')
      .append(row.getDouble(idx("high"))).append(',')
      .append(row.getDouble(idx("low"))).append(',')
      .append(row.getDouble(idx("close"))).append(',')
      .append(row.getLong(idx("volume"))).append('\n')
  }

  override def commit(): WriterCommitMessage = {
    val staged = byDay.toSeq.map { case (day, sb) =>
      val dayDir = QuoteStore.DAY_PREFIX + LocalDate.ofEpochDay(day.toLong)
      val f = Paths.get(staging, s"part-$partitionId-$taskId-$dayDir.csv")
      Files.write(f, sb.toString.getBytes(StandardCharsets.UTF_8))
      (dayDir, f.toString)
    }
    QuoteStoreCommit(staged)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
