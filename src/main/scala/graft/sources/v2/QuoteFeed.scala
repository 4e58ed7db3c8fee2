package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector emulating the reference's per-ticker market-data
  * pull (stock_data_pipeline/load_yfinance_data.py CollectDailyData /
  * main.py's per-ticker loop) as a DISTRIBUTED source: one input partition
  * per ticker, so a 500-ticker ingest fans out across executors instead of
  * looping on a driver, and requested-column pruning reaches the reader.
  *
  * The feed itself is deterministic synthetic OHLC ticks (seeded per
  * ticker) — the yfinance HTTP call's stand-in; a real connector would swap
  * the generator inside [[QuotePartitionReader]] for the API client and
  * keep every other piece.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-quotes")
  *     .option("tickers", "aapl,msft,xom")
  *     .option("days", "30")
  *     .load()
  * }}}
  */
class QuoteFeedProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-quotes"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QuoteFeed.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QuoteFeedTable(
      Option(properties.get("tickers")).getOrElse("aapl,msft").split(',').toSeq.map(_.trim),
      Option(properties.get("days")).map(_.toInt).getOrElse(30))
}

object QuoteFeed {
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("day", DateType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)))
}

class QuoteFeedTable(tickers: Seq[String], days: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_quotes(${tickers.mkString(",")})"
  override def schema(): StructType = QuoteFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QuoteScanBuilder(tickers, days)
}

class QuoteScanBuilder(tickers: Seq[String], days: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var required: StructType = QuoteFeed.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggSchema: Option[StructType] = None
  private var aggSpecs: Seq[String] = Nil // "count" | "min_day" | "max_day"
  private var aggGrouped: Boolean = false
  private var limit: Int = Int.MaxValue

  /** LIMIT n caps each partition's generated rows at n (a PARTIAL limit —
    * Spark still applies the global cut): a `feed.limit(5)` makes 5-row
    * upstream requests instead of full-history pulls. Returning false keeps
    * Spark's limit operator in the plan, which is what partial pushdown
    * requires.
    */
  override def pushLimit(n: Int): Boolean = {
    limit = n
    false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*)/MIN(day)/MAX(day), optionally grouped by ticker, are answered
    * per input partition WITHOUT materializing tick rows — the upstream
    * call for "how many days, what range" ships one summary row per ticker
    * instead of the feed.
    *
    * Grouped by ticker the pushdown is COMPLETE: partitions are one per
    * ticker by construction, so every group is fully contained in one
    * partition and Spark can drop its own aggregate (and the exchange under
    * it) entirely. Ungrouped stays partial — the global aggregate spans
    * partitions and Spark must merge the per-partition summaries.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions.nonEmpty && pushAggregationCheck(aggregation)

  private def pushAggregationCheck(aggregation: Aggregation): Boolean = {
    def isCol(e: Any, name: String): Boolean = e match {
      case f: NamedReference => f.fieldNames.length == 1 && f.fieldNames()(0) == name
      case _ => false
    }
    aggregation.groupByExpressions.forall(isCol(_, "ticker")) &&
      aggregation.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isCol(m.column, "day")
        case m: Max => isCol(m.column, "day")
        case _ => false
      }
  }

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def isCol(e: Any, name: String): Boolean = e match {
      case f: NamedReference => f.fieldNames.length == 1 && f.fieldNames()(0) == name
      case _ => false
    }
    val groupOk = aggregation.groupByExpressions.forall(isCol(_, "ticker"))
    val specs = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if isCol(m.column, "day") => Some("min_day")
      case m: Max if isCol(m.column, "day") => Some("max_day")
      case _ => None
    }
    if (!groupOk || specs.exists(_.isEmpty)) return false
    aggSpecs = specs.flatten
    aggGrouped = aggregation.groupByExpressions.nonEmpty
    // contract: the pushed-aggregate read schema is the GROUP-BY columns
    // first, then the aggregate columns, both in Aggregation order — Spark
    // rebinds positionally (V2ScanRelationPushDown's projection)
    val groupFields =
      if (aggGrouped) Seq(StructField("ticker", StringType, nullable = false)) else Nil
    val aggFields = aggSpecs.map {
      case "count" => StructField("count_star", LongType, nullable = false)
      case "min_day" => StructField("min_day", DateType, nullable = false)
      case "max_day" => StructField("max_day", DateType, nullable = false)
    }
    aggSchema = Some(StructType(groupFields ++ aggFields))
    true
  }

  /** Ticker equality/membership predicates prune INPUT PARTITIONS — a
    * `WHERE ticker = 'x'` over a 500-ticker feed plans one partition and
    * makes one upstream call, instead of 500 calls filtered afterwards.
    * Accepted filters are fully handled here (no residual re-evaluation);
    * everything else stays with Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("ticker", _: String) => true
      case In("ticker", _) => true
      case _ => false
    }
    pushed = supported
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def keptTickers: Seq[String] = tickers.filter(t => pushed.forall {
    case EqualTo("ticker", v) => t == v
    case In("ticker", vs) => vs.exists(_ == t)
    case _ => true
  })

  override def build(): Scan = new Scan with Batch with SupportsReportPartitioning
      with SupportsReportOrdering {
    override def readSchema(): StructType = aggSchema.getOrElse(required)
    override def toBatch: Batch = this

    /** The feed is key-grouped by construction — one input partition per
      * ticker — so report exactly that: with
      * `spark.sql.sources.v2.bucketing.enabled=true`, ANY
      * `groupBy("ticker")` aggregate (not just the pushed count/min/max)
      * and ticker-keyed storage-partitioned joins satisfy their clustered
      * distribution straight off the scan — zero Exchange. Each partition
      * carries its key ([[QuotePartition.partitionKey]]); the report
      * degrades to unknown when column pruning drops `ticker` from the
      * read schema (nothing downstream could bind the key expression).
      */
    override def outputPartitioning(): Partitioning =
      if (readSchema().fieldNames.contains("ticker"))
        new KeyGroupedPartitioning(Array(Expressions.identity("ticker")), keptTickers.size)
      else new UnknownPartitioning(keptTickers.size)

    /** Each partition is one ticker whose reader emits days ASCENDING by
      * construction, so rows are sorted by (ticker, day) within every
      * partition — reported so a per-ticker time window
      * (`Window.partitionBy(ticker).orderBy(day)`) or a ticker-keyed
      * merge plans with NO Sort on top of the scan (and, with the
      * key-grouped report above, no Exchange either). Withheld when
      * pruning/aggregation drops the ordered columns.
      */
    override def outputOrdering(): Array[SortOrder] = {
      val names = readSchema().fieldNames
      if (names.contains("ticker") && names.contains("day") && aggSchema.isEmpty)
        Array(
          Expressions.sort(Expressions.identity("ticker"),
            SortDirection.ASCENDING, NullOrdering.NULLS_FIRST),
          Expressions.sort(Expressions.identity("day"),
            SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))
      else Array.empty
    }

    override def description(): String =
      s"graft-quotes tickers=${tickers.size} days=$days " +
        s"cols=${readSchema().fieldNames.mkString(",")} pushed=[${pushed.mkString(",")}]" +
        (if (aggSchema.isDefined) s" pushedAggregates=[${aggSpecs.mkString(",")}]" else "") +
        (if (limit != Int.MaxValue && aggSchema.isEmpty) s" pushedLimit=$limit" else "")
    override def planInputPartitions(): Array[InputPartition] = {
      val keep = keptTickers
      // the limit cap never composes with a pushed aggregate: Spark only
      // pushes a limit sitting directly above the scan, and the agg reader's
      // count = days must stay the true row count regardless
      val cappedDays = if (aggSchema.isDefined) days else math.min(days, limit)
      keep.map(t =>
        QuotePartition(t, cappedDays, required.fieldNames,
          if (aggSchema.isDefined) Some((aggGrouped, aggSpecs)) else None): InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
          val p = partition.asInstanceOf[QuotePartition]
          p.agg match {
            case Some((grouped, specs)) => new QuoteAggReader(p, grouped, specs)
            case None => new QuotePartitionReader(p)
          }
        }
      }
  }
}

/** Pushed-aggregate reader: one summary row per ticker partition — the
  * generator (stand-in for the upstream API) is never asked for tick rows.
  * count(*) = days and the day range is the partition's [day0, day0+days)
  * by construction, all O(1).
  */
class QuoteAggReader(p: QuotePartition, grouped: Boolean, specs: Seq[String])
    extends PartitionReader[InternalRow] {
  private val epochDay0 = 19723L // 2024-01-01, same origin as the row reader
  private var emitted = false

  override def next(): Boolean = !emitted && { emitted = true; true }

  override def get(): InternalRow = {
    val groupVals: Seq[Any] = if (grouped) Seq(UTF8String.fromString(p.ticker)) else Nil
    val aggVals: Seq[Any] = specs.map {
      case "count" => p.days.toLong
      case "min_day" => epochDay0.toInt
      case "max_day" => (epochDay0 + p.days - 1).toInt
    }
    // group columns first, then aggregates — mirrors the read schema
    InternalRow.fromSeq(groupVals ++ aggVals)
  }

  override def close(): Unit = ()
}

case class QuotePartition(ticker: String, days: Int, columns: Array[String],
                          agg: Option[(Boolean, Seq[String])] = None)
    extends InputPartition with HasPartitionKey {
  /** The partition's grouping-key value — what lets Spark trust the scan's
    * [[KeyGroupedPartitioning]] report and plan ticker-clustered operators
    * without an exchange.
    */
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString(ticker))
}

/** Deterministic per-ticker generator (xorshift seeded by ticker name) —
  * the slot where a real implementation calls the upstream API once per
  * partition and iterates its response.
  */
class QuotePartitionReader(p: QuotePartition) extends PartitionReader[InternalRow] {
  private val epochDay0 = 19723L // 2024-01-01
  private var i = -1
  private var price = 50.0 + (math.abs(p.ticker.hashCode) % 200)
  private var seed = p.ticker.hashCode.toLong | 1L

  private def nextRand(): Double = {
    seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
    (seed >>> 11).toDouble / (1L << 53).toDouble
  }

  private var row: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= p.days) return false
    val open = price
    val drift = (nextRand() - 0.5) * 4.0
    val close = math.max(1.0, open + drift)
    val high = math.max(open, close) + nextRand()
    val low = math.max(0.5, math.min(open, close) - nextRand())
    val volume = 100000L + (nextRand() * 1000000L).toLong
    price = close
    val all = Map[String, Any](
      "ticker" -> UTF8String.fromString(p.ticker),
      "day" -> (epochDay0 + i).toInt,
      "open" -> math.round(open * 100) / 100.0,
      "high" -> math.round(high * 100) / 100.0,
      "low" -> math.round(low * 100) / 100.0,
      "close" -> math.round(close * 100) / 100.0,
      "volume" -> volume)
    row = InternalRow.fromSeq(p.columns.toIndexedSeq.map(all))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
