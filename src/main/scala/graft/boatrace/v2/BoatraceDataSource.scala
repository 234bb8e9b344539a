package graft.boatrace.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.boatrace.{BoatracePipeline, GoldenCsv, KbParser}
import graft.sources.Lha

/** DataSource V2 connector: `spark.read.format("boatrace")` over a
  * directory of official K/B files — extracted TXT or raw LZH
  * archives, auto-detected per file.
  *
  * ```
  * spark.read.format("boatrace").option("table", "result")
  *   .load("/data/lzh")          // or .option("table", "odds") etc.
  * ```
  *
  * The optional custom piece of SURVEY §4, done the DSv2 way:
  *  - planning lists files on the driver (one InputPartition per
  *    file — the same unit of work the flatMap pipeline uses; at
  *    scale the listing is the only driver-side cost);
  *  - decode (lh5 + CP932) and parse run inside the partition reader
  *    on executors;
  *  - column pruning is pushed down (`SupportsPushDownRequiredColumns`):
  *    a `select(レースID)` materializes one UTF8String per row, not 14.
  *
  * Registered as short name `boatrace` via DataSourceRegister
  * (META-INF/services).
  */
class DefaultSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "boatrace"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BoatraceTable.schemaFor(BoatraceTable.tableName(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BoatraceTable(
      BoatraceTable.tableName(new CaseInsensitiveStringMap(properties)),
      BoatraceTable.paths(new CaseInsensitiveStringMap(properties)))
}

object BoatraceTable {
  val Tables: Map[String, Seq[String]] = Map(
    "result" -> GoldenCsv.ResultHeader,
    "env" -> GoldenCsv.EnvHeader,
    "odds" -> GoldenCsv.OddsHeader,
    "schedule" -> GoldenCsv.ScheduleHeader)

  def tableName(options: CaseInsensitiveStringMap): String = {
    val t = options.getOrDefault("table", "result")
    require(Tables.contains(t), s"unknown boatrace table '$t' " +
      s"(expected one of ${Tables.keys.mkString(", ")})")
    t
  }

  /** String-typed parity schema (SURVEY §1.3). */
  def schemaFor(table: String): StructType =
    StructType(Tables(table).map(StructField(_, StringType, nullable = false)))

  def paths(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("paths"))
      .map { json =>
        // Spark serializes multi-path loads as a JSON array; parse it
        // properly (paths may contain commas/escapes)
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        m.readValue(json, classOf[Array[String]]).toSeq
      }
      .orElse(Option(options.get("path")).map(Seq(_)))
      .getOrElse(Seq.empty)
}

final class BoatraceTable(table: String, roots: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"boatrace.$table"
  override def schema(): StructType = BoatraceTable.schemaFor(table)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BoatraceScanBuilder(table, roots)
}

final class BoatraceScanBuilder(table: String, roots: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private var required: StructType = BoatraceTable.schemaFor(table)
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var limit: Int = Int.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Bound each partition's output: a `limit n` query emits at most n
    * rows per file instead of converting them all (the per-file parse
    * itself stays whole-file — files are ~150 KB and the parser is
    * single-pass). Returning false keeps Spark's own global Limit on
    * top (the per-partition bound is necessary, not sufficient). */
  override def pushLimit(l: Int): Boolean = {
    limit = l
    false
  }

  /** Record レースID prefix predicates for FILE pruning (the race id
    * starts with the ISO date, and each file carries exactly one
    * date — so a prefix predicate selects files at planning time, the
    * connector's equivalent of partition pruning). All filters are
    * returned as residual: Spark re-applies them, so pruning can only
    * skip files that provably contain no matching row. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(BoatraceScan.datePrefixOf(_).isDefined)
    filters // all residual
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan = new BoatraceScan(table, roots, required,
    pushed.flatMap(BoatraceScan.datePrefixOf), limit)
}

object BoatraceScan {
  /** A filter guarantees a date prefix when it constrains レースID to
    * start with one (equality implies the prefix too). Spark
    * backtick-quotes non-ASCII field names in translated v1 filters. */
  private def isRaceId(field: String): Boolean =
    field == "レースID" || field == "`レースID`"

  def datePrefixOf(f: org.apache.spark.sql.sources.Filter): Option[String] = {
    import org.apache.spark.sql.sources._
    f match {
      case StringStartsWith(c, p) if isRaceId(c) => Some(p.take(10))
      case EqualTo(c, v: String) if isRaceId(c) => Some(v.take(10))
      case _ => None
    }
  }
}

final class BoatraceScan(table: String, roots: Seq[String],
    required: StructType, datePrefixes: Array[String],
    limit: Int = Int.MaxValue) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = required

  /** POST-PRUNING size statistics: the planner's broadcast decision
    * sees the 2 files a one-date query reads, not the 62-file corpus
    * — so a pruned boatrace side becomes broadcast-eligible exactly
    * when it really is small. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes = listKeptFiles().map(_.length()).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  override def toBatch: Batch = this
  override def description(): String =
    s"BoatraceScan(table=$table, columns=${required.fieldNames.mkString(",")}" +
      (if (datePrefixes.nonEmpty)
        s", prunedToDates=${datePrefixes.mkString("|")}" else "") +
      (if (limit != Int.MaxValue) s", pushedLimit=$limit" else "") + ")"

  /** Driver-side planning = file listing + date-prefix file pruning.
    * Local-filesystem scope (java.io); a cluster deployment swaps in
    * the Hadoop FileSystem API here and in the reader. Fails fast on
    * an empty or missing root — a connector must never turn a bad
    * path into an empty result (an existing root pruned to zero files
    * by a filter IS a valid empty result). */
  private def listKeptFiles(): Array[java.io.File] = {
    val all: Array[java.io.File] = roots.flatMap { root =>
      val f = new java.io.File(root)
      require(f.exists(), s"boatrace source path does not exist: $root")
      if (f.isFile) Array(f)
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(x => x.isFile && {
          val n = x.getName.toLowerCase
          n.endsWith(".txt") || n.endsWith(".lzh")
        })
    }.toArray
    require(all.nonEmpty,
      s"boatrace source matched no .TXT/.lzh files under: ${roots.mkString(", ")}")
    if (datePrefixes.isEmpty) all
    else all.filter { x =>
      val date = scala.util.Try(
        KbParser.dateFromFileName(x.getName)).toOption
      // keep on ANY prefix match; unparseable names are kept (never
      // prune on uncertainty)
      date.forall(d => datePrefixes.exists(p => d.startsWith(p.take(10))))
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    listKeptFiles().sortBy(_.getName).map(x =>
      BoatraceFilePartition(x.getAbsolutePath): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new BoatraceReaderFactory(table,
      required.fieldNames.map(BoatraceTable.Tables(table).indexOf(_)), limit)
}

final case class BoatraceFilePartition(path: String) extends InputPartition

/** `colIdx`: for each required output column, its ordinal in the full
  * table row (column pruning happens here, per row, before any string
  * materialization). */
final class BoatraceReaderFactory(table: String, colIdx: Array[Int],
    limit: Int = Int.MaxValue) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val path = p.asInstanceOf[BoatraceFilePartition].path
    new PartitionReader[InternalRow] {
      private var emitted = 0
      private val rows: Iterator[Seq[String]] = {
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
        val entries =
          if (path.toLowerCase.endsWith(".lzh"))
            Lha.extract(bytes).map(e => e.name -> Lha.normalizeNewlines(e.data))
          else {
            val n = path.substring(path.lastIndexOf('/') + 1)
            Seq(n -> bytes)
          }
        entries.iterator.flatMap { case (name, data) =>
          val t = KbParser.parseBytes(KbParser.dateFromFileName(name), data)
          table match {
            case "result" => t.results.iterator.map(r =>
              Seq(r.raceId, r.rank, r.playerId, r.exhibition))
            case "env" => t.envs.iterator.map(e =>
              Seq(e.raceId, e.weather, e.windDir, e.windSpeed, e.waveHeight, e.venue))
            case "odds" => t.odds.iterator.map(o => o.raceId +: o.values)
            case "schedule" => t.schedules.iterator.map(s =>
              Seq(s.raceId, s.lane, s.playerId, s.name, s.age, s.branch,
                s.weight, s.rank, s.nationalWin, s.nationalTop2, s.localWin,
                s.localTop2, s.motorTop2, s.boatTop2))
          }
        }
      }
      private var current: Seq[String] = _
      override def next(): Boolean = {
        if (emitted < limit && rows.hasNext) {
          current = rows.next(); emitted += 1; true
        } else false
      }
      override def get(): InternalRow = {
        // fresh array per row: Spark does not copy rows out of
        // readers, so a shared buffer would corrupt buffered rows
        val out = new Array[Any](colIdx.length)
        var i = 0
        while (i < colIdx.length) {
          out(i) = UTF8String.fromString(current(colIdx(i)))
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
      }
      override def close(): Unit = ()
    }
  }
}
