package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** [[ParquetFileFormat]] under COLUMN MAPPING: the data files carry
  * PHYSICAL column names forever (the manifest's field-ID discipline —
  * rename/drop are metadata-only), while the relation exposes LOGICAL
  * names. This format translates at the exact seam where names meet
  * bytes — the required schema and the pushed filters are re-spelled
  * physical before Spark's own reader builds — so a mapped table keeps
  * the ENTIRE vectorized pipe: ColumnarBatch reads, whole-stage
  * codegen, parquet row-group/dictionary pushdown. Nothing above the
  * reader changes: batches and rows are positional, so the logical-
  * named plan consumes the physical-named read without a conversion.
  * (Before this, any mapped read dropped to the row-based snapshot
  * relation — correct, but paying per-row conversion in the steady
  * state of a renamed table. Delta solves it the same way: name
  * mapping applied inside the parquet reader.)
  *
  * Filters that don't parse into the known shapes are simply NOT
  * pushed — Spark re-applies every data filter exactly above the scan,
  * so pushdown here is strictly an optimization. */
private[sources] class GraftMappedParquetFileFormat(
    logToPhys: Map[String, String]) extends ParquetFileFormat {

  private def phys(name: String): String = logToPhys.getOrElse(name, name)

  private def physField(f: org.apache.spark.sql.types.StructField) =
    f.copy(name = phys(f.name))

  /** Re-spell a pushed filter's attribute names physical; None when the
    * shape is unknown (dropped from pushdown, re-checked above).
    * Test-visible: the spec pins the translation directly — the plan's
    * displayed PushedFilters are the pre-translation logical names by
    * design (that is the user-facing schema). */
  private[sources] def physFilter(f: Filter): Option[Filter] = f match {
    case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
    case sources.EqualNullSafe(a, v) => Some(sources.EqualNullSafe(phys(a), v))
    case sources.GreaterThan(a, v) => Some(sources.GreaterThan(phys(a), v))
    case sources.GreaterThanOrEqual(a, v) =>
      Some(sources.GreaterThanOrEqual(phys(a), v))
    case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
    case sources.LessThanOrEqual(a, v) =>
      Some(sources.LessThanOrEqual(phys(a), v))
    case sources.In(a, vs) => Some(sources.In(phys(a), vs))
    case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
    case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
    case sources.StringStartsWith(a, p) =>
      Some(sources.StringStartsWith(phys(a), p))
    case sources.StringEndsWith(a, p) =>
      Some(sources.StringEndsWith(phys(a), p))
    case sources.StringContains(a, p) =>
      Some(sources.StringContains(phys(a), p))
    case sources.And(l, r) =>
      for (lt <- physFilter(l); rt <- physFilter(r)) yield sources.And(lt, rt)
    case sources.Or(l, r) =>
      for (lt <- physFilter(l); rt <- physFilter(r)) yield sources.Or(lt, rt)
    case sources.Not(c) => physFilter(c).map(sources.Not)
    case sources.AlwaysTrue() => Some(f)
    case sources.AlwaysFalse() => Some(f)
    case _ => None
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(sparkSession,
      StructType(dataSchema.map(physField)), partitionSchema,
      StructType(requiredSchema.map(physField)),
      filters.flatMap(physFilter), options, hadoopConf)

  override def toString: String = "GraftMappedParquet"
}
