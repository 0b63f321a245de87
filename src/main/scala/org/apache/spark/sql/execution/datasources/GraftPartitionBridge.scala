package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.StructType

/** Forwarder for `PartitioningUtils.parsePartitions`, which is
  * `private[datasources]`. The graft data source's manifest-driven
  * [[FileIndex]] must parse Hive-style `k=v` partition directories
  * with EXACTLY Spark's own unescaping and type-inference semantics —
  * a re-implementation that diverged on one edge (escaped chars,
  * `__HIVE_DEFAULT_PARTITION__` nulls, numeric vs string inference)
  * would make `spark.read.format("graft")` disagree with the
  * `basePath` reads the rest of the engine uses. Same single-purpose
  * bridge pattern as [[org.apache.spark.sql.GraftColumnBridge]];
  * nothing else lives in this package.
  */
object GraftPartitionBridge {
  /** Parse the partition values of `leafDirs` (the directories that
    * directly hold data files) against `basePaths` (the table roots),
    * with type inference on — the configuration `spark.read`'s own
    * file index uses by default. */
  def parsePartitions(leafDirs: Seq[Path], basePaths: Set[Path],
      timeZoneId: String): PartitionSpec =
    // positional: (paths, typeInference, basePaths, userSpecifiedSchema,
    // caseSensitive, validatePartitionColumns, timeZoneId, useIsoFormat)
    PartitioningUtils.parsePartitions(leafDirs, true, basePaths, None,
      false, false, timeZoneId, false)
}
