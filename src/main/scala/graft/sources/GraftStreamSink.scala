package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.lake.Versioned

/** Streaming writes through the format —
  * `df.writeStream.format("graft").option("checkpointLocation", c)
  * .start(dir)`: every micro-batch is ONE manifest-committed
  * [[Versioned.append]] carrying a `(txnId, batchId)` marker, so a
  * restarted query that replays a batch commits it exactly once (the
  * engine's own exactly-once discipline, now reachable from the
  * standard streaming writer — the library spellings
  * [[graft.streaming.StreamingMerge]] /
  * `StreamingLakeIngest` remain for merge-shaped sinks).
  *
  * The txn id defaults to the query's checkpoint location (stable
  * across restarts by construction — it IS the query's identity);
  * `option("txnId", ...)` overrides for multi-sink layouts. Partition
  * keys come from `partitionBy(...)` on the writer, the
  * `partitionKeys` option, or the lake's declared spec/layout; a
  * FRESH directory requires one of the first two — its v0 is the
  * empty table, so even the first data batch commits (and replays)
  * through the one marked append path. Append output mode only —
  * updates are merges, which a `foreachBatch` +
  * [[Versioned.mergeInto]] (or `StreamingMerge`) expresses with the
  * same txn discipline. */
private[sources] class GraftStreamSink(sqlContext: SQLContext,
    dir: String, keysOpt: Option[Seq[String]], txnId: String) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    // the sink's DataFrame rides the streaming incremental execution —
    // planning NEW jobs over it (append's constraint/tombstone/write
    // passes) would re-analyze it as streaming and refuse. Detach it
    // the way file-format sinks do: take the already-planned physical
    // rows and re-wrap them as a plain batch frame. The wrap is the
    // INTERNAL-row spelling (zero per-row conversion — append's jobs
    // run straight off the planned UnsafeRows; the prior Row round-trip
    // paid a Catalyst→Scala→Catalyst copy per row per batch)
    val batch = org.apache.spark.sql.GraftColumnBridge.internalDataFrame(
      spark, data.queryExecution.toRdd, data.schema)
    if (batch.isEmpty) return // nothing to commit, nothing to dedup
    if (Versioned.currentVersion(spark, dir) < 0) {
      require(keysOpt.nonEmpty,
        "streaming into a fresh graft lake needs partitionBy(...) or " +
          ".option(\"partitionKeys\", \"k1,k2\")")
      Versioned.init(spark, dir) // v0 = the empty table
    }
    val keys = keysOpt.getOrElse(Versioned.layoutPartitionKeys(spark, dir))
    Versioned.append(spark, dir, batch, keys, txn = Some((txnId, batchId)))
    ()
  }
}
