package graft.ops

import graft.SparkSpec

/** §2.10 catalog surface details not already pinned by the q45 oracle:
  * key-parse edge cases (`main.py:18-41,122-150`) and the parquet cache
  * that replaces the pickle (`main.py:259-277`). */
class CatalogOpsSpec extends SparkSpec {

  private def keys = df(Seq(
    Tuple1("study/u1/heart_rate/20240115_1030.csv.gz"),        // HHMM time
    Tuple1("study/u1/heart_rate/20240115_103000_2.csv.gz"),    // HHMMSS + shard
    Tuple1("study/u1/heart_rate/schema.json"),                 // sidecar
    Tuple1("study/u1/heart_rate/notes.txt"),                   // unparseable name
    Tuple1("study/u2/steps"),                                  // 3 parts -> drop
    Tuple1("study/u2/steps/extra/20240101_0000.csv.gz")),      // 5 parts -> drop
    "key")

  test("inventoryFromKeys: part-count drop, HHMM/HHMMSS parse, shard idx, classification") {
    val inv = CatalogOps.inventoryFromKeys(keys).orderBy("filename")
    assert(inv.count() == 4) // both wrong-arity keys dropped
    val byName = inv.collect().map(r => r.getAs[String]("filename") -> r).toMap
    assert(byName("20240115_1030.csv.gz").getAs[String]("time") == "1030")
    val sharded = byName("20240115_103000_2.csv.gz")
    assert(sharded.getAs[String]("time") == "103000" && sharded.getAs[Int]("idx") == 2)
    assert(byName("schema.json").getAs[Boolean]("is_schema"))
    val notes = byName("notes.txt")
    assert(!notes.getAs[Boolean]("is_schema") && notes.isNullAt(notes.fieldIndex("date")))
  }

  test("writeCache round-trips the inventory through parquet (pickle replacement)") {
    val out = java.nio.file.Files.createTempDirectory("graft-catalog").toString + "/inv"
    val inv = CatalogOps.inventoryFromKeys(keys)
    CatalogOps.writeCache(inv, out)
    val back = CatalogOps.readCache(spark, out)
    assert(back.columns.sorted.toSeq == inv.columns.sorted.toSeq)
    assert(rowsOf(back.orderBy("filename")) == rowsOf(inv.orderBy("filename")))
  }

  test("stalenessReport: added/removed key counts and the fresh verdict") {
    val live = CatalogOps.inventoryFromKeys(keys) // 4 valid keys
    // cache misses one live key and still holds one retired key
    val cached = CatalogOps.inventoryFromKeys(df(Seq(
      Tuple1("study/u1/heart_rate/20240115_1030.csv.gz"),
      Tuple1("study/u1/heart_rate/schema.json"),
      Tuple1("study/u1/heart_rate/notes.txt"),
      Tuple1("study/u9/gone_metric/20200101_0000.csv.gz")), "key"))
    val r = CatalogOps.stalenessReport(cached, live).collect().head
    assert(r.getAs[Long]("n_cached") === 4L)
    assert(r.getAs[Long]("n_live") === 4L)
    assert(r.getAs[Long]("n_common") === 3L)
    assert(r.getAs[Long]("n_added") === 1L)   // the sharded file, not cached
    assert(r.getAs[Long]("n_removed") === 1L) // the retired key
    assert(!r.getAs[Boolean]("fresh"))

    val same = CatalogOps.stalenessReport(live, live).collect().head
    assert(same.getAs[Boolean]("fresh"))
    assert(same.getAs[Long]("n_added") === 0L &&
      same.getAs[Long]("n_removed") === 0L)
  }
}
