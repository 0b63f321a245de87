package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Priority sampling: sample membership matches a local mirror of the
  * same hash/priority math, exhaustive groups are exact, and the
  * max(w, τ) estimator's subset-sum estimate is in range. */
class PrioritySampleSpec extends SparkSpec {

  test("exhaustive group: every row kept, w_est == w (tau absent)") {
    val d = df((1 to 5).map(i => (s"id$i", i.toDouble, "g")), "id", "w", "grp")
    val out = PrioritySample.sampleByGroup(d, "id", "w", 10, Seq("grp"))
    assert(out.count() === 5)
    assert(out.filter(col("w_est") =!= col("w")).count() === 0)
  }

  test("sample matches a local mirror of the priority order") {
    val rows = (1 to 200).map(i => (s"id$i", 1.0 + (i % 7), "g"))
    val d = df(rows, "id", "w", "grp")
    val k = 20
    val out = PrioritySample.sampleByGroup(d, "id", "w", k, Seq("grp"))
      .orderBy("rn").collect()
    // local mirror: same md5-prefix hash, same w * 2^52 / (h+1)
    def h52(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(13), 16)
    }
    val pri = rows.map { case (id, w, _) =>
      (id, w, w * 4503599627370496.0 / (h52(id) + 1))
    }.sortBy { case (id, _, p) => (-p, id) }
    val expIds = pri.take(k).map(_._1)
    assert(out.map(_.getAs[String]("id")).toSeq === expIds)
    val tau = pri(k)._3
    val expEst = pri.take(k).map { case (_, w, _) => math.max(w, tau) }
    assert(out.map(_.getAs[Double]("w_est")).toSeq === expEst)
  }

  test("estimator: sum of w_est approximates the true total weight") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(i => (s"id$i", 0.5 + rnd.nextDouble() * 9.5, "g"))
    val d = df(rows, "id", "w", "grp")
    val est = PrioritySample.sampleByGroup(d, "id", "w", 400, Seq("grp"))
      .agg(sum("w_est")).collect()(0).getDouble(0)
    val truth = rows.map(_._2).sum
    assert(math.abs(est - truth) / truth < 0.15, s"est $est vs $truth")
  }

  test("global sample equals the grouped sample under a constant group") {
    val rows = (1 to 300).map(i => (s"id$i", 1.0 + (i % 9), "g"))
    val d = df(rows, "id", "w", "grp")
    val global = PrioritySample.sample(d.drop("grp"), "id", "w", 25)
      .orderBy("rn").collect().map(r =>
        (r.getAs[String]("id"), r.getAs[Double]("w_est")))
    val grouped = PrioritySample.sampleByGroup(d, "id", "w", 25, Seq("grp"))
      .orderBy("rn").collect().map(r =>
        (r.getAs[String]("id"), r.getAs[Double]("w_est")))
    assert(global.toSeq === grouped.toSeq)
  }

  test("groups sample independently") {
    val rows = (1 to 50).map(i => (s"id$i", 1.0, s"g${i % 2}"))
    val out = PrioritySample.sampleByGroup(
      df(rows, "id", "w", "grp"), "id", "w", 10, Seq("grp"))
    assert(out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("g0" -> 10L, "g1" -> 10L))
  }
}
