package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  private def pts(rows: Seq[(String, Double, Double)]) =
    df(rows, "g", "x", "y")

  private def run(rows: Seq[(String, Double, Double)]) =
    Skyline.skyline2D(pts(rows), Seq("g"), "x", "y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq.sorted

  private def brute(rows: Seq[(String, Double, Double)]) =
    rows.filter { case (g, x, y) =>
      !rows.exists { case (g2, x2, y2) =>
        g2 == g && x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.sorted

  test("hand case: frontier, interior, and same-x dominance") {
    val rows = Seq(
      ("a", 1.0, 5.0), // frontier
      ("a", 1.0, 3.0), // dominated (same x, lower y)
      ("a", 2.0, 7.0), // frontier
      ("a", 3.0, 6.0), // dominated by (2,7)
      ("a", 4.0, 9.0), // frontier
      ("b", 1.0, 1.0)) // other group: alone, frontier
    assert(run(rows) === brute(rows))
    assert(run(rows).map(t => (t._2, t._3)).filter(_ => true).size === 4)
  }

  test("duplicate points all survive (neither dominates the other)") {
    val rows = Seq(("a", 1.0, 5.0), ("a", 1.0, 5.0), ("a", 2.0, 4.0))
    assert(run(rows) === brute(rows))
    assert(run(rows).count(_ == ("a", 1.0, 5.0)) === 2)
  }

  test("seeded random corpora match the brute-force dominance definition") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val rows = (1 to 60).map(_ => ("g" + rnd.nextInt(2),
        (rnd.nextInt(20) + 1).toDouble, (rnd.nextInt(20) + 1).toDouble))
      assert(run(rows) === brute(rows), s"trial $trial")
    }
  }

  test("ascending staircase: everything on the frontier") {
    // y rises with x → no point is both cheaper and larger than another
    val rows = (1 to 10).map(i => ("a", i.toDouble, i.toDouble))
    assert(run(rows) === brute(rows))
    assert(run(rows).size === 10)
  }
}
