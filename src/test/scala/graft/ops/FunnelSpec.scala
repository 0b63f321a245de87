package graft.ops

import graft.SparkSpec

final case class Ev(user_id: Long, et: String, ts: Long)

class FunnelSpec extends SparkSpec {

  private val events = Seq(
    // user 1: full funnel in order
    Ev(1, "A", 10), Ev(1, "B", 20), Ev(1, "C", 30),
    // user 2: B before A — B must NOT count; funnel stalls at A
    Ev(2, "B", 5), Ev(2, "A", 10),
    // user 3: ties do not advance (B at the same instant as A)
    Ev(3, "A", 10), Ev(3, "B", 10),
    // user 4: multiple candidates — EARLIEST strictly-after wins
    Ev(4, "A", 10), Ev(4, "B", 50), Ev(4, "B", 15), Ev(4, "C", 40),
    // user 5: never does A
    Ev(5, "B", 10), Ev(5, "C", 20))

  private def times = Funnel.stageTimes(
    df(events), "user_id", "ts", "et", Seq("A", "B", "C"))

  test("earliest-strictly-after stage semantics, drop-off as nulls") {
    val byUser = times.collect()
      .map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(byUser(1L) == ((10L, 20L, 30L)))
    assert(byUser(2L) == ((10L, null, null)))  // earlier B ignored
    assert(byUser(3L) == ((10L, null, null)))  // tie is not after
    assert(byUser(4L) == ((10L, 15L, 40L)))    // B@15 beats B@50
    assert(!byUser.contains(5L))               // never entered the funnel
  }

  test("monotone stage counts and strictly increasing times per user") {
    val rows = times.collect()
    val n = Seq(1, 2, 3).map(i => rows.count(_.get(i) != null))
    assert(n == n.sorted.reverse, s"stage counts must not grow: $n")
    rows.foreach { r =>
      val ts = Seq(1, 2, 3).map(r.get).takeWhile(_ != null).map(_.asInstanceOf[Long])
      assert(ts == ts.sorted && ts.distinct == ts, s"non-increasing: $r")
    }
  }
}
