package graft

import graft.governance.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("checks fire on dirty data and pass on clean data") {
    val dirty = Seq(
      (Some(1L), 10.0, "1-URGENT"),
      (Some(1L), -5.0, "9-BOGUS"), // dup key, below range, bad pattern
      (None, 20.0, "2-HIGH"))      // null key
      .toDF("k", "amt", "prio")
    val res = Quality.evaluate(dirty, Seq(
      Quality.NotNull("k"),
      Quality.Unique("k"),
      Quality.InRange("amt", 0.0, 100.0),
      Quality.Matches("prio", "^[1-5]-")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(res("not_null(k)") === ((1L, false)))
    // count - countDistinct: countDistinct ignores NULLs, so the NULL row
    // counts as a violation alongside the duplicate (3 - 1 distinct = 2) —
    // the right semantics for identifier columns
    assert(res("unique(k)")._1 === 2L)
    assert(res("in_range(amt, 0.0, 100.0)") === ((1L, false)))
    assert(res("matches(prio, ^[1-5]-)") === ((1L, false)))

    val clean = Seq((Some(1L), 10.0, "1-URGENT"), (Some(2L), 20.0, "2-HIGH"))
      .toDF("k", "amt", "prio")
    val ok = Quality.evaluate(clean, Seq(
      Quality.NotNull("k"), Quality.Unique("k"),
      Quality.InRange("amt", 0.0, 100.0), Quality.Matches("prio", "^[1-5]-")))
    assert(ok.collect().forall(_.getBoolean(3)))
  }

  test("empty input: zero violations, all checks pass (no NPE)") {
    val empty = Seq.empty[(Option[Long], Double)].toDF("k", "amt")
    val res = Quality.evaluate(empty, Seq(
      Quality.NotNull("k"), Quality.Unique("k"), Quality.InRange("amt", 0.0, 1.0)))
    assert(res.collect().forall(r => r.getLong(1) === 0L && r.getBoolean(3)))
  }

  test("fkCheck counts orphans") {
    val fact = Seq(1L, 2L, 3L).toDF("fk")
    val dim = Seq(1L, 2L).toDF("id")
    val (name, orphans, total, passed) = Quality.fkCheck(fact, dim, "fk", "id")
    assert(name === "fk(fk -> id)" && orphans === 1L && total === 3L && !passed)
  }
}
