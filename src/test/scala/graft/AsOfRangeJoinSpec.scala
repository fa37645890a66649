package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoin, RangeJoin}

class AsOfRangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of backward join picks latest right row ≤ left ts, per key") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3") // before any right row
    ).toDF("k", "lts", "lname")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "c1"),
      (1L, ts("2024-01-01 10:00:00"), "c2"), // exact tie with p1 → wins
      (1L, ts("2024-01-01 11:00:00"), "c3"),
      (2L, ts("2024-01-01 09:30:00"), "c4")
    ).toDF("k", "rts", "rname")
    val out = AsOfJoin.backward(left, right, "k", "lts", "rts")
      .select("lname", "rname").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out === Map("p1" -> "c2", "p2" -> "c3", "p3" -> null))
  }

  test("as-of join carries the matched row atomically (nulls included)") {
    val spark2 = spark
    import spark2.implicits._
    // latest matching right row has val=null: ASOF semantics must
    // return that null, not reach back to the older row's value
    val left = Seq((1L, ts("2024-01-01 10:30:00"), "p")).toDF("k", "lts", "l")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5.0), "a"),
      (1L, ts("2024-01-01 10:00:00"), None: Option[Double], "b")
    ).toDF("k", "rts", "rval", "rtag")
    val row = AsOfJoin.backward(left, right, "k", "lts", "rts")
      .select("rval", "rtag").head
    assert(row.isNullAt(0) && row.getString(1) == "b",
      s"expected the 10:00 row's fields verbatim, got $row")
  }

  test("as-of join refuses colliding column names") {
    val spark2 = spark
    import spark2.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "lts", "shared")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), "y")).toDF("k", "rts", "shared")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "k", "lts", "rts")
    }
  }

  test("bucketed range join equals the naive range filter") {
    val spark2 = spark
    import spark2.implicits._
    val left = (0 until 50)
      .map(i => (i.toLong, ts(f"2024-01-01 10:${i % 60}%02d:30")))
      .toDF("lid", "lts")
    val right = (0 until 80)
      .map(i => (i.toLong + 1000, ts(f"2024-01-01 10:${(i * 7) % 60}%02d:${(i * 13) % 60}%02d")))
      .toDF("rid", "rts")
    val bucketed = RangeJoin.pointsWithin(left, right, "lts", "rts", 300L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right,
        col("rts") >= col("lts") - expr("INTERVAL '300' SECOND")
          && col("rts") <= col("lts"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("range join produces no duplicate pairs") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, ts("2024-01-01 10:05:00"))).toDF("lid", "lts")
    val right = Seq((2L, ts("2024-01-01 10:01:00")),
      (3L, ts("2024-01-01 10:04:59"))).toDF("rid", "rts")
    val out = RangeJoin.pointsWithin(left, right, "lts", "rts", 300L)
    assert(out.count() === out.dropDuplicates("lid", "rid").count())
  }
}
