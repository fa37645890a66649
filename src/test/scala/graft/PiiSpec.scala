package graft

import org.apache.spark.sql.functions._
import graft.ext.Pii

class PiiSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  test("redaction replaces each class with its token, email first") {
    val rows = Seq(
      ("write a.b@example.com or 555-1234 from 192.168.1.1 end", 1, 1, 1),
      ("no contact information here", 0, 0, 0),
      // a phone-shaped local part: the pre-redaction COUNT sees both
      // classes ('@' is a word boundary), but redaction consumes the
      // whole span as EMAIL first — the ordering case the scaladoc
      // documents
      ("reach 555-9876@mail.example.com now", 1, 1, 0),
      ("two user@x.org and admin@y.net plus 10.0.0.1", 2, 0, 1))
    val df = rows.toDF("s", "e", "p", "i")
    val (ne, np, ni) = Pii.piiCounts(col("s"))
    val got = df.select(col("s"), ne, np, ni,
      Pii.redactPii(col("s"))).collect()
    got.zip(rows).foreach { case (r, (_, e, p, i)) =>
      assert(r.getInt(1) == e && r.getInt(2) == p && r.getInt(3) == i,
        s"counts for '${r.getString(0)}': ${r.toSeq}")
    }
    assert(got(0).getString(4) == "write <EMAIL> or <PHONE> from <IP> end")
    assert(got(1).getString(4) == "no contact information here")
    assert(got(2).getString(4) == "reach <EMAIL> now")
    assert(got(3).getString(4) == "two <EMAIL> and <EMAIL> plus <IP>")
  }

  test("redacted corpus carries zero residual matches of any class") {
    val red = Pii.piiRedact(spark, sf)
    val residual = red.select(
      sum(regexp_count(col("redacted"), lit(Pii.EmailPat))).as("e"),
      sum(regexp_count(col("redacted"), lit(Pii.PhonePat))).as("p"),
      sum(regexp_count(col("redacted"), lit(Pii.Ipv4Pat))).as("i"))
      .collect().head
    assert(residual.getLong(0) == 0L && residual.getLong(1) == 0L
      && residual.getLong(2) == 0L, residual.toSeq.toString)
  }

  test("fixture counts match an independent java.util.regex replay") {
    val e = Pii.EmailPat.r
    val p = Pii.PhonePat.r
    val i = Pii.Ipv4Pat.r
    val got = Pii.piiRedact(spark, sf).collect()
    assert(got.length > 0)
    // recompute the fixture footer locally from doc_id alone
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { r =>
      val id = r.getLong(0)
      val raw = new StringBuilder(texts(id))
      if (id % 3 != 0) raw ++= s" contact user$id@example.org"
      if (id % 7 == 0) raw ++= s" cc alt$id@mail.example.com"
      if (id % 2 == 0) raw ++= f" call 555-${id * 7919 % 10000}%04d"
      if (id % 5 != 0)
        raw ++= s" from 10.${id * 13 % 256}.${id * 29 % 256}.${id % 256}"
      val s = raw.toString
      assert(r.getInt(2) == e.findAllIn(s).size, s"email count doc $id")
      assert(r.getInt(3) == p.findAllIn(s).size, s"phone count doc $id")
      assert(r.getInt(4) == i.findAllIn(s).size, s"ip count doc $id")
    }
  }

  test("summary equals the per-document counts aggregated by source") {
    val perDoc = Pii.piiRedact(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("n_email") + col("n_phone") + col("n_ip") > 0, 1L)
          .otherwise(0L)).as("docs_with_pii"),
        sum(col("n_email").cast("long")).as("emails"),
        sum(col("n_phone").cast("long")).as("phones"),
        sum(col("n_ip").cast("long")).as("ips"))
      .orderBy("source").collect().toSeq
    val summary = Pii.piiSummary(spark, sf).collect().toSeq
    assert(perDoc == summary)
  }
}
