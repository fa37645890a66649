package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {

  test("metadata byte length equals document n_chars (ascii corpus)") {
    val joined = Multimodal.metadata(spark, sf)
      .join(Tables.documents(spark, sf), Seq("doc_id"))
      .filter(col("byte_len") =!= col("n_chars"))
    assert(joined.count() == 0)
  }

  test("stub decoder is deterministic and total over the corpus") {
    val a = Multimodal.features(spark, sf).collect()
    val b = Multimodal.features(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.length == Tables.documents(spark, sf).count())
    assert(a.forall { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      w >= 64 && w < 1280 && h >= 64 && h < 720
    })
  }
}
