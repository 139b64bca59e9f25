package graft.operators

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit: every rule class counts its violations; clean data reports zero") {
    val df = Seq(
      (Some(1L), 5.0, "A", "k1"),
      (None, -2.0, "X", "k1"), //  null id, negative, out of set, dup key
      (Some(3L), 0.0, "N", "k2"),
      (Some(4L), 1.0, "A", "k1") // third occurrence of k1
    ).toDF("id", "qty", "flag", "k")
    val out = Quality.audit(df,
        notNull = Seq("id"), nonNegative = Seq("qty"),
        inSet = Map("flag" -> Seq("A", "N", "R")),
        unique = Seq(Seq("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("not_null", "id")) == ((1L, 4L)))
    assert(out(("non_negative", "qty")) == ((1L, 4L)))
    assert(out(("in_set", "flag")) == ((1L, 4L)))
    assert(out(("unique", "k")) == ((2L, 4L))) // k1 x3 -> 2 violations
    // clean table: all zeros
    val clean = Quality.audit(
        Seq((1L, 1.0)).toDF("id", "qty"),
        notNull = Seq("id"), nonNegative = Seq("qty"))
      .collect().map(_.getLong(2)).toSeq
    assert(clean == Seq(0L, 0L))
  }

  test("refIntegrity counts orphan DISTINCT keys") {
    val child = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Quality.refIntegrity(child, "fk", parent, "pk").head()
    assert(r.getString(0) == "ref_integrity")
    assert(r.getLong(2) == 1L) // only key 3 is orphaned (distinct count)
    assert(r.getLong(3) == 3L) // 3 distinct child keys checked
  }
}
