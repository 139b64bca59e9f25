package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {

  test("triangleStats: K4 plus a pendant has 4 triangles; dups/reversals/loops collapse") {
    val s = spark
    import s.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val noisy = (k4 ++ Seq((4L, 5L)) ++ // pendant edge: no new triangle
      k4.map(_.swap) ++ //                every edge also reversed
      Seq((2L, 1L), (3L, 3L))) //         duplicate + self-loop
      .toDF("a", "b")
    val r = Graphs.triangleStats(noisy, "a", "b").head()
    assert(r.getAs[Long]("n_edges") == 7)
    assert(r.getAs[Long]("n_triangles") == 4)
    // oriented wedge count for K4+pendant: every triangle contributes
    // exactly one closed wedge, and wedges >= triangles always
    assert(r.getAs[Long]("n_wedges") >= 4)
  }

  test("triangleStats: triangle-free graph (star + path) counts zero") {
    val s = spark
    import s.implicits._
    val star = (2L to 6L).map(i => (1L, i)) ++ Seq((6L, 7L), (7L, 8L))
    val r = Graphs.triangleStats(star.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n_edges") == 7)
    assert(r.getAs[Long]("n_triangles") == 0)
  }
}
