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

  test("clusteringCoefficients: K4 vertices at 1.0, pendant at 0, bridge diluted") {
    val s = spark
    import s.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val df = (k4 ++ Seq((4L, 5L))).toDF("a", "b")
    val out = Graphs.clusteringCoefficients(df, "a", "b")
      .collect()
      .map(r => r.getAs[Long]("n") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("triangles"), r.getAs[Double]("coeff")))
      .toMap
    // vertices 1-3: degree 3, in 3 triangles each -> coeff 2*3/(3*2) = 1
    Seq(1L, 2L, 3L).foreach(v => assert(out(v) == ((3L, 3L, 1.0)), s"v$v"))
    // vertex 4 gains the pendant edge: degree 4, still 3 triangles -> 0.5
    assert(out(4L) == ((4L, 3L, 0.5)))
    // the pendant has degree 1: coeff 0 by convention
    assert(out(5L) == ((1L, 0L, 0.0)))
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
