package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TilesSpec extends AnyFunSuite {

  // README.md:22-31 job: zoom 13, Rio bbox -> 312 tiles (26 x 12)
  test("README Rio bbox at z13 yields 312 tiles") {
    val b = BBox(-44.4836, -23.0266, -43.4127, -22.5856)
    val (x0, x1, y0, y1) = Tiles.tileRange(b, 13)
    assert(x1 - x0 + 1 == 26, s"x range $x0..$x1")
    assert(y1 - y0 + 1 == 12, s"y range $y0..$y1")
    assert(Tiles.tileCount(b, 13) == 312)
    assert(Tiles.enumerate(b, 13).size == 312)
  }

  // example.ipynb cell cd24a9fc: zoom 15, Lisbon bbox -> 36 tiles (6 x 6)
  test("notebook Lisbon bbox at z15 yields 36 tiles") {
    val b = BBox(-9.179, 38.708, -9.119, 38.754)
    assert(Tiles.tileCount(b, 15) == 36)
  }

  test("world bbox at z0 is the single root tile") {
    assert(Tiles.tileCount(BBox(-180, -85, 180, 85), 0) == 1L)
    assert(Tiles.enumerate(BBox(-180, -85, 180, 85), 0).toList == List(TileKey(0, 0, 0)))
  }

  test("bbox ending exactly on a tile boundary excludes the next tile") {
    // [0,0]..[45,45] at z3: 45 deg = exactly one tile width at z3
    val (x0, x1, _, _) = Tiles.tileRange(BBox(0, 0, 45, 45), 3)
    assert(x0 == 4 && x1 == 4)
  }

  test("tile center round-trip: tileIndex(center(t)) == t (random tiles)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val z = 1 + rnd.nextInt(18)
      val t = TileKey(z, rnd.nextInt(1 << z), rnd.nextInt(1 << z))
      val b = Tiles.tileBounds(t)
      val lon = (b.west + b.east) / 2
      val lat = (b.south + b.north) / 2
      assert(Tiles.tileIndex(lon, lat, t.z) == ((t.x, t.y)), s"tile $t")
    }
  }

  test("enumerate size equals closed-form count on random bboxes") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val z = rnd.nextInt(13)
      val w = -179.0 + rnd.nextDouble() * 357.0
      val s = -80.0 + rnd.nextDouble() * 159.0
      val b = BBox(w, s, w + 0.001 + rnd.nextDouble() * 2.0, s + 0.001 + rnd.nextDouble())
      assert(Tiles.enumerate(b, z).size.toLong == Tiles.tileCount(b, z), s"bbox $b z$z")
    }
  }

  test("web-mercator 3857 tile bounds match lon/lat projection") {
    val t = TileKey(13, 3085, 4648) // a Rio tile
    val b = Tiles.tileBounds(t)
    val m = Tiles.tileBounds3857(t)
    val (wx, ny) = Tiles.lonLatTo3857(b.west, b.north)
    assert(math.abs(wx - m.west) < 1e-6)
    assert(math.abs(ny - m.north) < 1e-6)
  }

  test("quadkey: parent key prefixes every child; matches the Bing reference example") {
    val s = graft.TestSpark.spark
    import s.implicits._
    // learn.microsoft.com Bing tile system worked example:
    // tile (x=3, y=5, z=3) -> quadkey "213"
    val qk = Seq((3, 5)).toDF("x", "y")
      .select(graft.operators.TileEnumeration.quadkey(3, org.apache.spark.sql.functions.col("x"), org.apache.spark.sql.functions.col("y")))
      .head().getString(0)
    assert(qk == "213")
    // child (2x, 2y+1) at z+1 extends the parent's key by one digit
    val child = Seq((6, 11)).toDF("x", "y")
      .select(graft.operators.TileEnumeration.quadkey(4, org.apache.spark.sql.functions.col("x"), org.apache.spark.sql.functions.col("y")))
      .head().getString(0)
    assert(child.startsWith("213"))
  }

  test("parentRollup: interior z11 parents cover 16 z13 children, borders fewer") {
    val s = graft.TestSpark.spark
    val tiles = graft.operators.TileEnumeration.tiles(
      s, BBox(-44.4836, -23.0266, -43.4127, -22.5856), 13)
    val roll = graft.operators.TileEnumeration.parentRollup(tiles, 2)
      .collect().map(_.getAs[Long]("n_children"))
    assert(roll.sum == 312) // every child accounted for exactly once
    assert(roll.max == 16 && roll.min >= 1)
  }
}
