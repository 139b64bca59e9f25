package graft.operators

import graft.SparkSpec
import graft.model.{ClassSpec, Coord, FeatureRow}

class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  private val classes = ClassSpec.parseJson(
    """[
      |  {"name": "Roads",     "filter": ["has", "highway"]},
      |  {"name": "Buildings", "filter": ["has", "building"]}
      |]""".stripMargin)

  private def square(x0: Double, y0: Double, x1: Double, y1: Double): Seq[Seq[Coord]] =
    Seq(Seq(Coord(x0, y0), Coord(x0, y1), Coord(x1, y1), Coord(x1, y0), Coord(x0, y0)))

  private def at(canvas: Array[Byte], row: Int, colI: Int): Int = canvas(row * 256 + colI).toInt

  test("full-extent building polygon fills pixel centers (0..254 in each axis)") {
    val f = FeatureRow(13, 0, 0, 0, "Polygon", multi = false, square(0, 0, 4096, 4096),
      Map("building" -> "yes"), None)
    val c = Segmentation.labelForTile(Seq(f), classes)
    assert(at(c, 0, 0) == 2 && at(c, 254, 254) == 2 && at(c, 127, 127) == 2)
    // polygon spans 0..255 in pixel coords; centers at 255.5 fall outside
    assert(at(c, 255, 255) == 0 && at(c, 0, 255) == 0 && at(c, 255, 0) == 0)
    assert(c.count(_ == 2) == 255 * 255)
  }

  test("quarter polygon lands in the top-left quadrant (y-flip)") {
    // MVT-local coords y in [2048, 4096] = upper half (bottom-left origin)
    // -> raster rows 0..127 after the flip
    val f = FeatureRow(13, 0, 0, 0, "Polygon", multi = false, square(0, 2048, 2048, 4096),
      Map("building" -> "yes"), None)
    val c = Segmentation.labelForTile(Seq(f), classes)
    // converted: x spans [0,128) -> 128 cols; rows span [0,127) -> 127 rows
    // (ymax maps to row 127, so centers 0.5..126.5 fill rows 0..126)
    assert(at(c, 0, 0) == 2 && at(c, 100, 100) == 2)
    assert(at(c, 0, 200) == 0 && at(c, 200, 0) == 0)
    assert(c.count(_ == 2) == 128 * 127)
  }

  test("paint order: later feature overwrites earlier (rasterio REPLACE)") {
    val a = FeatureRow(13, 0, 0, 0, "Polygon", multi = false, square(0, 0, 4096, 4096),
      Map("highway" -> "x"), None)
    val b = FeatureRow(13, 0, 0, 1, "Polygon", multi = false, square(0, 0, 2048, 2048),
      Map("building" -> "yes"), None)
    val c = Segmentation.labelForTile(Seq(a, b), classes)
    // b paints class 2 over a's class 1 in the lower-left MVT quadrant =
    // bottom-left rows (128..254) after flip
    assert(at(c, 10, 10) == 1) // top rows: only a
    assert(at(c, 200, 60) == 2) // bottom-left: b overwrote
    assert(at(c, 200, 200) == 1) // bottom-right: only a
  }

  test("feature matching both classes is double-converted (reference parity)") {
    // props match Roads AND Buildings; second conversion squashes the
    // geometry to ~0-16 px (reference bug reproduced: label.py:41-43)
    val f = FeatureRow(13, 0, 0, 0, "Polygon", multi = false, square(0, 0, 4096, 4096),
      Map("highway" -> "x", "building" -> "yes"), None)
    val c = Segmentation.labelForTile(Seq(f), classes)
    // first paint: class 1 over 255x255; second conversion squashes the
    // square to x 0..16, and the repeated y-flip sends it to rows 239..255
    assert(at(c, 200, 200) == 1)
    assert(at(c, 250, 5) == 2)
    assert(at(c, 5, 5) == 1)
    assert(c.count(_ == 2) > 0 && c.count(_ == 1) > c.count(_ == 2))
  }

  test("polygon with hole (even-odd)") {
    val outer = square(0, 0, 4096, 4096).head
    // hole must follow its shell with negative signed area (reversed winding)
    val hole = square(1024, 1024, 3072, 3072).head.reverse
    val f = FeatureRow(13, 0, 0, 0, "Polygon", multi = false, Seq(outer, hole),
      Map("building" -> "yes"), None)
    val c = Segmentation.labelForTile(Seq(f), classes)
    assert(at(c, 10, 10) == 2) // in shell
    assert(at(c, 127, 127) == 0) // in hole
    assert(at(c, 250, 250) == 2)
  }

  test("line burns Bresenham cells; point burns one cell") {
    val line = FeatureRow(13, 0, 0, 0, "LineString", multi = false,
      Seq(Seq(Coord(0, 2048), Coord(4096, 2048))), Map("highway" -> "p"), None)
    val pt = FeatureRow(13, 0, 0, 1, "Point", multi = false,
      Seq(Seq(Coord(100, 100))), Map("building" -> "yes"), None)
    val c = Segmentation.labelForTile(Seq(line, pt), classes)
    // horizontal line at row 255-128=127, all columns
    assert((0 to 255).forall(x => at(c, 127, x) == 1))
    assert(c.count(_ == 1) == 256)
    // point at (round(100*255/4096)=6, 255-6=249)
    assert(at(c, 249, 6) == 2)
    assert(c.count(_ == 2) == 1)
  }

  test("geometry outside the clip box is skipped; empty tile is all zeros") {
    val f = FeatureRow(13, 0, 0, 0, "Polygon", multi = false,
      // converts to ~0-255 * but shifted far beyond: coords > 4096*2
      square(8192, 8192, 12288, 12288), Map("building" -> "yes"), None)
    val c = Segmentation.labelForTile(Seq(f), classes)
    assert(c.forall(_ == 0))
    assert(Segmentation.labelForTile(Seq.empty, classes).forall(_ == 0))
  }

  test("distributed operator: empty tiles get zero raster") {
    val tiles = Seq((13, 0, 0), (13, 1, 0)).toDF("z", "x", "y")
    val f = Seq(FeatureRow(13, 0, 0, 0, "Polygon", multi = false, square(0, 0, 4096, 4096),
      Map("building" -> "yes"), None)).toDS()
    val out = Segmentation.segmentation(tiles, f, classes).orderBy("x").collect()
    assert(out(0).getAs[Array[Byte]]("label").count(_ == 2) == 255 * 255)
    assert(out(1).getAs[Array[Byte]]("label").forall(_ == 0))
  }

  test("rasterizer fuzz: painted cells == JTS point-in-polygon at pixel centers (50 random hulls)") {
    // independent oracle for the scanline fill: a cell must be painted iff
    // its CENTER lies inside the polygon (GDAL all_touched=False). Random
    // convex hulls; vertices carry irrational-ish fractional offsets so no
    // pixel center lands exactly on an edge (where tie-break conventions
    // legitimately differ).
    val factory = new org.locationtech.jts.geom.GeometryFactory()
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 0 until 50) {
      val pts = Array.fill(rnd.nextInt(8) + 3)(
        new org.locationtech.jts.geom.Coordinate(
          rnd.nextInt(240) + 5 + 0.137 + rnd.nextInt(3) * 0.211,
          rnd.nextInt(240) + 5 + 0.173 + rnd.nextInt(3) * 0.197))
      val hull = new org.locationtech.jts.algorithm.ConvexHull(pts, factory).getConvexHull
      if (hull.getDimension == 2) { // skip degenerate (collinear) draws
        val shell = hull.asInstanceOf[org.locationtech.jts.geom.Polygon]
          .getExteriorRing.getCoordinates.map(c => Coord(c.x, c.y)).toSeq
        val geo = Segmentation.buildGeometry("Polygon", Seq(shell))
        val canvas = Segmentation.rasterize(Seq((geo, 1)))
        val env = hull.getEnvelopeInternal
        var mismatches = List.empty[(Int, Int)]
        var r = math.max(0, env.getMinY.toInt - 2)
        while (r <= math.min(255, env.getMaxY.toInt + 2)) {
          var c = math.max(0, env.getMinX.toInt - 2)
          while (c <= math.min(255, env.getMaxX.toInt + 2)) {
            val painted = canvas(r * 256 + c) == 1.toByte
            val inside = hull.contains(factory.createPoint(
              new org.locationtech.jts.geom.Coordinate(c + 0.5, r + 0.5)))
            if (painted != inside) mismatches ::= ((c, r))
            c += 1
          }
          r += 1
        }
        assert(mismatches.isEmpty,
          s"trial $trial: ${mismatches.take(5)} disagree (painted vs JTS contains)")
      }
    }
  }
}
