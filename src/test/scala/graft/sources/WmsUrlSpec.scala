package graft.sources

import graft.core.{TileKey, Tiles}
import org.scalatest.funsuite.AnyFunSuite

class WmsUrlSpec extends AnyFunSuite {

  private val t = TileKey(13, 3083, 4633)

  test("WMS 1.1.1 with EPSG:3857 keeps x,y order in mercator meters") {
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:3857&bbox={bbox}", t.z, t.x, t.y)
    val bbox = url.split("bbox=")(1).split(",").map(_.toDouble)
    val m = Tiles.tileBounds3857(t)
    assert(math.abs(bbox(0) - m.west) < 1e-6)
    assert(math.abs(bbox(1) - m.south) < 1e-6)
    assert(math.abs(bbox(2) - m.east) < 1e-6)
    assert(math.abs(bbox(3) - m.north) < 1e-6)
  }

  test("WMS 1.3.0 reads crs= and flips axis order (utils.py:87-89)") {
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.3.0&crs=EPSG:4326&bbox={bbox}", t.z, t.x, t.y)
    val bbox = url.split("bbox=")(1).split(",").map(_.toDouble)
    val b = Tiles.tileBounds(t)
    // 1.3.0: [ymin, xmin, ymax, xmax]
    assert(math.abs(bbox(0) - b.south) < 1e-9)
    assert(math.abs(bbox(1) - b.west) < 1e-9)
    assert(math.abs(bbox(2) - b.north) < 1e-9)
    assert(math.abs(bbox(3) - b.east) < 1e-9)
  }

  test("WMS 1.1.1 with EPSG:4326 uses lon/lat in x,y order") {
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:4326&bbox={bbox}", t.z, t.x, t.y)
    val bbox = url.split("bbox=")(1).split(",").map(_.toDouble)
    val b = Tiles.tileBounds(t)
    assert(math.abs(bbox(0) - b.west) < 1e-9)
    assert(math.abs(bbox(1) - b.south) < 1e-9)
  }

  test("WMS with a UTM SRS projects through the transverse-Mercator path") {
    // Rio tile (~ -44.47W, -23S) falls in UTM zone 23 south (EPSG:32723)
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:32723&bbox={bbox}", t.z, t.x, t.y)
    val bbox = url.split("bbox=")(1).split(",").map(_.toDouble)
    val b = Tiles.tileBounds(t)
    val proj = graft.core.Proj.forward("epsg:32723").get
    val (xmin, ymin, xmax, ymax) =
      graft.core.Proj.transformBounds(proj, b.west, b.south, b.east, b.north)
    assert(bbox.toSeq == Seq(xmin, ymin, xmax, ymax))
    // sane UTM magnitudes: easting within the zone, southern false northing
    assert(xmin > 100000 && xmax < 900000)
    assert(ymin > 7000000 && ymax < 8000000)
  }

  test("unsupported WMS SRS fails loudly at URL construction") {
    val e = intercept[java.io.IOException] {
      TileSources.wmsUrl("http://w/wms?version=1.1.1&srs=EPSG:27572&bbox={bbox}", t.z, t.x, t.y)
    }
    assert(e.getMessage.contains("27572"))
  }

  test("Lambert-93 (EPSG:2154) WMS bbox: projected metres in the French grid's range") {
    // a tile over France
    val (fx, fy) = graft.core.Tiles.lonLatToTile(2.35, 48.85, 13)
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:2154&bbox={bbox}", 13, fx.toInt, fy.toInt)
    val bbox = url.split("bbox=")(1).split("&")(0).split(",").map(_.toDouble)
    assert(bbox(0) > 500000 && bbox(2) < 900000, bbox.mkString(",")) // easting range
    assert(bbox(1) > 6700000 && bbox(3) < 7000000, bbox.mkString(",")) // northing range
    assert(bbox(0) < bbox(2) && bbox(1) < bbox(3))
  }

  test("British National Grid (EPSG:27700) WMS bbox: datum-shifted OSGB eastings/northings") {
    // a tile over central London
    val (lx, ly) = graft.core.Tiles.lonLatToTile(-0.1276, 51.5074, 13)
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:27700&bbox={bbox}", 13, lx.toInt, ly.toInt)
    val bbox = url.split("bbox=")(1).split("&")(0).split(",").map(_.toDouble)
    // London sits near E 530000 N 180000 on the national grid
    assert(bbox(0) > 500000 && bbox(2) < 560000, bbox.mkString(","))
    assert(bbox(1) > 160000 && bbox(3) < 200000, bbox.mkString(","))
    assert(bbox(0) < bbox(2) && bbox(1) < bbox(3))
  }

  test("polar stereographic (EPSG:3413) WMS bbox for an Arctic tile") {
    // a tile over northern Greenland (~ -40W, 80N)
    val (gx, gy) = graft.core.Tiles.lonLatToTile(-40.0, 80.0, 8)
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.3.0&crs=EPSG:3413&bbox={bbox}", 8, gx.toInt, gy.toInt)
    val bbox = url.split("bbox=")(1).split("&")(0).split(",").map(_.toDouble)
    // 1.3.0 swaps unconditionally (reference parity, utils.py:87-89):
    // [ymin, xmin, ymax, xmax]
    assert(bbox(0) < bbox(2) && bbox(1) < bbox(3))
    // near the -45° central meridian at 80N: y ~ -1.1e6, x small
    assert(bbox(0) > -1300000 && bbox(2) < -900000, bbox.mkString(","))
    assert(math.abs(bbox(1)) < 500000, bbox.mkString(","))
  }

  test("NZTM (EPSG:2193) WMS bbox over Wellington") {
    val (wx, wy) = graft.core.Tiles.lonLatToTile(174.7762, -41.2865, 12)
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:2193&bbox={bbox}", 12, wx.toInt, wy.toInt)
    val bbox = url.split("bbox=")(1).split("&")(0).split(",").map(_.toDouble)
    assert(bbox(0) > 1700000 && bbox(2) < 1800000, bbox.mkString(","))
    assert(bbox(1) > 5400000 && bbox(3) < 5460000, bbox.mkString(","))
    assert(bbox(0) < bbox(2) && bbox(1) < bbox(3))
  }

  test("ETRS89-LAEA Europe (EPSG:3035) WMS bbox over Berlin") {
    val (bx, by) = graft.core.Tiles.lonLatToTile(13.40, 52.52, 12)
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:3035&bbox={bbox}", 12, bx.toInt, by.toInt)
    val bbox = url.split("bbox=")(1).split("&")(0).split(",").map(_.toDouble)
    // Berlin sits ~230 km east and ~58 km north of the grid origin
    // (10E 52N -> FE 4321000, FN 3210000)
    assert(bbox(0) > 4450000 && bbox(2) < 4650000, bbox.mkString(","))
    assert(bbox(1) > 3180000 && bbox(3) < 3350000, bbox.mkString(","))
    assert(bbox(0) < bbox(2) && bbox(1) < bbox(3))
  }

  test("RSO Peninsular Malaysia (EPSG:3375) WMS bbox over Kuala Lumpur") {
    val (kx, ky) = graft.core.Tiles.lonLatToTile(101.69, 3.14, 12)
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:3375&bbox={bbox}", 12, kx.toInt, ky.toInt)
    val bbox = url.split("bbox=")(1).split("&")(0).split(",").map(_.toDouble)
    // KL sits west of the projection centre (102.25E, FE 804671) and
    // south of it (latC 4N, FN 0) on the skewed grid
    assert(bbox(0) > 500000 && bbox(2) < 1100000, bbox.mkString(","))
    assert(bbox(1) > -500000 && bbox(3) < 500000, bbox.mkString(","))
    assert(bbox(0) < bbox(2) && bbox(1) < bbox(3))
  }

  test("ETRS89 UTM 32N (EPSG:25832) WMS bbox over Germany") {
    val (dx, dy) = graft.core.Tiles.lonLatToTile(9.99, 53.55, 12) // Hamburg
    val url = TileSources.wmsUrl(
      "http://w/wms?version=1.1.1&srs=EPSG:25832&bbox={bbox}", 12, dx.toInt, dy.toInt)
    val bbox = url.split("bbox=")(1).split("&")(0).split(",").map(_.toDouble)
    assert(bbox(0) > 500000 && bbox(2) < 650000, bbox.mkString(","))
    assert(bbox(1) > 5800000 && bbox(3) < 6050000, bbox.mkString(","))
  }

  test("ACCESS_TOKEN placeholder survives when env var unset (SafeDict parity)") {
    val filled = TileSources.fillUrl("http://x/{z}/{x}/{y}?t={ACCESS_TOKEN}", 1, 2, 3)
    assert(filled == "http://x/1/2/3?t={ACCESS_TOKEN}" ||
      sys.env.contains("ACCESS_TOKEN"))
  }
}
