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

  test("ACCESS_TOKEN placeholder survives when env var unset (SafeDict parity)") {
    val filled = TileSources.fillUrl("http://x/{z}/{x}/{y}?t={ACCESS_TOKEN}", 1, 2, 3)
    assert(filled == "http://x/1/2/3?t={ACCESS_TOKEN}" ||
      sys.env.contains("ACCESS_TOKEN"))
  }
}
