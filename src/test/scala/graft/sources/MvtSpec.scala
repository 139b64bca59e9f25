package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class MvtSpec extends AnyFunSuite {
  import Mvt._

  test("encode/decode round trip: polygon with typed props and id") {
    val square = Seq(Seq((0L, 0L), (0L, 4096L), (4096L, 4096L), (4096L, 0L)))
    val f = EncFeature("Polygon", square,
      Map("building" -> "yes", "height" -> 12, "ratio" -> 2.5, "tall" -> true),
      id = Some(42L))
    val tile = decode(encode(Seq(f)))
    assert(tile.keySet == Set("osm"))
    val Seq(g) = tile("osm")
    assert(g.geomType == "Polygon" && !g.multi)
    assert(g.id.contains(42L))
    assert(g.props == Map("building" -> "yes", "height" -> "12", "ratio" -> "2.5", "tall" -> "true"))
    // ClosePath re-adds the first point; y convention round-trips
    assert(g.parts.length == 1)
    assert(g.parts.head.toSeq == Seq((0.0, 0.0), (0.0, 4096.0), (4096.0, 4096.0), (4096.0, 0.0), (0.0, 0.0)))
  }

  test("line and point round trip") {
    val line = EncFeature("LineString", Seq(Seq((0L, 2048L), (4096L, 2048L))), Map("highway" -> "primary"))
    val pt = EncFeature("Point", Seq(Seq((2048L, 2048L))), Map())
    val tile = decode(encode(Seq(line, pt)))
    val fs = tile("osm")
    assert(fs(0).geomType == "LineString")
    assert(fs(0).parts.head.toSeq == Seq((0.0, 2048.0), (4096.0, 2048.0)))
    assert(fs(1).geomType == "Point")
    assert(fs(1).parts.head.toSeq == Seq((2048.0, 2048.0)))
    assert(fs(1).id.isEmpty)
  }

  test("multi geometries set the multi flag") {
    val mp = EncFeature("Point", Seq(Seq((0L, 0L)), Seq((100L, 100L))), Map())
    val tile = decode(encode(Seq(mp)))
    assert(tile("osm").head.multi)
    assert(tile("osm").head.parts.length == 2)
  }

  test("empty/garbage input decodes to empty map") {
    assert(decode(Array.emptyByteArray).isEmpty)
  }

  test("negative-delta zigzag coords survive") {
    val z = EncFeature("LineString", Seq(Seq((4000L, 4000L), (10L, 20L), (3000L, 1L))), Map())
    val tile = decode(encode(Seq(z)))
    assert(tile("osm").head.parts.head.toSeq == Seq((4000.0, 4000.0), (10.0, 20.0), (3000.0, 1.0)))
  }
}
