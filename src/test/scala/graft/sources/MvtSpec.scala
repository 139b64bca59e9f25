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

  test("randomized round-trip fuzz: 200 random feature sets survive encode/decode") {
    val rnd = new scala.util.Random(20260812L)
    def randCoord() = (rnd.nextLong(4097), rnd.nextLong(4097))
    def randProps() = (0 until rnd.nextInt(4))
      .map(i => s"k$i" -> (rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString)).toMap
    for (trial <- 0 until 200) {
      val feats = (0 until rnd.nextInt(5) + 1).map { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            EncFeature("Point", (0 until rnd.nextInt(3) + 1).map(_ => Seq(randCoord())),
              randProps(), if (rnd.nextBoolean()) Some(rnd.nextLong(1L << 40)) else None)
          case 1 =>
            EncFeature("LineString",
              (0 until rnd.nextInt(2) + 1).map(_ => (0 until rnd.nextInt(6) + 2).map(_ => randCoord())),
              randProps())
          case _ => // ring with >= 3 distinct-ish points; encoder closes it
            EncFeature("Polygon",
              Seq((0 until rnd.nextInt(4) + 3).map(i => (100L * i + rnd.nextLong(50), 70L * i + rnd.nextLong(50)))),
              randProps())
        }
      }
      val decoded = decode(encode(feats))("osm")
      assert(decoded.length == feats.length, s"trial $trial: feature count")
      feats.zip(decoded).foreach { case (e, d) =>
        assert(d.geomType == e.geomType || (e.parts.length > 1 && d.multi), s"trial $trial: type")
        assert(d.props == e.props.map { case (k, v) => k -> v.toString }, s"trial $trial: props")
        assert(d.id == e.id, s"trial $trial: id")
        // coordinates survive exactly (polygons may gain the closing point)
        e.parts.zip(d.parts).foreach { case (ep, dp) =>
          val dpTrim = if (e.geomType == "Polygon" && dp.length == ep.length + 1 &&
            dp.last == dp.head) dp.toSeq.dropRight(1) else dp.toSeq
          assert(dpTrim.map(c => (c._1.toLong, c._2.toLong)) == ep,
            s"trial $trial: coords $ep vs ${dp.toSeq}")
        }
      }
    }
  }
}
