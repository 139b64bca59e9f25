package graft.sources

import graft.core.{TileKey, Tiles}
import org.scalatest.funsuite.AnyFunSuite

class CogReaderSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("cog").resolve(name).toString

  /** A COG covering exactly the 3857 bounds of `cover`, at `size` px. */
  private def writeCovering(path: String, cover: TileKey, size: Int,
      deflate: Boolean, withOverview: Boolean = false): Unit = {
    val b = Tiles.tileBounds3857(cover)
    val res = (b.east - b.west) / size
    val levels = Seq(TiffWriter.Level(size, size,
      (x, y) => (x % 256, y % 256, 7))) ++
      (if (withOverview) Seq(TiffWriter.Level(size / 2, size / 2,
        (x, y) => (100, 150, 200))) else Nil)
    TiffWriter.write(path, levels, tileSize = 128,
      originX = b.west, originY = b.north, resX = res, resY = res,
      deflate = deflate)
  }

  test("full-res window read, uncompressed: nearest sampling of the gradient") {
    val cover = TileKey(10, 300, 400)
    val p = tmp("a.tif")
    writeCovering(p, cover, size = 512, deflate = false)
    val (h, w, bands, data) = CogReader.tile(p, cover)
    assert(h == 256 && w == 256 && bands == 3)
    // out pixel (px,py) samples raster (2*px+1, 2*py+1): r=(2px+1)%256
    val px = 10
    val py = 20
    val i = (py * 256 + px) * 3
    assert((data(i) & 0xff) == (2 * px + 1) % 256)
    assert((data(i + 1) & 0xff) == (2 * py + 1) % 256)
    assert((data(i + 2) & 0xff) == 7)
  }

  test("deflate tiles decode identically") {
    val cover = TileKey(10, 300, 400)
    val p1 = tmp("raw.tif")
    val p2 = tmp("zip.tif")
    writeCovering(p1, cover, 512, deflate = false)
    writeCovering(p2, cover, 512, deflate = true)
    val (_, _, _, a) = CogReader.tile(p1, cover)
    val (_, _, _, b) = CogReader.tile(p2, cover)
    assert(a.sameElements(b))
  }

  test("child XYZ tile reads the right quadrant at full resolution") {
    val cover = TileKey(10, 300, 400)
    val p = tmp("c.tif")
    writeCovering(p, cover, 512, deflate = false)
    // NE child: upper-right quadrant of the raster
    val child = TileKey(11, 601, 800)
    val (_, _, _, data) = CogReader.tile(p, child)
    // out pixel (px,py) -> raster ((256 + px) + 0.5ish, py...): rx = 256+px
    val px = 4
    val py = 6
    val i = (py * 256 + px) * 3
    assert((data(i) & 0xff) == (256 + px) % 256)
    assert((data(i + 1) & 0xff) == py % 256)
  }

  test("overview IFD is chosen when the target resolution is coarser") {
    val cover = TileKey(10, 300, 400)
    val p = tmp("ov.tif")
    writeCovering(p, cover, 512, deflate = false, withOverview = true)
    // parent tile: target res = 2x the full-res -> overview (solid color)
    val parent = TileKey(9, 150, 200)
    val (_, _, _, data) = CogReader.tile(p, parent)
    // the quadrant covered by our raster is solid (100,150,200); find one
    // such pixel (cover tile = child of parent at even x, even y -> NW)
    val i = (10 * 256 + 10) * 3
    assert((data(i) & 0xff) == 100 && (data(i + 1) & 0xff) == 150 && (data(i + 2) & 0xff) == 200)
  }

  test("pixels outside the raster pad with zeros") {
    val cover = TileKey(10, 300, 400)
    val p = tmp("pad.tif")
    writeCovering(p, cover, 512, deflate = false)
    val neighbor = TileKey(10, 301, 400) // entirely outside
    val (_, _, _, data) = CogReader.tile(p, neighbor)
    assert(data.forall(_ == 0))
  }

  test("HTTP range reads: 206 slices work, Range-ignoring servers fail loudly") {
    val cover = TileKey(10, 300, 400)
    val p = tmp("http.tif")
    writeCovering(p, cover, 512, deflate = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    @volatile var honorRange = true
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val range = Option(ex.getRequestHeaders.getFirst("Range"))
      if (honorRange && range.isDefined) {
        val Array(a, b) = range.get.stripPrefix("bytes=").split("-").map(_.toLong)
        val hi = math.min(b, bytes.length - 1)
        val body = java.util.Arrays.copyOfRange(bytes, a.toInt, hi.toInt + 1)
        ex.getResponseHeaders.add("Content-Range", s"bytes $a-$hi/${bytes.length}")
        ex.sendResponseHeaders(206, body.length.toLong)
        ex.getResponseBody.write(body)
      } else {
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    try {
      val url = s"http://localhost:${server.getAddress.getPort}/imagery.tif"
      val (_, _, _, viaHttp) = CogReader.tile(url, cover)
      val (_, _, _, viaFile) = CogReader.tile(p, cover)
      assert(viaHttp.sameElements(viaFile))
      // Range-ignoring server: must fail, not corrupt
      honorRange = false
      val url2 = s"http://localhost:${server.getAddress.getPort}/imagery2.tif"
      val e = intercept[java.io.IOException] { CogReader.tile(url2, cover) }
      assert(e.getMessage.contains("206"))
    } finally server.stop(0)
  }

  test("BigTIFF reads identically to classic TIFF") {
    val cover = TileKey(10, 300, 400)
    val p1 = tmp("classic.tif")
    val p2 = tmp("big.tif")
    val b = Tiles.tileBounds3857(cover)
    val res = (b.east - b.west) / 512
    val levels = Seq(TiffWriter.Level(512, 512, (x, y) => (x % 256, y % 256, 7)))
    TiffWriter.write(p1, levels, tileSize = 128, originX = b.west, originY = b.north,
      resX = res, resY = res, deflate = true)
    TiffWriter.write(p2, levels, tileSize = 128, originX = b.west, originY = b.north,
      resX = res, resY = res, deflate = true, bigtiff = true)
    val (_, _, _, classic) = CogReader.tile(p1, cover)
    val (_, _, _, big) = CogReader.tile(p2, cover)
    assert(big.sameElements(classic))
  }

  test("JPEG tiles with shared JPEGTables decode (solid color, lossy-tolerant)") {
    val cover = TileKey(10, 300, 400)
    val b = Tiles.tileBounds3857(cover)
    val res = (b.east - b.west) / 512
    val levels = Seq(TiffWriter.Level(512, 512, (_, _) => (100, 150, 200)))
    for ((shared, name) <- Seq((true, "jt.tif"), (false, "jself.tif"))) {
      val p = tmp(name)
      TiffWriter.write(p, levels, tileSize = 128, originX = b.west, originY = b.north,
        resX = res, resY = res, jpeg = true, jpegSharedTables = shared)
      val (h, w, bands, data) = CogReader.tile(p, cover)
      assert(h == 256 && w == 256 && bands == 3)
      val want = Array(100, 150, 200)
      var i = 0
      while (i < data.length) {
        assert(math.abs((data(i) & 0xff) - want(i % 3)) <= 3,
          s"pixel byte $i = ${data(i) & 0xff}, want ~${want(i % 3)} (shared=$shared)")
        i += 1
      }
    }
  }

  test("striped legacy layout reads identically to tiled") {
    val cover = TileKey(10, 300, 400)
    val p1 = tmp("tiled.tif")
    val p2 = tmp("striped.tif")
    val b = Tiles.tileBounds3857(cover)
    val res = (b.east - b.west) / 512
    val levels = Seq(TiffWriter.Level(512, 512, (x, y) => (x % 256, y % 256, 7)))
    TiffWriter.write(p1, levels, tileSize = 128, originX = b.west, originY = b.north,
      resX = res, resY = res, deflate = true)
    TiffWriter.write(p2, levels, tileSize = 128, originX = b.west, originY = b.north,
      resX = res, resY = res, deflate = true, striped = true)
    val (_, _, _, tiled) = CogReader.tile(p1, cover)
    val (_, _, _, striped) = CogReader.tile(p2, cover)
    assert(striped.sameElements(tiled))
  }

  test("dispatch routes .tif to the COG source") {
    assert(TileSources.dispatch("/data/img.tif") == TileSources.CogSource)
    assert(TileSources.dispatch("https://x/y.TIFF?a=1") == TileSources.CogSource)
    assert(TileSources.dispatch("https://x/{z}/{x}/{y}.png") == TileSources.TmsSource)
    assert(TileSources.dispatch("https://x/wms?bbox={bbox}") == TileSources.WmsSource)
  }
}
