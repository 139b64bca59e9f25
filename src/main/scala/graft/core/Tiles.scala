package graft.core

/** Web-Mercator XYZ tile math (pure Scala, no Spark).
  *
  * Reproduces the slippy-map formulas used by the reference through the
  * public `mercantile` library (`/root/reference/label_maker_dask/main.py:89`
  * `tiles(*self.bounds, [self.zoom])`). Formulas are the standard public
  * OSM/Web-Mercator equations:
  *   x = floor((lon + 180) / 360 * 2^z)
  *   y = floor((1 - asinh(tan(lat)) / pi) / 2 * 2^z)
  */
final case class TileKey(z: Int, x: Int, y: Int)

/** Lon/lat bounding box [west, south, east, north] (WGS84), matching the
  * reference's `bounds` list (`main.py:72`). */
final case class BBox(west: Double, south: Double, east: Double, north: Double)

object Tiles {
  private val MaxLat = 85.051128779806604 // atan(sinh(pi)) in degrees

  /** lon/lat -> fractional tile coords at zoom z. */
  def lonLatToTile(lon: Double, lat: Double, z: Int): (Double, Double) = {
    val latC = math.max(-MaxLat, math.min(MaxLat, lat))
    val n = (1L << z).toDouble
    val x = (lon + 180.0) / 360.0 * n
    val latRad = math.toRadians(latC)
    val y = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n
    (x, y)
  }

  /** Tile upper-left corner -> lon/lat. */
  def tileToLonLat(x: Double, y: Double, z: Int): (Double, Double) = {
    val n = (1L << z).toDouble
    val lon = x / n * 360.0 - 180.0
    val lat = math.toDegrees(math.atan(math.sinh(math.Pi * (1.0 - 2.0 * y / n))))
    (lon, lat)
  }

  /** Lon/lat bounds of one tile: (west, south, east, north). */
  def tileBounds(t: TileKey): BBox = {
    val (w, n) = tileToLonLat(t.x.toDouble, t.y.toDouble, t.z)
    val (e, s) = tileToLonLat(t.x + 1.0, t.y + 1.0, t.z)
    BBox(w, s, e, n)
  }

  /** Web-Mercator (EPSG:3857) bounds of one tile, for WMS bbox requests
    * (`utils.py:81-84` transform_bounds to the WMS SRS). */
  def tileBounds3857(t: TileKey): BBox = {
    val origin = 20037508.342789244
    val size = 2 * origin / (1L << t.z).toDouble
    BBox(
      west = -origin + t.x * size,
      south = origin - (t.y + 1) * size,
      east = -origin + (t.x + 1) * size,
      north = origin - t.y * size
    )
  }

  def lonLatTo3857(lon: Double, lat: Double): (Double, Double) = {
    val r = 6378137.0
    val x = math.toRadians(lon) * r
    val y = math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)) * r
    (x, y)
  }

  /** Single lon/lat -> integer tile, replicating the public `mercantile.tile`
    * algorithm (normalized web-mercator x/y in [0,1], floor with a 1e-14
    * epsilon so points within float error of a tile's right edge land in the
    * next tile, edge clamping at the antimeridian/poles). */
  def tileIndex(lon: Double, lat: Double, z: Int): (Int, Int) = {
    val eps = 1e-14
    val z2 = math.pow(2.0, z)
    val xn = lon / 360.0 + 0.5
    val sinLat = math.sin(math.toRadians(lat))
    val yn = 0.5 - 0.25 * math.log((1.0 + sinLat) / (1.0 - sinLat)) / math.Pi
    val xt =
      if (xn <= 0) 0
      else if (xn >= 1) (z2 - 1).toInt
      else math.floor((xn + eps) * z2).toInt
    val yt =
      if (yn <= 0) 0
      else if (yn >= 1) (z2 - 1).toInt
      else math.floor((yn + eps) * z2).toInt
    (xt, yt)
  }

  /** Integer tile index range [xmin..xmax] x [ymin..ymax] covering a bbox at
    * zoom z — the same keyspace `mercantile.tiles` yields (used by the
    * reference at `main.py:89`): upper-left tile of the NW corner through the
    * tile of the SE corner inset by LL_EPSILON=1e-11, so a bbox ending
    * exactly on a tile boundary does not include the next tile. */
  def tileRange(b: BBox, z: Int): (Int, Int, Int, Int) = {
    val llEps = 1e-11
    val w = math.max(-180.0, b.west)
    val s = math.max(-MaxLat, b.south)
    val e = math.min(180.0, b.east)
    val n = math.min(MaxLat, b.north)
    val (x0, y0) = tileIndex(w, n, z)
    val (x1, y1) = tileIndex(e - llEps, s + llEps, z)
    (x0, x1, y0, y1)
  }

  /** Number of tiles covering bbox at zoom (closed form; `n_tiles`
    * equivalent, `main.py:101-107`, without materializing the list). */
  def tileCount(b: BBox, z: Int): Long = {
    val (x0, x1, y0, y1) = tileRange(b, z)
    (x1 - x0 + 1).toLong * (y1 - y0 + 1).toLong
  }

  /** Local iterator over the keyspace (tests / driver-side use; the
    * distributed form lives in TileEnumeration). */
  def enumerate(b: BBox, z: Int): Iterator[TileKey] = {
    val (x0, x1, y0, y1) = tileRange(b, z)
    for {
      y <- Iterator.range(y0, y1 + 1)
      x <- Iterator.range(x0, x1 + 1)
    } yield TileKey(z, x, y)
  }
}
