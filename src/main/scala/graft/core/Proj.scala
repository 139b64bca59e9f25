package graft.core

/** Map projections for WMS bbox construction (SURVEY §2.1 S6), from public
  * formulas only:
  *
  *  - EPSG:4326 passthrough, EPSG:3857 spherical web-mercator
  *  - EPSG:3395 ellipsoidal (world) Mercator — Snyder, "Map Projections: A
  *    Working Manual", eq. 7-7
  *  - EPSG:326xx / 327xx UTM zones — ellipsoidal Transverse Mercator via
  *    the Krüger series in the Karney 2011 formulation ("Transverse
  *    Mercator with an accuracy of a few nanometers", §3; 4th-order in the
  *    third flattening n, sub-mm over a UTM zone)
  *  - Lambert Conformal Conic 2SP national grids (EPSG:2154 Lambert-93,
  *    EPSG:3347 Statistics Canada, EPSG:3034 ETRS89 Europe) — EPSG method
  *    9802 / Snyder eq. 15-1..15-11, validated by the standard-parallel
  *    unit-scale property
  *  - Albers Equal-Area (EPSG:5070 NAD83 Conus Albers, the US federal WMS
  *    grid) — EPSG method 9822 / Snyder eq. 14-12..14-13, validated by the
  *    equal-area Jacobian property
  *
  * The reference reprojects tile bounds to ANY WMS CRS through pyproj
  * (`utils.py:81-84`, `transform_bounds(..., densify_pts=21)`);
  * [[transformBounds]] mirrors that contract — each bbox edge is densified
  * with 21 intermediate points before projecting so curved images of the
  * edges are bounded correctly — for the CRS families above, which cover
  * the web-mapping + national-grid WMS servers this pipeline meets.
  * Unknown codes still throw (hard error, reference parity). */
object Proj {
  // WGS84
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F) // first eccentricity squared
  private val E = math.sqrt(E2)

  /** Spherical web mercator (EPSG:3857). */
  def to3857(lon: Double, lat: Double): (Double, Double) = {
    val x = A * math.toRadians(lon)
    val y = A * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
    (x, y)
  }

  /** Ellipsoidal Mercator (EPSG:3395), Snyder eq. 7-7. */
  def to3395(lon: Double, lat: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val x = A * math.toRadians(lon)
    val esin = E * math.sin(phi)
    val y = A * math.log(math.tan(math.Pi / 4 + phi / 2) *
      math.pow((1 - esin) / (1 + esin), E / 2))
    (x, y)
  }

  // Krüger series constants (third flattening n), Karney 2011 §3
  private val N3 = F / (2 - F)
  private val KA = A / (1 + N3) *
    (1 + N3 * N3 / 4 + math.pow(N3, 4) / 64) // rectifying radius A
  private val Alpha = Array(
    N3 / 2 - 2.0 / 3 * N3 * N3 + 5.0 / 16 * math.pow(N3, 3) + 41.0 / 180 * math.pow(N3, 4),
    13.0 / 48 * N3 * N3 - 3.0 / 5 * math.pow(N3, 3) + 557.0 / 1440 * math.pow(N3, 4),
    61.0 / 240 * math.pow(N3, 3) - 103.0 / 140 * math.pow(N3, 4),
    49561.0 / 161280 * math.pow(N3, 4))

  /** Ellipsoidal transverse Mercator forward (k0-scaled, no false
    * offsets): returns (easting-from-central-meridian, northing). */
  private def tmerc(lon0Deg: Double, k0: Double)(lon: Double, lat: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val dlam = math.toRadians(lon - lon0Deg)
    // conformal latitude, Karney eq. (7)-(9)
    val sphi = math.sin(phi)
    val c = 2 * math.sqrt(N3) / (1 + N3)
    val t = math.sinh(atanh(sphi) - c * atanh(c * sphi))
    val xip = math.atan2(t, math.cos(dlam))
    val etap = atanh(math.sin(dlam) / math.sqrt(1 + t * t))
    var xi = xip
    var eta = etap
    var j = 1
    while (j <= 4) {
      xi += Alpha(j - 1) * math.sin(2 * j * xip) * math.cosh(2 * j * etap)
      eta += Alpha(j - 1) * math.cos(2 * j * xip) * math.sinh(2 * j * etap)
      j += 1
    }
    (k0 * KA * eta, k0 * KA * xi)
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  /** UTM (EPSG:326zz north / 327zz south): k0=0.9996, FE=500000,
    * FN=10000000 in the south. */
  def toUtm(zone: Int, north: Boolean)(lon: Double, lat: Double): (Double, Double) = {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone")
    val lon0 = zone * 6 - 183
    val (x, y) = tmerc(lon0, 0.9996)(lon, lat)
    (x + 500000.0, if (north) y else y + 10000000.0)
  }

  /** Lambert Conformal Conic, 2 standard parallels (EPSG method 9802 —
    * public formulas: EPSG Guidance Note 7-2 / Snyder eq. 14-15..15-11).
    * All parameters in degrees/metres. Ellipsoid constants are WGS84;
    * the national grids below are defined on GRS80, whose flattening
    * differs from WGS84 in the 11th digit — sub-mm here. */
  final case class LccParams(lat0: Double, lon0: Double, sp1: Double,
      sp2: Double, fe: Double, fn: Double)

  def toLcc(p: LccParams)(lon: Double, lat: Double): (Double, Double) = {
    def m(phi: Double) =
      math.cos(phi) / math.sqrt(1 - E2 * math.sin(phi) * math.sin(phi))
    def t(phi: Double) = {
      val esin = E * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - esin) / (1 + esin), E / 2)
    }
    val (phi0, phi1, phi2) =
      (math.toRadians(p.lat0), math.toRadians(p.sp1), math.toRadians(p.sp2))
    val n = (math.log(m(phi1)) - math.log(m(phi2))) /
      (math.log(t(phi1)) - math.log(t(phi2)))
    val bigF = m(phi1) / (n * math.pow(t(phi1), n))
    val rho0 = A * bigF * math.pow(t(phi0), n)
    val phi = math.toRadians(lat)
    val rho = A * bigF * math.pow(t(phi), n)
    val theta = n * math.toRadians(lon - p.lon0)
    (p.fe + rho * math.sin(theta), p.fn + rho0 - rho * math.cos(theta))
  }

  /** Published parameters of common LCC national grids (EPSG registry —
    * public data): Lambert-93 (France), Statistics Canada Lambert,
    * ETRS89-extended LCC Europe. */
  private val LccCodes = Map(
    "2154" -> LccParams(46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0),
    "3347" -> LccParams(63.390675, -91.8666666667, 49.0, 77.0, 6200000.0, 3000000.0),
    "3034" -> LccParams(52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0))

  /** Albers Equal-Area conic, 2 standard parallels (EPSG method 9822 —
    * Snyder eq. 14-12/14-13, 3-1/3-2). Same parameter shape as LCC. */
  def toAlbers(p: LccParams)(lon: Double, lat: Double): (Double, Double) = {
    def m(phi: Double) =
      math.cos(phi) / math.sqrt(1 - E2 * math.sin(phi) * math.sin(phi))
    // authalic q (Snyder eq. 3-12)
    def q(phi: Double) = {
      val s = math.sin(phi)
      (1 - E2) * (s / (1 - E2 * s * s) -
        (1 / (2 * E)) * math.log((1 - E * s) / (1 + E * s)))
    }
    val (phi0, phi1, phi2) =
      (math.toRadians(p.lat0), math.toRadians(p.sp1), math.toRadians(p.sp2))
    val n = (m(phi1) * m(phi1) - m(phi2) * m(phi2)) / (q(phi2) - q(phi1))
    val c = m(phi1) * m(phi1) + n * q(phi1)
    def rho(phi: Double) = A * math.sqrt(c - n * q(phi)) / n
    val theta = n * math.toRadians(lon - p.lon0)
    val r = rho(math.toRadians(lat))
    (p.fe + r * math.sin(theta), p.fn + rho(phi0) - r * math.cos(theta))
  }

  /** EPSG:5070 — NAD83 / Conus Albers (the US federal WMS grid). */
  private val AlbersCodes = Map(
    "5070" -> LccParams(23.0, -96.0, 29.5, 45.5, 0.0, 0.0))

  /** Forward projection for an `epsg:NNNN`-style code (case-insensitive),
    * None for unsupported codes. */
  def forward(srs: String): Option[(Double, Double) => (Double, Double)] = {
    val code = srs.toLowerCase.stripPrefix("epsg:")
    code match {
      case "4326" => Some((lon, lat) => (lon, lat))
      case "3857" | "900913" => Some(to3857)
      case "3395" => Some(to3395)
      case c if LccCodes.contains(c) => Some(toLcc(LccCodes(c)))
      case c if AlbersCodes.contains(c) => Some(toAlbers(AlbersCodes(c)))
      case c if c.length == 5 && c.startsWith("326") =>
        c.substring(3).toIntOption.filter(z => z >= 1 && z <= 60)
          .map(z => toUtm(z, north = true))
      case c if c.length == 5 && c.startsWith("327") =>
        c.substring(3).toIntOption.filter(z => z >= 1 && z <= 60)
          .map(z => toUtm(z, north = false))
      case _ => None
    }
  }

  /** rasterio `transform_bounds(..., densify_pts=21)` equivalent: project
    * `densify + 2` points along each bbox edge and take the min/max — the
    * projected image of a straight lat/lon edge is curved in a projected
    * CRS, so corners alone under-cover. */
  def transformBounds(proj: (Double, Double) => (Double, Double),
      west: Double, south: Double, east: Double, north: Double,
      densify: Int = 21): (Double, Double, Double, Double) = {
    require(densify >= 0)
    val n = densify + 1
    val pts = (0 to n).flatMap { i =>
      val fx = west + (east - west) * i / n
      val fy = south + (north - south) * i / n
      Seq((fx, south), (fx, north), (west, fy), (east, fy))
    }
    val projected = pts.map { case (lo, la) => proj(lo, la) }
    (projected.map(_._1).min, projected.map(_._2).min,
      projected.map(_._1).max, projected.map(_._2).max)
  }
}
