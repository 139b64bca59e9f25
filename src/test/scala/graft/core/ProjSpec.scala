package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The Krüger-series transverse Mercator is validated against two
  * INDEPENDENT public formulations: the meridian-arc integral (numerical
  * quadrature of Snyder eq. 3-21's integrand) for northings on the central
  * meridian, and Redfearn's series (Snyder eq. 8-9) for eastings near it.
  * Agreement of unrelated derivations to sub-mm/cm is strong evidence both
  * are right. */
class ProjSpec extends AnyFunSuite {

  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)

  /** Meridian arc length 0..latDeg by Simpson quadrature (independent of
    * any series used in Proj). */
  private def meridianArc(latDeg: Double): Double = {
    val phi = math.toRadians(latDeg)
    val n = 20000
    val h = phi / n
    def g(t: Double) = a * (1 - e2) / math.pow(1 - e2 * math.sin(t) * math.sin(t), 1.5)
    var s = g(0) + g(phi)
    var i = 1
    while (i < n) { s += (if (i % 2 == 1) 4 else 2) * g(i * h); i += 1 }
    s * h / 3
  }

  test("UTM northing on the central meridian = k0 * meridian arc (independent quadrature)") {
    for (lat <- Seq(0.0, 15.0, 33.3, 45.0, 60.0, 75.0)) {
      val (e, n) = Proj.toUtm(31, north = true)(3.0, lat) // lon0 of zone 31 = 3°
      assert(e == 500000.0, s"central meridian easting at lat $lat")
      val expected = 0.9996 * meridianArc(lat)
      assert(math.abs(n - expected) < 1e-3, s"lat $lat: n=$n expected=$expected")
    }
  }

  test("UTM easting near the central meridian matches Redfearn's series (independent)") {
    // Redfearn/Snyder eq. 8-9 truncated to the Δλ^5 term (~mm at Δλ=1°)
    def redfearnE(lat: Double, dlamDeg: Double): Double = {
      val phi = math.toRadians(lat)
      val dl = math.toRadians(dlamDeg)
      val ep2 = e2 / (1 - e2)
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val t = math.tan(phi)
      val c = ep2 * math.cos(phi) * math.cos(phi)
      val aa = dl * math.cos(phi)
      0.9996 * nu * (aa + (1 - t * t + c) * math.pow(aa, 3) / 6 +
        (5 - 18 * t * t + t * t * t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120) + 500000.0
    }
    for ((lat, dlam) <- Seq((0.0, 1.0), (30.0, 1.5), (52.0, -2.0), (70.0, 0.5))) {
      val (e, _) = Proj.toUtm(31, north = true)(3.0 + dlam, lat)
      val expected = redfearnE(lat, dlam)
      assert(math.abs(e - expected) < 0.02, s"lat $lat dlam $dlam: e=$e expected=$expected")
    }
  }

  test("UTM southern hemisphere adds the 10,000,000 false northing, symmetric with north") {
    val (en, nn) = Proj.toUtm(33, north = true)(16.0, 40.0)
    val (es, ns) = Proj.toUtm(33, north = false)(16.0, -40.0)
    assert(en == es) // east-west symmetric across the equator
    assert(math.abs((10000000.0 - ns) - nn) < 1e-6)
  }

  test("3395 reduces to spherical mercator when e -> 0 behavior: equator equality and ordering") {
    val (x95, y95) = Proj.to3395(10.0, 0.0)
    val (x57, y57) = Proj.to3857(10.0, 0.0)
    assert(x95 == x57)
    assert(math.abs(y95) < 1e-8 && math.abs(y57) < 1e-8)
    // ellipsoidal northing is smaller than spherical at mid latitudes
    assert(Proj.to3395(0, 45)._2 < Proj.to3857(0, 45)._2)
  }

  test("forward: code parsing and unsupported codes") {
    assert(Proj.forward("EPSG:4326").get(12.5, -30.0) == ((12.5, -30.0)))
    assert(Proj.forward("epsg:900913").isDefined)
    assert(Proj.forward("epsg:32601").isDefined && Proj.forward("epsg:32760").isDefined)
    assert(Proj.forward("epsg:32661").isEmpty) // zone 61 does not exist
    assert(Proj.forward("epsg:2154").isDefined) // Lambert-93 LCC
    assert(Proj.forward("epsg:27572").isEmpty) // Lambert zone II: unsupported
  }

  test("LCC: scale factor is 1 on both standard parallels, >1 outside, <1 between") {
    // local scale along a parallel = projected distance / ellipsoidal
    // distance for a small delta-lon step; on the standard parallels of a
    // conformal conic it must be exactly 1
    val p2154 = Proj.LccParams(46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0)
    def scaleAt(lat: Double): Double = {
      val dLon = 1e-4
      val (x1, y1) = Proj.toLcc(p2154)(3.0, lat)
      val (x2, y2) = Proj.toLcc(p2154)(3.0 + dLon, lat)
      val proj = math.hypot(x2 - x1, y2 - y1)
      val phi = math.toRadians(lat)
      val e2 = 0.0066943799901413165 // WGS84 first eccentricity squared
      val nu = 6378137.0 / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val truth = math.toRadians(dLon) * nu * math.cos(phi)
      proj / truth
    }
    assert(math.abs(scaleAt(44.0) - 1) < 1e-9, s"sp1 scale ${scaleAt(44.0)}")
    assert(math.abs(scaleAt(49.0) - 1) < 1e-9, s"sp2 scale ${scaleAt(49.0)}")
    assert(scaleAt(46.5) < 1.0) // between the parallels
    assert(scaleAt(42.0) > 1.0 && scaleAt(51.0) > 1.0) // outside
  }

  test("LCC: Lambert-93 origin maps to the false origin; Paris lands where it should") {
    val f = Proj.forward("EPSG:2154").get
    val (x0, y0) = f(3.0, 46.5)
    assert(math.abs(x0 - 700000.0) < 1e-6 && math.abs(y0 - 6600000.0) < 1e-6)
    // Paris (2.3522 E, 48.8566 N) is ~652 km E / ~6862 km N in Lambert-93
    // (public ballpark; the exact-digit goldens live in pyproj, which this
    // container doesn't have — the standard-parallel scale test above is
    // the precise check)
    val (px, py) = f(2.3522, 48.8566)
    assert(math.abs(px - 652000) < 5000, s"Paris x $px")
    assert(math.abs(py - 6862000) < 5000, s"Paris y $py")
    // central meridian stays at constant easting
    val (cx1, _) = f(3.0, 43.0)
    val (cx2, _) = f(3.0, 50.0)
    assert(math.abs(cx1 - 700000.0) < 1e-6 && math.abs(cx2 - 700000.0) < 1e-6)
  }

  test("Albers 5070: equal-area by construction — projected quad area equals ellipsoid area") {
    // the defining property: the Jacobian of an equal-area projection is 1,
    // so a small lat/lon quad's projected area equals its ellipsoidal area
    // (M * N cos(phi) * dphi * dlam) EVERYWHERE, not just on the parallels
    val f = Proj.forward("EPSG:5070").get
    val e2 = 0.0066943799901413165
    val a = 6378137.0
    for ((lon, lat) <- Seq((-96.0, 23.0), (-120.0, 48.0), (-75.0, 28.0), (-96.0, 45.5))) {
      val d = 1e-4
      val Seq(p00, p10, p01, p11) = Seq(
        (lon, lat), (lon + d, lat), (lon, lat + d), (lon + d, lat + d)).map(Function.tupled(f))
      // shoelace area of the projected quad, centered first: raw
      // coordinates are ~3e6 m while the area is ~100 m², so uncentered
      // x1*y2 products lose 12 digits to cancellation (~1e-6 relative
      // noise, swamping the property being tested)
      val raw = Seq(p00, p10, p11, p01)
      val cx = raw.map(_._1).sum / 4
      val cy = raw.map(_._2).sum / 4
      val quad = raw.map { case (x, y) => (x - cx, y - cy) }
      val proj = math.abs(quad.zip(quad.tail :+ quad.head)
        .map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2)
      val phi = math.toRadians(lat + d / 2)
      val sin2 = math.sin(phi) * math.sin(phi)
      val mRad = a * (1 - e2) / math.pow(1 - e2 * sin2, 1.5) // meridional radius
      val nRad = a / math.sqrt(1 - e2 * sin2) // prime vertical radius
      val truth = mRad * nRad * math.cos(phi) * math.toRadians(d) * math.toRadians(d)
      assert(math.abs(proj / truth - 1) < 1e-6, s"($lon,$lat): ratio ${proj / truth}")
    }
    // projection origin maps to the (zero) false origin
    val (x0, y0) = f(-96.0, 23.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6)
  }

  test("LCC: 3347 and 3034 project finite, in-range coordinates over their domains") {
    for ((code, lon, lat) <- Seq(("EPSG:3347", -75.7, 45.4), ("epsg:3034", 10.0, 52.0))) {
      val (x, y) = Proj.forward(code).get(lon, lat)
      assert(!x.isNaN && !y.isNaN && math.abs(x) < 2e7 && math.abs(y) < 2e7, s"$code -> ($x, $y)")
    }
  }

  test("round-trip: forward∘inverse ≡ id to <1e-9 degrees for every table CRS") {
    // per-CRS sampling domain (lonMin, lonMax, latMin, latMax)
    val domains = Seq(
      "epsg:4326" -> (-180.0, 180.0, -89.0, 89.0),
      "epsg:3857" -> (-179.0, 179.0, -85.0, 85.0),
      "epsg:3395" -> (-179.0, 179.0, -85.0, 85.0),
      "epsg:32631" -> (0.0, 6.0, -80.0, 84.0),
      "epsg:32723" -> (-54.0, -48.0, -80.0, 0.0),
      "epsg:25832" -> (6.0, 12.0, 35.0, 72.0),
      "epsg:2154" -> (-5.0, 10.0, 41.0, 51.0),
      "epsg:3347" -> (-140.0, -50.0, 42.0, 84.0),
      "epsg:3034" -> (-10.0, 35.0, 35.0, 70.0),
      "epsg:5070" -> (-125.0, -66.0, 24.0, 49.0),
      "epsg:27700" -> (-8.0, 2.0, 49.5, 60.8),
      "epsg:3413" -> (-180.0, 180.0, 60.0, 89.9),
      "epsg:3995" -> (-180.0, 180.0, 60.0, 89.9),
      "epsg:3031" -> (-180.0, 180.0, -89.9, -55.0),
      "epsg:3976" -> (-180.0, 180.0, -89.9, -55.0),
      "epsg:2193" -> (166.0, 179.0, -47.5, -34.0),
      "epsg:3375" -> (99.5, 105.0, 1.0, 7.0),
      "epsg:29873" -> (109.5, 119.5, 0.8, 7.5),
      "epsg:3035" -> (-10.0, 35.0, 35.0, 70.0),
      "epsg:2056" -> (6.0, 10.5, 45.8, 47.8),
      "epsg:31466" -> (5.0, 7.5, 49.0, 53.0),
      "epsg:31469" -> (13.5, 15.0, 50.0, 54.5),
      "epsg:5514" -> (12.0, 22.5, 47.7, 51.1),
      "epsg:28407" -> (36.0, 42.0, 42.0, 70.0),
      "epsg:28419" -> (108.0, 114.0, 50.0, 75.0),
      "epsg:6669" -> (128.3, 130.5, 31.0, 35.0),
      "epsg:6677" -> (138.8, 141.0, 34.5, 37.5),
      "epsg:6681" -> (143.0, 146.0, 42.5, 45.5))
    val rnd = new scala.util.Random(42)
    for ((code, (loMin, loMax, laMin, laMax)) <- domains) {
      val fwd = Proj.forward(code).get
      val inv = Proj.inverse(code).get
      for (_ <- 1 to 50) {
        val lon = loMin + rnd.nextDouble() * (loMax - loMin)
        val lat = laMin + rnd.nextDouble() * (laMax - laMin)
        val (x, y) = fwd(lon, lat)
        val (lon2, lat2) = inv(x, y)
        assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
          s"$code ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
      }
    }
  }

  test("Hotine oblique Mercator: EPSG GN7-2 worked example (Timbalai 1948 / RSO Borneo, datum-free kernel)") {
    // EPSG Guidance Note 7-2, method 9815 example: Timbalai 1948 datum
    // coordinates in, metres out — exercises the kernel without the
    // WGS84->Timbalai shift
    val crs = Proj.Crs(
      Proj.Hotine(4.0, 115.0, 53.31582047222222, 53.13010236111111,
        0.99984, 590476.87, 442857.65), Proj.Everest1967)
    val lat = 5 + 23.0 / 60 + 14.1129 / 3600 //  5°23'14.1129"N
    val lon = 115 + 48.0 / 60 + 19.8196 / 3600 // 115°48'19.8196"E
    val (e, n) = crs.forward(lon, lat)
    assert(math.abs(e - 679245.73) < 0.05, s"E $e vs 679245.73")
    assert(math.abs(n - 596562.78) < 0.05, s"N $n vs 596562.78")
    val (lon2, lat2) = crs.inverse(e, n)
    assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
  }

  test("LAEA 3035: EPSG GN7-2 worked example, origin anchor, equal-area Jacobian") {
    // EPSG Guidance Note 7-2, method 9820 example (ETRS89-LAEA Europe):
    // phi=50°N lam=5°E -> E 3962799.45, N 2999718.85
    val f = Proj.forward("EPSG:3035").get
    val (e, n) = f(5.0, 50.0)
    assert(math.abs(e - 3962799.45) < 0.05, s"E $e vs 3962799.45")
    assert(math.abs(n - 2999718.85) < 0.05, s"N $n vs 2999718.85")
    // the projection centre maps exactly to the false origin
    val (x0, y0) = f(10.0, 52.0)
    assert(math.abs(x0 - 4321000.0) < 1e-6 && math.abs(y0 - 3210000.0) < 1e-6)
    // equal-area property: unit Jacobian everywhere (same check as 5070)
    val e2 = 0.0066943799901413165
    val a = 6378137.0
    for ((lon, lat) <- Seq((10.0, 52.0), (-9.0, 38.7), (25.0, 60.2), (5.0, 50.0))) {
      val d = 1e-4
      val raw = Seq((lon, lat), (lon + d, lat), (lon + d, lat + d),
        (lon, lat + d)).map(Function.tupled(f))
      val cx = raw.map(_._1).sum / 4
      val cy = raw.map(_._2).sum / 4
      val quad = raw.map { case (x, y) => (x - cx, y - cy) }
      val proj = math.abs(quad.zip(quad.tail :+ quad.head)
        .map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2)
      val phi = math.toRadians(lat + d / 2)
      val sin2 = math.sin(phi) * math.sin(phi)
      val mRad = a * (1 - e2) / math.pow(1 - e2 * sin2, 1.5)
      val nRad = a / math.sqrt(1 - e2 * sin2)
      val truth = mRad * nRad * math.cos(phi) * math.toRadians(d) * math.toRadians(d)
      assert(math.abs(proj / truth - 1) < 1e-6, s"($lon,$lat): ratio ${proj / truth}")
    }
  }

  test("Gauss-Krüger 3146x: zone arithmetic, Cologne quadrant, zone range enforced") {
    // Cologne (6.96E, 50.94N) sits in zone 2 (lon0 = 6): easting just
    // east of the 2 500 000 false offset, northing ~ the Bessel meridian
    // arc at 50.94N
    val (e, n) = Proj.forward("EPSG:31466").get(6.96, 50.94)
    assert(e > 2550000 && e < 2590000, s"E $e")
    assert(n > 5630000 && n < 5660000, s"N $n")
    // zone 4 (lon0 = 12): Dresden (13.74E, 51.05N), east of the CM
    val (e4, n4) = Proj.forward("epsg:31468").get(13.74, 51.05)
    assert(e4 > 4600000 && e4 < 4650000, s"E $e4")
    assert(n4 > 5640000 && n4 < 5680000, s"N $n4")
    // only zones 2-5 exist
    assert(Proj.crs("31461").isEmpty && Proj.crs("31470").isEmpty)
  }

  test("Krovak: EPSG GN7-2 worked example (S-JTSK datum coordinates, datum-free kernel)") {
    // EPSG Guidance Note 7-2, method 9819 example on Bessel 1841:
    // phi = 50°12'32.4416"N, lam = 16°50'59.1790"E of Greenwich ->
    // southing 1050538.63 m, westing 568991.00 m. North-orientated
    // (method 1041, the 5514 axes) that is E = -568991.00, N = -1050538.63.
    val crs = Proj.Crs(
      Proj.Krovak(49.5, 24.833333333333332, 30.288139750000003,
        78.5, 0.9999, 0.0, 0.0), Proj.Bessel1841)
    val lat = 50 + 12.0 / 60 + 32.4416 / 3600
    val lon = 16 + 50.0 / 60 + 59.1790 / 3600
    val (e, n) = crs.forward(lon, lat)
    assert(math.abs(e - -568991.00) < 0.05, s"E $e vs -568991.00")
    assert(math.abs(n - -1050538.63) < 0.05, s"N $n vs -1050538.63")
    val (lon2, lat2) = crs.inverse(e, n)
    assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
  }

  test("S-JTSK / Krovak East North (EPSG:5514): Prague quadrant and WMS bbox sanity") {
    // Czech national grid: ALL in-country coordinates are negative
    // (southing/westing flipped to E/N with zero false origin). Prague
    // centre (14.42E, 50.087N) sits near westing ~743 km, southing
    // ~1043 km.
    val f = Proj.forward("EPSG:5514").get
    val (e, n) = f(14.42, 50.087)
    assert(e < 0 && n < 0, s"5514 must be negative in-country: ($e, $n)")
    assert(-e > 720000 && -e < 770000, s"westing ${-e}")
    assert(-n > 1020000 && -n < 1070000, s"southing ${-n}")
    // a Czech-extent WMS bbox stays finite and correctly ordered
    val (x0, y0, x1, y1) = Proj.transformBounds(f, 12.0, 48.5, 18.9, 51.1)
    assert(x0 < x1 && y0 < y1 && x1 < 0 && y1 < 0,
      s"bbox ($x0,$y0,$x1,$y1)")
  }

  test("JGD2011 Japan Plane Rectangular (6669-6687): origins anchor zero, Tokyo quadrant, zone range enforced") {
    // zone IX origin (139°50'E, 36°N) is the natural origin: (0, 0)
    val f9 = Proj.forward("EPSG:6677").get
    val (x0, y0) = f9(139.0 + 50.0 / 60, 36.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6, s"origin ($x0,$y0)")
    // Tokyo station (139.7671E, 35.6812N): west and south of the zone IX
    // origin — small negative easting, ~-35 km northing
    val (xt, yt) = f9(139.7671, 35.6812)
    assert(xt > -8000 && xt < 0, s"Tokyo x $xt")
    assert(yt > -37000 && yt < -33000, s"Tokyo y $yt")
    // k0 = 0.9999 on the central meridian: one degree of latitude north
    // of the zone I origin is ~110.9 km of northing (k0 * GRS80
    // meridian arc at 33.5N), and the origin latitude itself anchors 0
    val f1 = Proj.forward("EPSG:6669").get
    val (_, yN) = f1(129.5, 34.0)
    assert(yN > 110500 && yN < 111200, s"1-degree arc $yN") // ~110.9 km
    // only zones I-XIX exist
    assert(Proj.crs("6668").isEmpty && Proj.crs("6688").isEmpty)
    // all 19 zones resolve
    assert((6669 to 6687).forall(c => Proj.crs(c.toString).isDefined))
  }

  test("Pulkovo 1942 Gauss-Krüger (284xx): zone arithmetic, Moscow quadrant, zone range enforced") {
    // Moscow (37.6176E, 55.7558N) sits in zone 7 (lon0 = 39, FE =
    // 7 500 000): ~87 km west of the CM, northing ~ the Krassowsky
    // meridian arc at 55.75N (~6 181 km)
    val (e, n) = Proj.forward("EPSG:28407").get(37.6176, 55.7558)
    assert(e > 7350000 && e < 7480000, s"E $e")
    assert(n > 6150000 && n < 6210000, s"N $n")
    // zone 19 (lon0 = 111): Chita (113.5E, 52.03N), 2.5 degrees east of
    // the CM -> ~171 km east of the 19 500 000 false easting
    val (e19, n19) = Proj.forward("epsg:28419").get(113.5, 52.03)
    assert(e19 > 19640000 && e19 < 19710000, s"E $e19")
    assert(n19 > 5740000 && n19 < 5800000, s"N $n19")
    // the Pulkovo datum shift moves points ~100 m class vs raw WGS84 TM
    val raw = Proj.Crs(Proj.Tmerc(0.0, 39.0, 1.0, 7500000.0, 0.0), Proj.Krassowsky1940)
      .forward(37.6176, 55.7558)
    assert(math.hypot(raw._1 - e, raw._2 - n) > 20 &&
      math.hypot(raw._1 - e, raw._2 - n) < 300)
    // only zones 2-32 exist
    assert(Proj.crs("28401").isEmpty && Proj.crs("28433").isEmpty)
    assert((28402 to 28432).forall(c => Proj.crs(c.toString).isDefined))
  }

  test("Swiss LV95 (EPSG:2056): Bern anchors the false origin; Zurich quadrant; 90-degree Hotine branch") {
    val fwd = Proj.forward("epsg:2056").get
    // the projection centre (Bern old observatory) maps to the false
    // origin by construction of variant B. The CH1903+ datum shift moves
    // the WGS84 input a few arc-seconds, so give it metres, not microns:
    // the WGS84 coordinates OF the centre land within ~m of (FE, FN)
    // only after the exact translation — verify via the CH1903+-native
    // kernel first, then the shifted full CRS loosely
    val kernelOnly = Proj.Crs(
      Proj.Hotine(46.952405555555556, 7.439583333333333, 90.0, 90.0,
        1.0, 2600000.0, 1200000.0), Proj.Bessel1841)
    val (e0, n0) = kernelOnly.forward(7.439583333333333, 46.952405555555556)
    assert(math.abs(e0 - 2600000.0) < 1e-6 && math.abs(n0 - 1200000.0) < 1e-6,
      s"centre -> ($e0, $n0)")
    // Zurich (8.5417E, 47.3769N WGS84): ~83 km east, ~47 km north of Bern
    val (e, n) = fwd(8.5417, 47.3769)
    assert(e > 2678000 && e < 2688000, s"E $e")
    assert(n > 1242000 && n < 1252000, s"N $n")
    // round-trip through the datum shift
    val (lon2, lat2) = Proj.inverse("epsg:2056").get(e, n)
    assert(math.abs(lon2 - 8.5417) < 1e-9 && math.abs(lat2 - 47.3769) < 1e-9)
  }

  test("NZTM (EPSG:2193): natural-origin anchors and Wellington quadrant") {
    val fwd = Proj.forward("epsg:2193").get
    // the natural origin (173E, 0N) maps exactly to the false offsets
    val (e0, n0) = fwd(173.0, 0.0)
    assert(math.abs(e0 - 1600000.0) < 1e-6 && math.abs(n0 - 10000000.0) < 1e-6)
    // Wellington (174.7762E, 41.2865S): east of the CM; northing =
    // 10 000 000 - k0 * meridian distance(41.2865) ~ 5.43e6
    val (e, n) = fwd(174.7762, -41.2865)
    assert(e > 1740000 && e < 1760000, s"E $e")
    assert(n > 5420000 && n < 5440000, s"N $n")
  }

  test("27700 kernel: OS worked example on Airy 1830 (datum-free TM check)") {
    // Ordnance Survey, "A guide to coordinate systems in Great Britain",
    // worked example: OSGB36 lat 52°39'27.2531\"N lon 1°43'4.5177\"E
    // -> E 651409.903, N 313177.270 (public document, Airy 1830 ellipsoid)
    val kernelOnly = Proj.Crs(
      Proj.Tmerc(49.0, -2.0, 0.9996012717, 400000.0, -100000.0), Proj.Airy1830)
    val lat = 52 + 39.0 / 60 + 27.2531 / 3600
    val lon = 1 + 43.0 / 60 + 4.5177 / 3600
    val (e, n) = kernelOnly.forward(lon, lat)
    assert(math.abs(e - 651409.903) < 0.005, s"easting $e")
    assert(math.abs(n - 313177.270) < 0.005, s"northing $n")
    // and the kernel inverse recovers the input
    val (lon2, lat2) = kernelOnly.inverse(651409.903, 313177.270)
    assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
  }

  test("27700 datum: Helmert matches the published OSGB36->WGS84 params, and shifts ~100 m") {
    // independent check of the rotation-sign convention: applying this
    // engine's WGS84->OSGB36 then the textbook EPSG:1314 forward
    // (position-vector, +446.448 etc.) must return to the start
    val h = Proj.Helmert(-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421, 20.4894)
    def epsg1314Forward(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val s = 1.0 - 20.4894e-6
      val rx = math.toRadians(0.1502 / 3600)
      val ry = math.toRadians(0.2470 / 3600)
      val rz = math.toRadians(0.8421 / 3600)
      (446.448 + s * (x - rz * y + ry * z),
        -125.157 + s * (rz * x + y - rx * z),
        542.060 + s * (-ry * x + rx * y + z))
    }
    val (x0, y0, z0) = (3980581.0, -100.0, 4966825.0) // near London, ECEF
    val (x1, y1, z1) = h(x0, y0, z0)
    val (x2, y2, z2) = epsg1314Forward(x1, y1, z1)
    // params are mutually negated small-angle transforms: agreement to cm
    assert(math.hypot(math.hypot(x2 - x0, y2 - y0), z2 - z0) < 0.05)
    // the full 27700 CRS applies a genuine datum shift: projecting WGS84
    // coordinates with vs without the shift differs by the ~50-180 m
    // OSGB36<->WGS84 separation over Great Britain
    val withDatum = Proj.forward("epsg:27700").get
    val kernelOnly = Proj.Crs(
      Proj.Tmerc(49.0, -2.0, 0.9996012717, 400000.0, -100000.0), Proj.Airy1830)
    val (gx, gy) = withDatum(-0.1276, 51.5074) // London
    val (kx, ky) = kernelOnly.forward(-0.1276, 51.5074)
    val shift = math.hypot(gx - kx, gy - ky)
    assert(shift > 50 && shift < 180, s"datum shift $shift m")
    // London lands in the right national-grid ballpark (Charing Cross ~ TQ303805)
    assert(math.abs(gx - 530300) < 1500 && math.abs(gy - 180500) < 1500, s"($gx,$gy)")
  }

  test("polar stereographic variant B: EPSG GN7-2 worked example and pole/scale properties") {
    // EPSG Guidance Note 7-2, method 9829 example (Australian Antarctic
    // Polar Stereographic parameters): latTs=-71, lon0=70E, FE=FN=6000000;
    // phi=75°S lam=120°E -> E 7255380.79, N 7053389.56
    val crs = Proj.Crs(Proj.PolarStereo(-71.0, 70.0, 6000000.0, 6000000.0), Proj.WGS84)
    val (e, n) = crs.forward(120.0, -75.0)
    assert(math.abs(e - 7255380.79) < 0.02, s"easting $e")
    assert(math.abs(n - 7053389.56) < 0.02, s"northing $n")
    val (lon2, lat2) = crs.inverse(7255380.79, 7053389.56)
    assert(math.abs(lon2 - 120.0) < 1e-7 && math.abs(lat2 + 75.0) < 1e-7)
    // poles map to the false origin
    val n3413 = Proj.forward("epsg:3413").get(-45.0, 90.0)
    assert(math.hypot(n3413._1, n3413._2) < 1e-6)
    val s3031 = Proj.forward("epsg:3031").get(0.0, -90.0)
    assert(math.hypot(s3031._1, s3031._2) < 1e-6)
    // scale is 1 at the latitude of true scale: projected length of a small
    // east-west step equals the ellipsoidal parallel arc
    for ((code, latTs) <- Seq("epsg:3413" -> 70.0, "epsg:3031" -> -71.0, "epsg:3995" -> 71.0)) {
      val fwd = Proj.forward(code).get
      val d = 1e-4
      val (x1, y1) = fwd(10.0, latTs)
      val (x2, y2) = fwd(10.0 + d, latTs)
      val proj = math.hypot(x2 - x1, y2 - y1)
      val phi = math.toRadians(latTs)
      val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
      val truth = math.toRadians(d) * nu * math.cos(phi)
      assert(math.abs(proj / truth - 1) < 1e-7, s"$code scale ${proj / truth}")
    }
  }

  test("ETRS89 UTM (258xx): zone range enforced, agrees with WGS84 UTM to <1 mm") {
    assert(Proj.forward("epsg:25832").isDefined)
    assert(Proj.forward("epsg:25827").isEmpty && Proj.forward("epsg:25839").isEmpty)
    // GRS80 vs WGS84 differ in the 11th digit of flattening: same point,
    // same zone params -> sub-mm difference
    val (xe, ye) = Proj.forward("epsg:25832").get(9.0, 50.0)
    val (xw, yw) = Proj.forward("epsg:32632").get(9.0, 50.0)
    assert(math.hypot(xe - xw, ye - yw) < 1e-3)
  }

  test("NAD83/MGA/GDA2020/SIRGAS UTM families: zone arithmetic, ranges enforced, GRS80 parity") {
    // all four are the standard UTM bundle on GRS80, so each must agree
    // with the corresponding WGS84 UTM code to <1 mm (the 258xx property)
    def near(a: String, b: String, lon: Double, lat: Double): Unit = {
      val (xa, ya) = Proj.forward(a).get(lon, lat)
      val (xb, yb) = Proj.forward(b).get(lon, lat)
      assert(math.hypot(xa - xb, ya - yb) < 1e-3, s"$a vs $b")
    }
    // NAD83 UTM 17N (26917): Great Lakes quadrant, lon0 = -81
    near("epsg:26917", "epsg:32617", -80.0, 43.0)
    assert(Proj.forward("epsg:26900").isEmpty && Proj.forward("epsg:26924").isEmpty)
    // GDA94 MGA zone 55 (28355): Melbourne, lon0 = 147, south FN
    near("epsg:28355", "epsg:32755", 145.0, -37.8)
    assert(Proj.forward("epsg:28347").isEmpty && Proj.forward("epsg:28359").isEmpty)
    // GDA2020 MGA zone 55 (7855) — same bundle as 28355 (GDA94≡GDA2020 here)
    near("epsg:7855", "epsg:28355", 145.0, -37.8)
    assert(Proj.forward("epsg:7845").isEmpty && Proj.forward("epsg:7860").isEmpty)
    // SIRGAS 2000: 31972 = 18N (code-31954), 31983 = 23S (code-31960)
    near("epsg:31972", "epsg:32618", -74.0, 4.6)  // Bogota quadrant
    near("epsg:31983", "epsg:32723", -46.6, -23.5) // Sao Paulo quadrant
    assert(Proj.forward("epsg:31964").isEmpty && Proj.forward("epsg:31986").isEmpty)
    // round-trip property holds for the new families (points inside
    // each zone's own longitude band)
    for ((code, lon, lat) <- Seq(("epsg:26917", -80.0, 43.0),
        ("epsg:28355", 146.0, -30.0), ("epsg:7855", 146.0, -30.0),
        ("epsg:31983", -46.6, -23.5))) {
      val f = Proj.forward(code).get; val i = Proj.inverse(code).get
      val (lo2, la2) = i.tupled(f(lon, lat))
      assert(math.abs(lo2 - lon) < 1e-9 && math.abs(la2 - lat) < 1e-9, code)
    }
  }

  test("CGCS2000 Gauss-Krüger 4491-4554: zone/CM arithmetic, range edges, round trip") {
    // zone codes vs CM codes are the SAME projection up to the zone
    // prefix in the false easting — a structural identity straight from
    // the EPSG definitions, so the two ranges must agree to the bit
    // after removing zone·10⁶
    val beijingLon = 116.391
    val beijingLat = 39.907
    // 6°: zone 20 (4498, CM = 117E, FE = 20.5e6) vs CM 117E (4509, FE = 0.5e6)
    val (xz6, yz6) = Proj.forward("epsg:4498").get(beijingLon, beijingLat)
    val (xc6, yc6) = Proj.forward("epsg:4509").get(beijingLon, beijingLat)
    assert(xz6 - xc6 == 20000000.0 && yz6 == yc6)
    // 3°: zone 39 (4527, CM = 117E, FE = 39.5e6) vs CM 117E (4548)
    val (xz3, yz3) = Proj.forward("epsg:4527").get(beijingLon, beijingLat)
    val (xc3, yc3) = Proj.forward("epsg:4548").get(beijingLon, beijingLat)
    assert(xz3 - xc3 == 39000000.0 && yz3 == yc3)
    // 6° CM 117E and 3° CM 117E share lon0 and k0=1: identical projection
    assert(xc6 == xc3 && yc6 == yc3)
    // on the central meridian the easting IS the false easting (k0 = 1)
    val (xcm, _) = Proj.forward("epsg:4509").get(117.0, 30.0)
    assert(math.abs(xcm - 500000.0) < 1e-6)
    // GRS80 parity: CGCS2000's ellipsoid matches GRS80 to 1e-9 in 1/f,
    // so a WGS84-ellipsoid twin of the same Tmerc differs by < 1 mm
    // (the 258xx/NAD83 convention); here pin against the Pulkovo GK
    // formula SHAPE instead: same zone arithmetic family, different
    // ellipsoid/datum must NOT match (guards a copy-paste ellipsoid)
    val (xp, yp) = Proj.forward("epsg:28420").get(beijingLon, beijingLat)
    assert(math.hypot(xp - xz6, yp - yz6) > 10.0,
      "Pulkovo GK zone 20 must differ from CGCS2000 zone 20 (Krassowsky + shift)")
    // range edges refuse
    assert(Proj.forward("epsg:4490").isEmpty, "4490 is geographic, not GK")
    assert(Proj.forward("epsg:4555").isEmpty)
    // round trip inside the band
    for (code <- Seq("epsg:4498", "epsg:4509", "epsg:4527", "epsg:4548")) {
      val f = Proj.forward(code).get
      val i = Proj.inverse(code).get
      val (lo2, la2) = i.tupled(f(beijingLon, beijingLat))
      assert(math.abs(lo2 - beijingLon) < 1e-9 &&
        math.abs(la2 - beijingLat) < 1e-9, code)
    }
    // the Beijing 1954 near-miss refuses with the CGCS2000 workaround
    val msg = Proj.unsupportedMessage("epsg:21420")
    assert(msg.contains("Beijing 1954") && msg.contains("EPSG:4498"), msg)
  }

  test("NAD27 UTM 267xx: genuine datum shift, round-trip exact, sane offset from NAD83") {
    // zone 14 over Kansas: the CONUS translation moves the projected
    // point by the real NAD27<->WGS84 separation (tens of metres)
    val withDatum = Proj.forward("epsg:26714").get
    val kernelOnly = Proj.Crs(
      Proj.Tmerc(0.0, -99.0, 0.9996, 500000.0, 0.0), Proj.Clarke1866)
    val (gx, gy) = withDatum(-98.0, 38.0)
    val (kx, ky) = kernelOnly.forward(-98.0, 38.0)
    val shift = math.hypot(gx - kx, gy - ky)
    assert(shift > 10 && shift < 400, s"datum shift $shift m")
    // vs NAD83 zone 14 (same kernel family, GRS80, no shift): the
    // published NAD27->NAD83 coordinate change in CONUS is metres to
    // ~100 m level combined with the ellipsoid change
    val (nx, ny) = Proj.forward("epsg:26914").get(-98.0, 38.0)
    val d = math.hypot(gx - nx, gy - ny)
    assert(d > 5 && d < 400, s"NAD27 vs NAD83 offset $d m")
    // forward-inverse closes to machine precision
    val inv = Proj.inverse("epsg:26714").get
    val (lo, la) = inv(gx, gy)
    assert(math.abs(lo + 98.0) < 1e-9 && math.abs(la - 38.0) < 1e-9)
    // out-of-range zone still refuses
    assert(Proj.forward("epsg:26730").isEmpty)
  }

  test("WGS72 UTM 322xx/323xx: micro datum shift, round-trip exact, south FN") {
    // zone 14 over Kansas vs WGS84 UTM 14N: the EPSG:1237 micro-shift
    // (tz 4.5 m, rz 0.554", ds 0.2263 ppm) plus the 2 m ellipsoid
    // change separates the grids by metres-to-tens-of-metres
    val w72 = Proj.forward("epsg:32214").get
    val w84 = Proj.forward("epsg:32614").get
    val (ax, ay) = w72(-98.0, 38.0)
    val (bx, by) = w84(-98.0, 38.0)
    val d = math.hypot(ax - bx, ay - by)
    assert(d > 1 && d < 40, s"WGS72 vs WGS84 offset $d m")
    // the shift is GENUINE (not just the ellipsoid swap): kernel-only
    // WGS72 ellipsoid differs from the datum-shifted result
    val kernelOnly = Proj.Crs(
      Proj.Tmerc(0.0, -99.0, 0.9996, 500000.0, 0.0), Proj.Wgs72Ell)
    val (kx, ky) = kernelOnly.forward(-98.0, 38.0)
    assert(math.hypot(ax - kx, ay - ky) > 1)
    // forward-inverse closes to machine precision
    val inv = Proj.inverse("epsg:32214").get
    val (lo, la) = inv(ax, ay)
    assert(math.abs(lo + 98.0) < 1e-9 && math.abs(la - 38.0) < 1e-9)
    // southern zone: false northing 10^7, round-trip exact
    val s56 = Proj.forward("epsg:32356").get
    val (sx, sy) = s56(153.0, -27.5)
    assert(sy > 6000000 && sy < 10000000, s"south northing $sy")
    val sInv = Proj.inverse("epsg:32356").get
    val (slo, sla) = sInv(sx, sy)
    assert(math.abs(slo - 153.0) < 1e-9 && math.abs(sla + 27.5) < 1e-9)
    // zone bounds refuse
    assert(Proj.forward("epsg:32200").isEmpty)
    assert(Proj.forward("epsg:32261").isEmpty)
    assert(Proj.forward("epsg:32361").isEmpty)
  }

  test("unsupportedMessage: near-miss EPSG blocks name the supported workaround") {
    val tokyo = Proj.unsupportedMessage("epsg:30169")
    assert(tokyo.contains("6677"), tokyo)
    val jgd2000 = Proj.unsupportedMessage("epsg:2451")
    assert(jgd2000.contains("6677"), jgd2000)
    // unknown code outside any known block lists the supported families
    val generic = Proj.unsupportedMessage("epsg:99999")
    assert(generic.contains("supported families"), generic)
  }

  test("transformBounds: densified UTM bbox covers the corner-only bbox (curved edges)") {
    val proj = Proj.forward("epsg:32631").get
    // a wide box straddling the zone: the projected bottom edge bows
    val (xmin, ymin, xmax, ymax) = Proj.transformBounds(proj, -1.0, 40.0, 7.0, 48.0)
    val corners = Seq((-1.0, 40.0), (7.0, 40.0), (-1.0, 48.0), (7.0, 48.0)).map { case (lo, la) => proj(lo, la) }
    assert(xmin <= corners.map(_._1).min && xmax >= corners.map(_._1).max)
    assert(ymin <= corners.map(_._2).min && ymax >= corners.map(_._2).max)
    // and it genuinely differs: parallels bow upward away from the central
    // meridian, so the south edge's true minimum (at the CM, inside the
    // box) sits well below the south corners — corners alone under-cover
    assert(ymin < corners.map(_._2).min - 1.0)
  }
}
