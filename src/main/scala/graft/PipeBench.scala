package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.BBox
import graft.plans.LabelMakerJob
import graft.sources.Mvt
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress

/** Engine-side throughput benchmark (BASELINE.md "engine-side targets"):
  * the reference's README job — zoom 13 Rio bbox, 312 tiles — against an
  * in-process stub tile server (network-independent), for each ml_type.
  * Prints one JSON line with tiles/sec per label type.
  */
object PipeBench {
  private val classesJson =
    """[
      |  {"name": "Roads",     "filter": ["has", "highway"]},
      |  {"name": "Buildings", "filter": ["has", "building"]}
      |]""".stripMargin

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stub: a 30-feature MVT (mixed polygons/lines) + a PNG tile
    val rnd = new scala.util.Random(7)
    val feats = (0 until 30).map { i =>
      if (i % 3 == 0)
        Mvt.EncFeature("LineString",
          Seq(Seq((rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong),
            (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))),
          Map("highway" -> "primary"), id = Some(i.toLong))
      else {
        val x = rnd.nextInt(3000).toLong
        val y = rnd.nextInt(3000).toLong
        Mvt.EncFeature("Polygon",
          Seq(Seq((x, y), (x, y + 800), (x + 800, y + 800), (x + 800, y), (x, y))),
          Map("building" -> "yes"), id = Some(i.toLong))
      }
    }
    val tileBytes = Mvt.encode(feats)
    val png = {
      val img = new java.awt.image.BufferedImage(256, 256, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    server.setExecutor(pool)
    server.createContext("/", (ex: HttpExchange) => {
      val body = if (ex.getRequestURI.getPath.endsWith(".pbf")) tileBytes else png
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    val port = server.getAddress.getPort

    try {
      val bounds = Seq(-44.4836, -23.0266, -43.4127, -22.5856) // README Rio, 312 tiles
      val results = Seq("classification", "object-detection", "segmentation").map { ml =>
        val job = LabelMakerJob(13, bounds, classesJson,
          imagery = s"http://localhost:$port/i/{z}/{x}/{y}.png",
          labelSource = s"http://localhost:$port/l/{z}/{x}/{y}.pbf",
          mlType = ml)
        // warm
        job.build(spark).count()
        val t0 = System.nanoTime()
        val n = job.build(spark).count()
        val sec = (System.nanoTime() - t0) / 1e9
        (ml, n, sec, n / sec)
      }
      val qs = results.map { case (ml, n, sec, tps) =>
        f"""\"$ml\":{\"tiles\":$n,\"sec\":$sec%.3f,\"tiles_per_sec\":$tps%.1f}"""
      }.mkString("{", ",", "}")
      println(s"""{"metric":"readme_job_312_tiles","cpus":$cpus,"results":$qs}""")
    } finally {
      server.stop(0)
      pool.shutdownNow() // non-daemon threads would keep the JVM alive
      spark.stop()
    }
  }
}
