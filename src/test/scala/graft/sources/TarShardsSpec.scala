package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TarShardsSpec extends SparkSpec {

  private def jpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, (seed * 31 + x * 7 + y * 13) & 0xFFFFFF)))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def fixtureTar(nSamples: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    TarShards.writeTar(bos, (0 until nSamples).iterator.flatMap { i =>
      val key = f"sample$i%05d"
      Seq(
        s"$key.jpg" -> jpeg(8, 6, i),
        s"$key.json" -> s"""{"id": $i}""".getBytes("UTF-8"),
        s"$key.cls" -> s"${i % 3}".getBytes("UTF-8"))
    })
    bos.toByteArray
  }

  test("writeTar produces archives GNU tar can list and extract") {
    val dir = Files.createTempDirectory("graft_tar")
    val tarPath = dir.resolve("fixture.tar")
    Files.write(tarPath, fixtureTar(3))
    val list = new ProcessBuilder("tar", "-tf", tarPath.toString)
      .redirectErrorStream(true).start()
    val names = scala.io.Source.fromInputStream(list.getInputStream)
      .getLines().toSeq
    assert(list.waitFor() == 0, names.mkString("\n"))
    assert(names.size == 9 && names.head == "sample00000.jpg")
    // extract one payload and compare bytes
    val ex = new ProcessBuilder("tar", "-xf", tarPath.toString,
      "-C", dir.toString, "sample00001.json").start()
    assert(ex.waitFor() == 0)
    assert(new String(Files.readAllBytes(dir.resolve("sample00001.json")),
      "UTF-8") == """{"id": 1}""")
  }

  test("entries parses GNU-tar-written archives (interop both directions)") {
    val dir = Files.createTempDirectory("graft_tar_gnu")
    Files.write(dir.resolve("a.txt"), "alpha".getBytes("UTF-8"))
    Files.createDirectories(dir.resolve("sub"))
    Files.write(dir.resolve("sub/b.bin"), Array[Byte](1, 2, 3))
    val tarPath = dir.resolve("gnu.tar")
    val p = new ProcessBuilder("tar", "-cf", tarPath.toString,
      "-C", dir.toString, "a.txt", "sub/b.bin").start()
    assert(p.waitFor() == 0)
    val got = TarShards.entries(Files.newInputStream(tarPath))
      .map(e => e.name -> e.bytes.toSeq).toMap
    assert(got("a.txt") == "alpha".getBytes("UTF-8").toSeq)
    assert(got("sub/b.bin") == Seq[Byte](1, 2, 3))
  }

  test("round trip: writeTar -> entries identical; groupSamples splits at first dot") {
    val tar = fixtureTar(4)
    val es = TarShards.entries(new java.io.ByteArrayInputStream(tar)).toSeq
    assert(es.size == 12)
    val samples = TarShards.groupSamples(es.iterator).toSeq
    assert(samples.size == 4)
    assert(samples.map(_._1) == (0 until 4).map(i => f"sample$i%05d"))
    assert(samples.head._2.keySet == Set("jpg", "json", "cls"))
    // first-dot split: "k.seg.png" ext is "seg.png"
    assert(TarShards.splitKey("dir/k.seg.png") == ("dir/k", "seg.png"))
    assert(TarShards.splitKey("noext") == ("noext", ""))
  }

  test("samples: one row per sample, binary columns feed the image pipeline end-to-end") {
    val dir = Files.createTempDirectory("graft_shards")
    Files.write(dir.resolve("shard-000000.tar"), fixtureTar(3))
    Files.write(dir.resolve("shard-000001.tar"), fixtureTar(2))
    val df = TarShards.samples(spark, dir.toString + "/*.tar")
    assert(df.count() == 5)
    assert(df.schema == TarShards.sampleSchema)
    // jpg bytes decode through the standard multimodal operators
    val metas = graft.multimodal.Multimodal.withImageMeta(
        df.select(col("key"), col("files").getItem("jpg").as("img")), "img")
      .select("key", "image_meta.width", "image_meta.height").collect()
    assert(metas.length == 5)
    assert(metas.forall(r => r.getInt(1) == 8 && r.getInt(2) == 6))
    // the label sidecar arrives as parallel bytes of the same row
    val cls = df.select(col("files").getItem("cls").cast("string").as("c"))
      .collect().map(_.getString(0)).toSet
    assert(cls == Set("0", "1", "2"))
  }

  test("writeShards: DataFrame -> tar shards -> samples round trip") {
    val s = spark
    val dir = Files.createTempDirectory("graft_sink").toString
    val rows = (0 until 6).map { i =>
      Row(f"k$i%03d", Map("txt" -> s"payload $i".getBytes("UTF-8")))
    }
    val df = s.createDataFrame(
      s.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("files",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.BinaryType)))))
    val shards = TarShards.writeShards(df, "key", "files", dir)
    assert(shards.size == 2 && shards.forall(_.endsWith(".tar")))
    val back = TarShards.samples(s, s"$dir/*.tar")
      .select(col("key"), col("files").getItem("txt").cast("string").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == (0 until 6).map(i => f"k$i%03d" -> s"payload $i").toMap)
  }

  test("writeShardsBySize: byte-targeted bins, oversized sample isolated, all samples survive") {
    val s = spark
    val dir = Files.createTempDirectory("graft_sized").toString
    // 8 samples of ~1.5 KiB on-tar (512 hdr + 1024 padded payload) and one
    // 10 KiB whopper; target 4 KiB -> ~2 samples per shard, whopper alone
    val rows = (0 until 8).map { i =>
      Row(f"k$i%03d", Map("bin" -> Array.fill[Byte](900)(i.toByte)))
    } :+ Row("k008_big", Map("bin" -> Array.fill[Byte](10000)(9.toByte)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("files",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.BinaryType))))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 3), schema)
    val shards = TarShards.writeShardsBySize(df, "key", "files", dir,
      targetBytes = 4096)
    assert(shards.size >= 3, s"expected several shards, got $shards")
    // every shard except possibly boundary-crossers stays near target:
    // no shard holds more than 3 small samples (3 * 1436 > 4096)
    val perShard = shards.map { p =>
      TarShards.entries(Files.newInputStream(Paths.get(
        p.stripPrefix("file:")))).size
    }
    assert(perShard.forall(_ <= 3), s"shard sample counts: $perShard")
    val back = TarShards.samples(s, s"$dir/*.tar")
    assert(back.count() == 9)
    assert(back.select("key").collect().map(_.getString(0)).sorted.toSeq ==
      rows.map(_.getString(0)).sorted)
  }

  test("writeShardsBySize: duplicate sample keys fail loudly instead of multiplying rows") {
    val s = spark
    val dir = Files.createTempDirectory("graft_dupkey").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("files",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.BinaryType))))
    val rows = Seq(
      Row("k1", Map("bin" -> Array.fill[Byte](10)(1.toByte))),
      Row("k1", Map("bin" -> Array.fill[Byte](10)(2.toByte))))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
    val e = intercept[Exception] {
      TarShards.writeShardsBySize(df, "key", "files", dir, targetBytes = 4096)
    }
    assert(e.getMessage != null && e.toString.contains("duplicate")
      || Option(e.getCause).exists(_.toString.contains("duplicate")),
      s"expected a duplicate-key error, got $e")
  }

  test("putOctal: a value wider than the field refuses loudly (no silent truncation)") {
    val h = new Array[Byte](512)
    TarShards.putOctal(h, 124, 12, (8L << 30) - 1) // 11 octal digits: fits
    val e = intercept[IllegalArgumentException] {
      TarShards.putOctal(h, 124, 12, 8L << 30) // 8 GiB = 12 octal digits
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("entries: corrupt size field refuses loudly instead of allocating") {
    val tar = fixtureTar(1)
    // blow up the octal size field of the first header
    (124 until 135).foreach(i => tar(i) = '7')
    val e = intercept[java.io.IOException] {
      TarShards.entries(new java.io.ByteArrayInputStream(tar),
        maxEntryBytes = 1 << 20).toSeq
    }
    assert(e.getMessage.contains("out of bounds"))
  }
}
