package graft.plans

import graft.core.BBox
import graft.model.{ClassSpec, MlType}
import graft.operators.{Labels, Segmentation, TileEnumeration}
import graft.sources.TileSources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's job API (`LabelMakerJob`, `main.py:69-111`) re-expressed
  * as a lazy Dataset plan (P1-P6, SURVEY §2.4).
  *
  * Differences by design (documented in SURVEY §3/§4):
  *  - the tile list is never materialized on the driver — S1 is a
  *    partitioned `spark.range` projection (`main.py:89` builds a client-RAM
  *    list);
  *  - filters compile once at plan time (the reference re-compiles + evals
  *    per feature x class, `label.py:18,28,40`);
  *  - imagery dispatch resolves once at plan time (`utils.py:121-127` probes
  *    per task);
  *  - results go to a parquet sink or a Dataset, not a driver gather
  *    (`main.py:111` returns every image to the client).
  */
final case class LabelMakerJob(
    zoom: Int,
    bounds: BBox,
    classes: Seq[ClassSpec],
    imagery: Option[String],
    labelSource: String,
    mlType: String) {

  require(Seq(MlType.Classification, MlType.ObjectDetection, MlType.Segmentation).contains(mlType),
    s"unknown ml_type: $mlType")

  /** P5 — closed-form tile count (no action, unlike `main.py:101-107`). */
  def nTiles: Long = TileEnumeration.count(bounds, zoom)

  /** S1 — the tile keyspace. */
  def tiles(spark: SparkSession): DataFrame =
    TileEnumeration.tiles(spark, bounds, zoom)

  /** P2/P3 — the full labeled-tile plan: (z, x, y, label[, image cols]).
    * Lazy; `explain` it for the reference's `dask.visualize` equivalent. */
  def build(spark: SparkSession): DataFrame = {
    val t = tiles(spark)
    val failures = spark.sparkContext.longAccumulator("label_fetch_failures")
    val features = TileSources.vectorFeatures(t, labelSource, failures = Some(failures))
    val labeled = mlType match {
      case MlType.Classification => Labels.classification(t, features.toDF(), classes)
      case MlType.ObjectDetection => Labels.objectDetection(t, features.toDF(), classes)
      case MlType.Segmentation => Segmentation.segmentation(t, features, classes)
    }
    imagery match {
      case None => labeled
      case Some(img) =>
        // the reference's implicit 1:1 tile-key join of label and image
        // stages (`main.py:90-97`)
        val images = TileSources.images(t, img).toDF()
          .withColumnRenamed("data", "image")
        labeled.join(images, Seq("z", "x", "y"))
    }
  }

  /** P6 — execute into a parquet sink (the scale path). */
  def writeParquet(spark: SparkSession, path: String): Unit =
    build(spark).write.mode("overwrite").parquet(path)

  /** P6 — notebook-style gather (small jobs only). */
  def collect(spark: SparkSession): Array[org.apache.spark.sql.Row] =
    build(spark).collect()
}

object LabelMakerJob {
  /** Convenience constructor mirroring the reference's signature
    * (`main.py:71-85`): bounds as [west, south, east, north]. */
  def apply(zoom: Int, bounds: Seq[Double], classesJson: String,
      imagery: String, labelSource: String, mlType: String): LabelMakerJob =
    LabelMakerJob(zoom, BBox(bounds(0), bounds(1), bounds(2), bounds(3)),
      ClassSpec.parseJson(classesJson), Option(imagery).filter(_.nonEmpty),
      labelSource, mlType)
}
