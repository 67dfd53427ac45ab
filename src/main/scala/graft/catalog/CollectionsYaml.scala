package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, SparkSession}
import org.yaml.snakeyaml.Yaml

import StacModel._

/** YAML collection loader (src_yaml_collections) — the engine-side
  * `open_collections(collections_path)` (avhrr recipe.py:84,156;
  * document shape collections.yaml:1-32). Driver-side parse (the
  * files are O(KB) config, never data), distributed Dataset out.
  * Uses SnakeYAML, which ships with Spark — no extra dependency.
  */
object CollectionsYaml {

  def parse(yamlText: String): Seq[StacCollection] = {
    val yaml = new Yaml()
    val docs = yaml.load[java.util.List[java.util.Map[String, Object]]](yamlText)
    docs.asScala.toSeq.map { m =>
      def str(k: String): String =
        Option(m.get(k)).map(_.toString.trim).getOrElse("")
      val extent = Option(m.get("extent"))
        .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
        .getOrElse(scala.collection.mutable.Map.empty[String, Object])
      val keywords = Option(m.get("keywords"))
        .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
        .getOrElse(Seq.empty)
      val providers = Option(m.get("providers"))
        .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
          .asScala.toSeq.map { p =>
            Provider(
              Option(p.get("name")).map(_.toString).getOrElse(""),
              Option(p.get("roles"))
                .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq
                  .map(_.toString))
                .getOrElse(Seq.empty),
              Option(p.get("url")).map(_.toString))
          })
        .getOrElse(Seq.empty)
      val links = Option(m.get("links"))
        .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
          .asScala.toSeq.map { l =>
            CollectionLink(
              Option(l.get("rel")).map(_.toString).getOrElse(""),
              Option(l.get("href")).map(_.toString).getOrElse(""),
              Option(l.get("title")).map(_.toString))
          })
        .getOrElse(Seq.empty)
      StacCollection(
        id = str("id"),
        title = str("title"),
        description = str("description"),
        license = str("license"),
        keywords = keywords,
        extent_spatial =
          extent.get("spatial").map(_.toString).getOrElse(""),
        extent_temporal =
          extent.get("temporal").map(_.toString).getOrElse(""),
        providers = providers,
        links = links)
    }
  }

  def load(spark: SparkSession, path: String): Dataset[StacCollection] = {
    import spark.implicits._
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    spark.createDataset(parse(text))
  }

  /** Category suffix derivation: `id.rsplit("-", 1)[1]`
    * (insitu recipe.py:193-195). A hyphen-less id is a config error:
    * the mirrored Python raises IndexError, so surface it rather than
    * letting the whole id flow downstream as a bogus category. */
  def categories(collections: Seq[StacCollection]): Seq[String] =
    collections.map { c =>
      val cut = c.id.lastIndexOf('-')
      require(cut >= 0,
        s"collection id '${c.id}' has no '-' category suffix")
      c.id.substring(cut + 1)
    }
}
