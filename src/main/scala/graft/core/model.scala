package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Model catalog — gds.beta.model.{list,exists,drop}
 * (core/.../core/model/ModelCatalog.java:33, Model.java:30, procs in
 * proc/catalog/.../ModelListProc.java, ModelExistsProc.java,
 * ModelDropProc.java): named trained artifacts (embedding tables and
 * their train configs) keyed per user, so a trained Node2Vec/FastRP run
 * can be stored once and streamed/re-used without retraining.
 *
 * Semantics mirror the reference's UserCatalog:
 *  - `set` rejects a duplicate (user, name);
 *  - `drop` on a missing name is an error (returns the dropped model);
 *  - `exists`/`algoType` are non-throwing lookups;
 *  - `list(user)` returns that user's models, name-sorted for determinism.
 * The reference's per-edition model-count limit is licensing, not engine
 * semantics — not reproduced. Model data is a DataFrame (id, embedding…)
 * instead of raw weight arrays: the natural Spark representation, and what
 * write-back/stream procs consume directly.
 *
 * `save`/`load` replace the enterprise model-store: data as parquet +
 * train config as a small JSON sidecar — the same parquet-store pattern
 * as graph export (B7), readable by any engine.
 */
final case class Model(
    username: String,
    name: String,
    algoType: String,
    data: DataFrame,
    trainConfig: Map[String, String],
    creationTime: java.time.Instant)

object ModelCatalog {
  private val models =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Model]()

  def set(model: Model): Unit = {
    val key = (model.username, model.name)
    // atomic check-and-insert: a containsKey-then-put race would let two
    // concurrent stores of the same (user, name) both "succeed"
    if (models.putIfAbsent(key, model) != null)
      throw new IllegalArgumentException(
        s"Model with name `${model.name}` already exists")
  }

  /** Convenience `Model.of` (Model.java:44). */
  def store(username: String, name: String, algoType: String, data: DataFrame,
      trainConfig: Map[String, String] = Map.empty): Model = {
    val m = Model(username, name, algoType, data, trainConfig,
      java.time.Instant.now())
    set(m)
    m
  }

  def get(username: String, name: String): Model = {
    val m = models.get((username, name))
    if (m == null)
      throw new NoSuchElementException(s"Model with name `$name` does not exist")
    m
  }

  def exists(username: String, name: String): Boolean =
    models.containsKey((username, name))

  def algoType(username: String, name: String): Option[String] =
    Option(models.get((username, name))).map(_.algoType)

  def drop(username: String, name: String): Model = {
    val m = models.remove((username, name))
    if (m == null)
      throw new IllegalArgumentException(
        s"Model with name `$name` does not exist and can't be removed.")
    m
  }

  def list(username: String): Seq[Model] = {
    import scala.jdk.CollectionConverters._
    models.asScala.collect {
      case ((u, _), m) if u == username => m
    }.toSeq.sortBy(_.name)
  }

  def removeAllLoadedModels(): Unit = models.clear()

  /** Persist: `<dir>/data.parquet` + `<dir>/model.json` (metadata). */
  def save(model: Model, dir: String): Unit = {
    model.data.write.mode("overwrite").parquet(s"$dir/data.parquet")
    val cfg = model.trainConfig.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val meta = s"""{"username":"${esc(model.username)}",""" +
      s""""name":"${esc(model.name)}",""" +
      s""""algoType":"${esc(model.algoType)}",""" +
      s""""creationTime":"${model.creationTime}",""" +
      s""""trainConfig":$cfg}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir).resolve("model.json").normalize(), meta)
  }

  /** Load a saved model back (not auto-registered — caller decides). */
  def load(spark: SparkSession, dir: String): Model = {
    val meta = ujsonLite(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir).resolve("model.json")))
    Model(
      username = meta("username"),
      name = meta("name"),
      algoType = meta("algoType"),
      data = spark.read.parquet(s"$dir/data.parquet"),
      trainConfig = meta.view.filterKeys(_.startsWith("trainConfig.")).map {
        case (k, v) => k.stripPrefix("trainConfig.") -> v
      }.toMap,
      creationTime = java.time.Instant.parse(meta("creationTime")))
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** Minimal flat-JSON reader for the sidecar this object itself writes:
   *  string values only, and `trainConfig` is always the LAST top-level
   *  field, so every key matched after its `{` opens is a config entry
   *  (flattened under a "trainConfig." prefix). Not a general JSON parser. */
  private def ujsonLite(s: String): Map[String, String] = {
    val field = """"((?:[^"\\]|\\.)*)"\s*:\s*(\{|"((?:[^"\\]|\\.)*)")""".r
    // single-pass unescape: sequential .replace calls would corrupt
    // escaped-backslash-then-n sequences ("\\n" vs "\n")
    def unesc(v: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < v.length) {
        if (v.charAt(i) == '\\' && i + 1 < v.length) {
          v.charAt(i + 1) match {
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case c   => sb.append(c)
          }
          i += 2
        } else { sb.append(v.charAt(i)); i += 1 }
      }
      sb.toString
    }
    var prefix = ""
    val out = scala.collection.mutable.Map[String, String]()
    field.findAllMatchIn(s).foreach { m =>
      val key = unesc(m.group(1))
      if (m.group(2) == "{") prefix = key + "."
      else out(prefix + key) = unesc(m.group(3))
    }
    out.toMap
  }
}
