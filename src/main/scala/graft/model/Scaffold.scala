package graft.model

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** U7 Scaffold (reference: core/scaffold.py:4-117): save/load the
  * parameter state of a whole pipeline of named models to a directory
  * — one JSON file per component, external links recorded by name so
  * sharing re-wires on load.
  */
final class Scaffold {
  private val attached = scala.collection.mutable.LinkedHashMap[String, Model]()

  def attach(model: Model): Scaffold = { attached(model.name) = model; this }
  def apply(name: String): Model = attached(name)

  def save(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    attached.foreach { case (name, model) =>
      val (internal, external) = model.components.getState
      val json = Scaffold.toJson(internal, external)
      Files.writeString(Paths.get(dir, s"$name.json"), json)
    }
    // SHARED values live in the ParamStore, not in any model's internal
    // map (link() removes the key), so per-model files alone would lose
    // every shared parameter across a restart. Persist each distinct
    // store key once, from whichever attached model links it.
    val shared = scala.collection.mutable.LinkedHashMap[String, Array[Double]]()
    attached.values.foreach(_.components.externalRefs.foreach { case (_, r) =>
      if (!shared.contains(r.key) && r.store.contains(r.key))
        shared(r.key) = r.store.get(r.key)
    })
    if (shared.nonEmpty)
      Files.writeString(Paths.get(dir, Scaffold.SharedFile),
        Scaffold.toJson(shared.toMap, Map.empty))
  }

  /** Restore parameters into the already-attached models (structure is
    * code; state is data — mirrors scaffold.load's re-attach pattern:
    * the caller re-creates models AND re-links shared components, then
    * load refills internal values per model and shared values through
    * the live links into their ParamStore). */
  def load(dir: String): Unit = {
    attached.foreach { case (name, model) =>
      val path = Paths.get(dir, s"$name.json")
      if (Files.exists(path)) {
        val internal = Scaffold.parseInternal(Files.readString(path))
        model.components.setState(internal)
      }
    }
    val sharedPath = Paths.get(dir, Scaffold.SharedFile)
    if (Files.exists(sharedPath)) {
      val shared = Scaffold.parseInternal(Files.readString(sharedPath))
      attached.values.foreach(_.components.externalRefs.foreach { case (_, r) =>
        shared.get(r.key).foreach(v => r.store.set(r.key, v))
      })
    }
  }
}

object Scaffold {

  /** Reserved file for shared ParamStore values; "__" prefix keeps it
    * out of the model-name namespace. */
  private[model] val SharedFile = "__shared__.json"

  private[model] def toJson(internal: Map[String, Array[Double]],
                            external: Map[String, String]): String = {
    val ints = internal.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k": [${v.mkString(",")}]"""
    }.mkString(", ")
    val exts = external.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k": "$v""""
    }.mkString(", ")
    s"""{"internal": {$ints}, "external": {$exts}}"""
  }

  /** Minimal parser for the writer above (keys + double arrays). */
  private[model] def parseInternal(json: String): Map[String, Array[Double]] = {
    val body = "\"internal\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    "\"([^\"]+)\"\\s*:\\s*\\[([^\\]]*)\\]".r.findAllMatchIn(body).map { m =>
      val vals = m.group(2).split(",").filter(_.trim.nonEmpty).map(_.trim.toDouble)
      m.group(1) -> vals
    }.toMap
  }
}
