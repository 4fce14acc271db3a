package graft.model

import scala.collection.mutable

/** Shared parameter storage for external component links (reference:
  * Component_Map pass-by-reference entries, core/component_map.py:92-147
  * — two models holding the same `Parameter`). */
final class ParamStore {
  private val m = mutable.Map[String, Array[Double]]()
  def get(key: String): Array[Double] = m(key)
  def set(key: String, v: Array[Double]): Unit = m(key) = v
  def contains(key: String): Boolean = m.contains(key)
}

final case class ComponentRef(store: ParamStore, key: String)

/** U5 Component_Map (core/component_map.py:5-183): named parameters
  * split into *internal* (owned) and *external* (pass-by-reference
  * links into a shared ParamStore). Reads/writes route transparently;
  * `getState` serializes internal values + external link names so a
  * reload can re-wire sharing (component_map.py:170-183).
  */
final class ComponentMap {
  private val internalM = mutable.Map[String, Array[Double]]()
  private val externalM = mutable.Map[String, ComponentRef]()

  def apply(key: String): Array[Double] =
    externalM.get(key).map(r => r.store.get(r.key)).getOrElse(internalM(key))

  def update(key: String, v: Array[Double]): Unit =
    externalM.get(key) match {
      case Some(r) => r.store.set(r.key, v)
      case None    => internalM(key) = v
    }

  def link(key: String, ref: ComponentRef): Unit = {
    internalM.remove(key)
    externalM(key) = ref
  }

  def keys: Seq[String] = (internalM.keySet ++ externalM.keySet).toSeq.sorted

  /** (internal values, external link names) — the serializable state. */
  def getState: (Map[String, Array[Double]], Map[String, String]) =
    (internalM.toMap, externalM.map { case (k, r) => k -> r.key }.toMap)

  def setState(internal: Map[String, Array[Double]]): Unit =
    internal.foreach { case (k, v) => update(k, v) }
}

object ComponentMap {
  def of(params: (String, Array[Double])*): ComponentMap = {
    val cm = new ComponentMap
    params.foreach { case (k, v) => cm(k) = v }
    cm
  }
}
