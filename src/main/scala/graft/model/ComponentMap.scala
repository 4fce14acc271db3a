package graft.model

import scala.collection.mutable

/** Shared parameter storage for external component links (reference:
  * Component_Map pass-by-reference entries, core/component_map.py:92-147
  * — two models holding the same `Parameter`). */
final class ParamStore {
  private val m = mutable.Map[String, Array[Double]]()
  private val frozenS = mutable.Set[String]()
  def get(key: String): Array[Double] = m(key)
  def set(key: String, v: Array[Double]): Unit = m(key) = v
  def contains(key: String): Boolean = m.contains(key)
  def freeze(key: String): Unit = frozenS += key
  def unfreeze(key: String): Unit = frozenS -= key
  def isFrozen(key: String): Boolean = frozenS(key)
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

  /** Freeze components against fit updates — the analogue of the
    * reference's `requires_grad = False` (model.py:424-452). Empty =
    * all. The flag lives with the PARAMETER: freezing an external
    * (shared) component marks it in the shared ParamStore, so every
    * model linking that parameter sees it frozen — exactly how a
    * shared torch Parameter's requires_grad behaves. */
  private val frozenLocal = mutable.Set[String]()
  def freeze(componentNames: Seq[String] = Seq.empty): Unit =
    (if (componentNames.isEmpty) keys else componentNames).foreach { k =>
      externalM.get(k) match {
        case Some(r) => r.store.freeze(r.key)
        case None    => frozenLocal += k
      }
    }
  def unfreeze(componentNames: Seq[String] = Seq.empty): Unit =
    (if (componentNames.isEmpty) keys else componentNames).foreach { k =>
      externalM.get(k) match {
        case Some(r) => r.store.unfreeze(r.key)
        case None    => frozenLocal -= k
      }
    }
  def isFrozen(key: String): Boolean =
    externalM.get(key).map(r => r.store.isFrozen(r.key)).getOrElse(frozenLocal(key))
  def frozenKeys: Seq[String] = keys.filter(isFrozen)

  /** (internal values, external link names) — the serializable state. */
  def getState: (Map[String, Array[Double]], Map[String, String]) =
    (internalM.toMap, externalM.map { case (k, r) => k -> r.key }.toMap)

  /** The live external links — Scaffold needs the refs themselves to
    * persist/restore SHARED parameter values (linking removes a key
    * from the internal map, so no single model's state carries it). */
  def externalRefs: Map[String, ComponentRef] = externalM.toMap

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
