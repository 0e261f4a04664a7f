package graft.functions

/** Minimal open-addressing hash set for primitive longs — executor-hot-path
  * membership tests with ZERO boxing/allocation per lookup (a
  * `java.util.HashSet[java.lang.Long]` boxes every `contains`, which at
  * 10^12-doc scale is the allocator saturation this exists to avoid).
  * 0 is reserved as the empty slot marker (callers hash through
  * `LongHashSet.mix` which never yields 0 for real keys in practice; a
  * literal 0 key is remapped). Build once, read-only after; serializable
  * for broadcast. */
final class LongHashSet(expected: Int) extends Serializable {
  private val cap = {
    var c = 16
    while (c < expected * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val slots = new Array[Long](cap)
  private var n = 0

  private def remap(k: Long): Long = if (k == 0L) 0x9e3779b97f4a7c15L else k

  def add(key0: Long): Unit = {
    val key = remap(key0)
    var i = (LongHashSet.mix(key) & mask).toInt
    while (slots(i) != 0L) {
      if (slots(i) == key) return
      i = (i + 1) & mask
    }
    require(n < cap - 1, "LongHashSet over capacity")
    slots(i) = key
    n += 1
  }

  def contains(key0: Long): Boolean = {
    val key = remap(key0)
    var i = (LongHashSet.mix(key) & mask).toInt
    while (slots(i) != 0L) {
      if (slots(i) == key) return true
      i = (i + 1) & mask
    }
    false
  }

  def size: Int = n
}

object LongHashSet {
  /** splitmix64 finalizer — spreads poly-hash keys across slots. */
  def mix(z0: Long): Long = {
    var z = z0 * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Open-addressing long → AnyRef map, same zero-allocation contract as
  * LongHashSet (a `java.util.HashMap[java.lang.Long, _]` boxes every get).
  * Build once, read-only after; serializable for broadcast. */
final class LongKeyMap[V <: AnyRef](expected: Int) extends Serializable {
  private val cap = {
    var c = 16
    while (c < expected * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val vals = new Array[AnyRef](cap)
  private var n = 0

  private def remap(k: Long): Long = if (k == 0L) 0x9e3779b97f4a7c15L else k

  def put(key0: Long, v: V): Unit = {
    val key = remap(key0)
    var i = (LongHashSet.mix(key) & mask).toInt
    while (keys(i) != 0L && keys(i) != key) i = (i + 1) & mask
    if (keys(i) == 0L) { require(n < cap - 1); keys(i) = key; n += 1 }
    vals(i) = v
  }

  /** null when absent — hot-path lookup, zero allocation. */
  def get(key0: Long): V = {
    val key = remap(key0)
    var i = (LongHashSet.mix(key) & mask).toInt
    while (keys(i) != 0L) {
      if (keys(i) == key) return vals(i).asInstanceOf[V]
      i = (i + 1) & mask
    }
    null.asInstanceOf[V]
  }

  def size: Int = n
}
