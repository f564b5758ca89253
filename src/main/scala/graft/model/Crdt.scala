package graft.model

/** Mergeable monitoring counters (SURVEY §1.4; reference
  * `crdt/GCounter.java`, `PNCounter.java`): grow-only and
  * positive-negative counters whose merge is an idempotent, commutative
  * join — the right shape for cross-executor metric aggregation where
  * double-delivery must not double-count.
  */
object Crdt {

  /** Grow-only counter: per-replica maxima. */
  final case class GCounter(counts: Map[String, Long] = Map.empty) {
    def increment(replica: String, by: Long = 1): GCounter =
      copy(counts.updated(replica, counts.getOrElse(replica, 0L) + by))
    def value: Long = counts.values.sum
    def merge(other: GCounter): GCounter =
      GCounter((counts.keySet ++ other.counts.keySet).map { k =>
        k -> math.max(counts.getOrElse(k, 0L), other.counts.getOrElse(k, 0L))
      }.toMap)
  }

  /** Positive-negative counter: two G-counters. */
  final case class PNCounter(p: GCounter = GCounter(), n: GCounter = GCounter()) {
    def increment(replica: String, by: Long = 1): PNCounter =
      copy(p = p.increment(replica, by))
    def decrement(replica: String, by: Long = 1): PNCounter =
      copy(n = n.increment(replica, by))
    def value: Long = p.value - n.value
    def merge(other: PNCounter): PNCounter =
      PNCounter(p.merge(other.p), n.merge(other.n))
  }
}
