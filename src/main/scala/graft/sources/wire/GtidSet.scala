package graft.sources.wire

/** MySQL GTID set — the `uuid:1-5:7,uuid2:1-3` executed-transaction
  * algebra the connector resumes and filters by (reference
  * `debezium-connector-binlog/src/main/java/io/debezium/connector/binlog/
  * gtid/GtidSet.java` + `debezium-connector-mysql/.../gtid/
  * MySqlGtidSet.java`). Immutable; interval lists are kept sorted,
  * coalesced, and INCLUSIVE (the binlog wire form is end-exclusive —
  * `PreviousGtids` decode converts).
  *
  * The operations mirror the reference surface: `contains` (one gtid),
  * `isContainedWithin` (resume-position validity), `subtract` (the
  * events a failover replica is missing), `retainAll` (the
  * `gtid.source.includes`/`excludes` server-UUID filter), `add`
  * (advance by one executed gtid).
  */
final class GtidSet private (val sets: Map[String, Seq[(Long, Long)]]) {

  def isEmpty: Boolean = sets.isEmpty

  def contains(sid: String, gno: Long): Boolean =
    sets.getOrElse(sid.toLowerCase, Nil)
      .exists { case (a, b) => gno >= a && gno <= b }

  /** Every interval of every server here lies inside `other` — the
    * reference's resume-position check (`MySqlGtidSet.isContainedWithin`).
    */
  def isContainedWithin(other: GtidSet): Boolean =
    sets.forall { case (sid, ivs) =>
      val theirs = other.sets.getOrElse(sid, Nil)
      ivs.forall { case (a, b) =>
        theirs.exists { case (c, d) => a >= c && b <= d }
      }
    }

  /** GTIDs in this set but not in `other` (`MySqlGtidSet.subtract`). */
  def subtract(other: GtidSet): GtidSet = GtidSet(
    sets.flatMap { case (sid, ivs) =>
      val theirs = other.sets.getOrElse(sid, Nil)
      val remaining = ivs.flatMap { case (a, b) =>
        // carve each of their intervals out of [a, b]
        theirs.foldLeft(Seq((a, b))) { (acc, cut) =>
          acc.flatMap { case (x, y) =>
            val (c, d) = cut
            if (d < x || c > y) Seq((x, y))
            else Seq((x, c - 1), (d + 1, y)).filter(p => p._1 <= p._2)
          }
        }
      }
      if (remaining.isEmpty) None else Some(sid -> GtidSet.norm(remaining))
    })

  /** Keep only servers whose UUID satisfies the filter — the
    * `gtid.source.includes` / `gtid.source.excludes` projection
    * (`MySqlGtidSet.retainAll`).
    */
  def retainAll(keep: String => Boolean): GtidSet =
    GtidSet(sets.filter { case (sid, _) => keep(sid) })

  def add(sid: String, gno: Long): GtidSet = {
    val k = sid.toLowerCase
    GtidSet(sets.updated(k, GtidSet.norm(sets.getOrElse(k, Nil) :+ (gno, gno))))
  }

  /** Canonical text: servers sorted, intervals ascending, single-point
    * intervals render without the dash (`uuid:1-5:7`).
    */
  def text: String =
    sets.toSeq.sortBy(_._1).map { case (sid, ivs) =>
      sid + ":" + ivs.map { case (a, b) =>
        if (a == b) s"$a" else s"$a-$b"
      }.mkString(":")
    }.mkString(",")

  override def equals(other: Any): Boolean = other match {
    case g: GtidSet => sets == g.sets
    case _          => false
  }
  override def hashCode: Int = sets.hashCode
  override def toString: String = s"GtidSet($text)"
}

object GtidSet {

  /** The ONLY constructor — normalizes every server UUID to lowercase
    * and sorts/coalesces intervals, so a set built directly from
    * uppercase `SHOW MASTER STATUS` output behaves identically to one
    * parsed or decoded off the wire (a raw mixed-case map would
    * silently fail every membership/containment lookup).
    */
  def apply(sets: Map[String, Seq[(Long, Long)]]): GtidSet =
    new GtidSet(sets.map { case (k, v) => k.toLowerCase -> norm(v) })

  val empty: GtidSet = GtidSet(Map.empty)

  /** Sort + coalesce adjacent/overlapping inclusive intervals. */
  private[wire] def norm(ivs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ivs.sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((a, b) :: tail, (c, d)) if c <= b + 1 =>
        (a, math.max(b, d)) :: tail
      case (acc, iv) => iv :: acc
    }.reverse

  /** Parse the canonical text form (whitespace/newline tolerant, as the
    * reference strips `\n`/`\r` from SHOW MASTER STATUS output).
    */
  def parse(s: String): GtidSet = {
    val cleaned = s.replace("\n", "").replace("\r", "").trim
    if (cleaned.isEmpty) empty
    else GtidSet(cleaned.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
      val pieces = part.split(":")
      val sid = pieces.head.toLowerCase
      val ivs = pieces.tail.toSeq.map { r =>
        r.split("-") match {
          case Array(a)    => (a.trim.toLong, a.trim.toLong)
          case Array(a, b) => (a.trim.toLong, b.trim.toLong)
          case _ => throw new IllegalArgumentException(s"bad interval '$r'")
        }
      }
      sid -> norm(ivs)
    }.toMap)
  }

  /** Source filter from the reference's `gtid.source.includes` /
    * `gtid.source.excludes` keys: comma-separated regexes over server
    * UUIDs; includes wins if both set (the reference validates they are
    * mutually exclusive — here includes takes precedence).
    */
  def sourceFilter(includes: Option[String],
                   excludes: Option[String]): String => Boolean = {
    def regexes(s: String) =
      s.split(",").map(_.trim).filter(_.nonEmpty).map(_.r)
    (includes, excludes) match {
      case (Some(inc), _) =>
        val rs = regexes(inc); sid => rs.exists(_.matches(sid))
      case (None, Some(exc)) =>
        val rs = regexes(exc); sid => !rs.exists(_.matches(sid))
      case _ => _ => true
    }
  }
}
