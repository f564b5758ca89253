package graft.model

/** Snapshot-mode SPI — the reference's `Snapshotter` contract
  * (`debezium-api/src/main/java/io/debezium/spi/snapshot/Snapshotter.java`)
  * with the stock mode implementations (debezium-core `snapshot.mode`
  * package): given
  * whether offsets exist and whether a previous snapshot completed, decide
  * whether to take a data snapshot, a schema snapshot, and whether to
  * stream afterwards. `Custom` accepts any user implementation — the SPI
  * half of `snapshot.mode = custom`.
  */
trait Snapshotter {
  def name: String
  def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean): Boolean
  def shouldSnapshotSchema(offsetsExist: Boolean, snapshotComplete: Boolean): Boolean =
    shouldSnapshotData(offsetsExist, snapshotComplete)
  def shouldStream: Boolean
}

object Snapshotter {

  /** ref `InitialSnapshotter`: snapshot once, then stream. */
  case object Initial extends Snapshotter {
    val name = "initial"
    def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean): Boolean =
      !(offsetsExist && snapshotComplete)
    val shouldStream = true
  }

  /** ref `InitialOnlySnapshotter`: snapshot once, never stream. */
  case object InitialOnly extends Snapshotter {
    val name = "initial_only"
    def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean): Boolean =
      !snapshotComplete
    val shouldStream = false
  }

  /** ref `AlwaysSnapshotter`: snapshot on every start, then stream. */
  case object Always extends Snapshotter {
    val name = "always"
    def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean) = true
    val shouldStream = true
  }

  /** ref `NoDataSnapshotter`: schema only, stream from the start. */
  case object NoData extends Snapshotter {
    val name = "no_data"
    def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean) = false
    override def shouldSnapshotSchema(offsetsExist: Boolean,
                                      snapshotComplete: Boolean) = true
    val shouldStream = true
  }

  /** ref `WhenNeededSnapshotter`: snapshot iff offsets are missing or the
    * previous snapshot never completed.
    */
  case object WhenNeeded extends Snapshotter {
    val name = "when_needed"
    def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean): Boolean =
      !offsetsExist || !snapshotComplete
    val shouldStream = true
  }

  /** ref `RecoverySnapshotter`: rebuild schema history only, stream data. */
  case object Recovery extends Snapshotter {
    val name = "recovery"
    def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean) = false
    override def shouldSnapshotSchema(offsetsExist: Boolean,
                                      snapshotComplete: Boolean) = true
    val shouldStream = true
  }

  /** ref `ConfigurationBasedSnapshotter`: every decision is a config bit. */
  final case class ConfigurationBased(snapshotData: Boolean,
                                      snapshotSchema: Boolean,
                                      stream: Boolean) extends Snapshotter {
    val name = "configuration_based"
    def shouldSnapshotData(offsetsExist: Boolean, snapshotComplete: Boolean): Boolean =
      snapshotData
    override def shouldSnapshotSchema(offsetsExist: Boolean,
                                      snapshotComplete: Boolean): Boolean =
      snapshotSchema
    val shouldStream = stream
  }
}
