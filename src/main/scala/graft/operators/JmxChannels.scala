package graft.operators

import java.lang.management.ManagementFactory
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import javax.management.{Notification => JmxNotification,
  NotificationBroadcasterSupport, ObjectName}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JMX + in-process control-plane channels (SURVEY S13/P6/P7; reference
  * `pipeline/signal/channels/jmx/JmxSignalChannel.java`,
  * `pipeline/signal/channels/process/InProcessSignalChannel.java`,
  * `pipeline/notification/channels/jmx/JmxNotificationChannel.java`,
  * object naming `pipeline/JmxUtils.java:30` —
  * `debezium.<connector>:type=management,context=<ctx>,server=<name>`).
  *
  * These are DRIVER-side control surfaces: an operator (or an external
  * JMX console over the standard RMI connector) invokes the MXBean's
  * `signal(id, type, data)` operation, the channel queues it, and the
  * engine's poll loop drains the queue into the same `Signals.parse`
  * action rows every other channel produces. Registration goes through
  * the REAL platform MBean server, so the spec can drive the channel
  * through `MBeanServer.invoke` — the identical code path a remote JMX
  * client exercises.
  */
object JmxChannels {

  /** The MXBean operation surface (ref `JmxSignalChannelMXBean.java`).
    * Must be a public interface named <impl>MXBean for the platform
    * server's MXBean introspection.
    */
  trait SignalChannelMXBean {
    def signal(id: String, `type`: String, data: String): Unit
  }

  class SignalChannel(connector: String, server: String)
      extends SignalChannelMXBean {
    private[JmxChannels] val queue =
      new ConcurrentLinkedQueue[(String, String, String)]()
    val objectName = new ObjectName(
      s"debezium.$connector:type=management,context=signals,server=$server")

    override def signal(id: String, `type`: String, data: String): Unit = {
      queue.add((id, `type`, data)); ()
    }

    def register(): this.type = {
      ManagementFactory.getPlatformMBeanServer
        .registerMBean(this, objectName)
      this
    }

    def close(): Unit =
      ManagementFactory.getPlatformMBeanServer.unregisterMBean(objectName)

    /** Drain every queued signal into parsed action rows (the reference
      * polls one record per read; draining per micro-batch is the same
      * stream, batched the Spark way).
      */
    def read(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val drained = Iterator.continually(queue.poll())
        .takeWhile(_ != null).toSeq
      Signals.parse(drained.toDF("id", "type", "data"))
    }
  }

  /** In-process channel (ref `InProcessSignalChannel.java`): the same
    * queue contract without the MBean hop — the embedded-engine API for
    * programmatic signals.
    */
  class InProcessSignalChannel {
    private val queue = new ConcurrentLinkedQueue[(String, String, String)]()
    def signal(id: String, tpe: String, data: String): Unit = {
      queue.add((id, tpe, data)); ()
    }
    def read(spark: SparkSession): DataFrame = {
      import spark.implicits._
      Signals.parse(Iterator.continually(queue.poll())
        .takeWhile(_ != null).toSeq.toDF("id", "type", "data"))
    }
  }

  trait NotificationChannelMXBean {
    def getNotifications: java.util.List[String]
  }

  /** JMX notification channel (ref `JmxNotificationChannel.java:28-60`):
    * every engine notification is retained on the MXBean attribute AND
    * broadcast as a `debezium.notification`-typed JMX notification with
    * the JSON payload as user data — a standard JMX listener (local or
    * remote) receives them push-style.
    */
  class NotificationChannel(connector: String, server: String)
      extends NotificationBroadcasterSupport with NotificationChannelMXBean {
    val DebeziumNotificationType = "debezium.notification"
    private val retained = new ConcurrentLinkedQueue[String]()
    private val seq = new AtomicLong(0)
    val objectName = new ObjectName(
      s"debezium.$connector:type=management,context=notifications,server=$server")

    override def getNotifications: java.util.List[String] =
      new java.util.ArrayList(retained)

    def register(): this.type = {
      ManagementFactory.getPlatformMBeanServer
        .registerMBean(this, objectName)
      this
    }

    def close(): Unit =
      ManagementFactory.getPlatformMBeanServer.unregisterMBean(objectName)

    def send(aggregateType: String, notificationType: String,
             json: String): Unit = {
      retained.add(json)
      val n = new JmxNotification(DebeziumNotificationType, this,
        seq.getAndIncrement(), s"$aggregateType generated a notification")
      n.setUserData(json)
      sendNotification(n)
    }

    /** Retained notifications as a frame (for the queryable-table half
      * the engine's other notification channel provides).
      */
    def read(spark: SparkSession): DataFrame = {
      import spark.implicits._
      retained.asScala.toSeq.toDF("json")
    }
  }
}
