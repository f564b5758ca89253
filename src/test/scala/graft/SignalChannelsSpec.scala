package graft

import java.lang.management.ManagementFactory
import javax.management.{Notification => JmxNotification, NotificationListener}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JmxChannels

class SignalChannelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("JMX signal channel: MBeanServer.invoke round-trips to action rows") {
    val chan = new JmxChannels.SignalChannel("graft", "spec").register()
    try {
      val mbs = ManagementFactory.getPlatformMBeanServer
      assert(mbs.isRegistered(chan.objectName))
      def send(id: String, tpe: String, data: String): Unit =
        mbs.invoke(chan.objectName, "signal", Array[AnyRef](id, tpe, data),
          Array("java.lang.String", "java.lang.String", "java.lang.String")): Unit
      send("j-1", "execute-snapshot",
        """{"data-collections":["orders"],"type":"incremental"}""")
      send("j-2", "nonsense", "{}")
      val rows = chan.read(spark).orderBy("signal_id").collect()
      assert(rows.map(_.getAs[String]("action")).toSeq ==
        Seq("execute-snapshot", "ignore"))
      assert(rows(0).getAs[String]("collection") == "orders")
      // queue drained: a second read is empty until new signals arrive
      assert(chan.read(spark).count() == 0)
      send("j-3", "log", """{"message":"x"}""")
      assert(chan.read(spark).count() == 1)
    } finally chan.close()
    assert(!ManagementFactory.getPlatformMBeanServer
      .isRegistered(chan.objectName))
  }

  test("in-process channel queues programmatic signals") {
    val chan = new JmxChannels.InProcessSignalChannel
    chan.signal("p-1", "pause-snapshot", "{}")
    chan.signal("p-2", "resume-snapshot", "{}")
    val rows = chan.read(spark).orderBy("signal_id").collect()
    assert(rows.map(_.getAs[String]("action")).toSeq ==
      Seq("pause-snapshot", "resume-snapshot"))
  }

  test("JMX notification channel: retained list + push to JMX listeners") {
    val chan = new JmxChannels.NotificationChannel("graft", "spec").register()
    try {
      val mbs = ManagementFactory.getPlatformMBeanServer
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new NotificationListener {
        override def handleNotification(n: JmxNotification,
                                        handback: Any): Unit = {
          got.add(s"${n.getType}|${n.getUserData}"); ()
        }
      }
      mbs.addNotificationListener(chan.objectName, listener, null, null)
      chan.send("Incremental Snapshot", "snapshot-started",
        """{"aggregateType":"Incremental Snapshot"}""")
      // push-style delivery through the MBean server
      assert(got.size == 1)
      assert(got.peek().startsWith("debezium.notification|"))
      // pull-style: retained on the MXBean attribute and as a frame
      // MXBean open-type mapping renders List<String> as String[]
      val attr = mbs.getAttribute(chan.objectName, "Notifications")
        .asInstanceOf[Array[String]]
      assert(attr.length == 1 && attr(0).contains("Incremental Snapshot"))
      assert(chan.read(spark).count() == 1)
      mbs.removeNotificationListener(chan.objectName, listener)
    } finally chan.close()
  }

  test("watermark windows pair open/close by id; pending opens dedup nothing") {
    import spark.implicits._
    val signals = Seq(
      (100L, "w1", "snapshot-window-open"),
      (250L, "w1", "snapshot-window-close"),
      (300L, "w2", "snapshot-window-open"),
      // w2 closes twice (redelivery): the FIRST observed close wins
      (420L, "w2", "snapshot-window-close"),
      (460L, "w2", "snapshot-window-close"),
      (500L, "w3", "snapshot-window-open"), // pending: no close yet
      (600L, "w4", "execute-snapshot")      // non-window signals ignored
    ).toDF("pos", "id", "type")
    val w = graft.operators.IncrementalSnapshot.watermarkWindows(signals)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(w == Map("w1" -> ((100L, 250L)), "w2" -> ((300L, 420L))))
  }
}
