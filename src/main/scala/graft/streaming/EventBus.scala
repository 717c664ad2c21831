package graft.streaming

import graft.core.EventRow
import scala.collection.mutable.ArrayBuffer

/** S15: in-process pub/sub with the reference's kind-prefix subscription
  * filter — `"*"` matches all, `"prefix*"` matches kinds starting with the
  * prefix, anything else matches exactly (store/eventbus.go:37-83).
  *
  * Driver-side utility (test harnesses, local wiring); distributed fan-out
  * goes through the Projector / bus sinks instead.
  */
class EventBus {
  private case class Sub(pattern: String, handler: EventRow => Unit)
  private val subs = ArrayBuffer[Sub]()

  def subscribe(pattern: String)(handler: EventRow => Unit): Unit =
    subs.synchronized { subs += Sub(pattern, handler); () }

  def publish(events: Seq[EventRow]): Unit = {
    val snapshot = subs.synchronized(subs.toVector)
    events.foreach { e =>
      snapshot.foreach { s =>
        if (EventBus.matches(s.pattern, e.kind)) s.handler(e)
      }
    }
  }
}

object EventBus {
  def matches(pattern: String, kind: String): Boolean =
    if (pattern == "*") true
    else if (pattern.endsWith("*")) kind.startsWith(pattern.dropRight(1))
    else kind == pattern
}
