package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Session, SessionEvent}

/** ScalaCheck laws for the session-merge kernel both stateful streaming
  * APIs share (EventStreams.mergeEvents). The load-bearing one is the
  * INCREMENTAL law: folding a chronologically-batched stream through
  * the kernel yields exactly the sessions a single pass computes — the
  * reason a multi-batch replay can match the batch fixpoint at all.
  * Pure JVM (no SparkSession), so hundreds of random streams run in
  * milliseconds.
  */
object SessionKernelProperties extends Properties("SessionKernel") {

  private val gapUs = 1000L // small gap so random streams split often

  private def ev(ts: Long, v: Long) =
    SessionEvent(1L, new java.sql.Timestamp(ts / 1000), ts, v)

  // strictly-increasing event times with gap-straddling jumps
  private val stream: Gen[List[SessionEvent]] =
    Gen.listOf(Gen.zip(Gen.choose(1L, 2500L), Gen.choose(-5L, 5L))).map { deltas =>
      var t = 0L
      deltas.map { case (d, v) => t += d; ev(t, v) }
    }

  /** Reference semantics: one-pass gaps-and-islands over the sorted
    * stream (the same algebra the graded q_stream_session runs). */
  private def reference(evs: List[SessionEvent]): List[Session] = {
    if (evs.isEmpty) Nil
    else {
      val sorted = evs.sortBy(_.ts_us)
      val out = scala.collection.mutable.ListBuffer.empty[Session]
      var cur = Session(1L, sorted.head.ts_us, sorted.head.ts_us, 1L,
        sorted.head.v_micros)
      sorted.tail.foreach { e =>
        if (e.ts_us - cur.session_end_us > gapUs) {
          out += cur
          cur = Session(1L, e.ts_us, e.ts_us, 1L, e.v_micros)
        } else cur = cur.copy(session_end_us = e.ts_us,
          n_events = cur.n_events + 1, sum_micros = cur.sum_micros + e.v_micros)
      }
      (out += cur).toList
    }
  }

  /** Fold the kernel over a batch split, then close the final open. */
  private def folded(batches: List[List[SessionEvent]]): List[Session] = {
    var open: Option[Session] = None
    val closed = scala.collection.mutable.ListBuffer.empty[Session]
    batches.foreach { b =>
      val (c, o) = EventStreams.mergeEvents(1L, open, b, gapUs)
      closed ++= c
      open = o
    }
    (closed ++ open).toList
  }

  // split a sorted stream into chronological batches at random cut points
  private def splits(evs: List[SessionEvent]): Gen[List[List[SessionEvent]]] =
    if (evs.isEmpty) Gen.const(Nil)
    else Gen.listOfN(evs.length, Gen.oneOf(false, true)).map { cuts =>
      val out = scala.collection.mutable.ListBuffer.empty[List[SessionEvent]]
      val buf = scala.collection.mutable.ListBuffer.empty[SessionEvent]
      evs.zip(cuts).foreach { case (e, cut) =>
        buf += e
        if (cut) { out += buf.toList; buf.clear() }
      }
      if (buf.nonEmpty) out += buf.toList
      out.toList
    }

  property("incremental law: any chronological batch split == one pass") =
    forAll(stream.flatMap(e => splits(e).map(e -> _))) { case (evs, batched) =>
      folded(batched) == reference(evs)
    }

  property("single-batch fold == one pass") = forAll(stream) { evs =>
    folded(List(evs)) == reference(evs)
  }

  property("sessions partition the events: counts and sums conserved") =
    forAll(stream) { evs =>
      val ss = reference(evs)
      ss.map(_.n_events).sum == evs.length &&
        ss.map(_.sum_micros).sum == evs.map(_.v_micros).sum
    }

  property("no session straddles a gap; consecutive sessions are > gap apart") =
    forAll(stream) { evs =>
      val ss = reference(evs)
      ss.sliding(2).forall {
        case List(a, b) => b.session_start_us - a.session_end_us > gapUs
        case _          => true
      }
    }
}
