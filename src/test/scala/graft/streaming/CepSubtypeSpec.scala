package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ADT event hierarchy for subtype patterns (reference
 * `Pattern.subtype`, `Pattern.java:196`). */
sealed trait Sig { def who: Long; def ts: Long; def sid: Long }
final case class SClick(who: Long, ts: Long, sid: Long, page: String) extends Sig
final case class SBuy(who: Long, ts: Long, sid: Long, amount: Double) extends Sig
final case class SPing(who: Long, ts: Long, sid: Long) extends Sig

/** CEP subtype() steps: type-narrowed conditions over an ADT event
 * stream, batch and streaming (kryo-encoded via runBoundByF). */
class CepSubtypeSpec extends SparkSuite {

  private val pattern = Cep.Pattern.of[Sig]("click", {
      case c: SClick => c.page == "checkout"
      case _ => false
    })
    .followedBySubtype[SBuy]("buy", _.amount > 10.0)
    .within(1000000L)

  test("subtype steps narrow by runtime type AND condition (batch matcher)") {
    val events = IndexedSeq[Sig](
      SClick(1, 0, 1, "checkout"),
      SPing(1, 10, 2),             // skipped by relaxed contiguity
      SBuy(1, 20, 3, 5.0),         // SBuy but fails the amount condition
      SBuy(1, 30, 4, 25.0),        // first qualifying subtype event
      SClick(1, 40, 5, "home"))    // start condition fails
    val ms = Cep.matchSortedG[Sig](events, pattern, _.ts, _.sid)
    assert(ms.map(_.binds.map(_.ev.sid)) == List(List(1L, 4L)))
    // the bound event really is the subtype instance
    assert(ms.head.binds(1).ev.asInstanceOf[SBuy].amount == 25.0)
  }

  test("subtype pattern composes with the streaming entry (runBoundByF, kryo ADT)") {
    implicit val sql = spark.sqlContext
    implicit val sigEnc: Encoder[Sig] = Encoders.kryo[Sig]
    val ms = MemoryStream[Sig]
    val out = Cep.runBoundByF[Sig](ms.toDS(), pattern, _.who.toString, _.ts, _.sid)
    val q = out.writeStream.format("memory").queryName("t_subtype")
      .outputMode("append").start()
    try {
      ms.addData(SClick(7, 100, 1, "checkout"), SBuy(7, 150, 2, 3.0))
      q.processAllAvailable()
      ms.addData(SBuy(7, 200, 3, 99.0), SClick(8, 100, 4, "checkout"), SPing(8, 300, 5))
      q.processAllAvailable()
      implicit val outEnc: Encoder[CepBoundG[Sig]] = Encoders.kryo[CepBoundG[Sig]]
      val got = spark.table("t_subtype").as[CepBoundG[Sig]].collect().toList
      assert(got.map(m => (m.key, m.binds.map(_.ev.sid))) == List(("7", List(1L, 3L))))
      assert(got.head.binds(1).ev.asInstanceOf[SBuy].amount == 99.0)
    } finally q.stop()
  }
}
