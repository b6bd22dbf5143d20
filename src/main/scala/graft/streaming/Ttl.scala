package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Idle-key state TTL for the `flatMapGroupsWithState` operators — the
 * analog of the reference's `StateTtlConfig`
 * (`flink-core/.../StateTtlConfig.java:51`, update type
 * OnCreateAndWrite): per-key PAYLOADS are already bounded (watermark
 * eviction inside each operator's state), but the KEYSPACE is not — at
 * scale, keys that stop receiving traffic would otherwise accumulate
 * state-store entries forever.
 *
 * When `ttl` is set (a duration string, e.g. "1 hour") the operator
 * runs with `ProcessingTimeTimeout`; every data invocation re-arms the
 * key's timer, and a key idle past the TTL has its whole state dropped
 * on the next micro-batch — including any rows still buffered for
 * watermark release, which is the documented TTL trade-off (the
 * reference likewise clears live-but-idle state). `None` (the default)
 * keeps the exact pre-TTL behavior.
 */
private[streaming] object Ttl {

  def timeoutConf(ttl: Option[String]): GroupStateTimeout =
    if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val unitMicros: Map[String, Long] = Map(
    "microsecond" -> 1L, "millisecond" -> 1000L, "second" -> 1000000L,
    "minute" -> 60L * 1000000L, "hour" -> 3600L * 1000000L,
    "day" -> 86400L * 1000000L)

  private def micros(s: String): Option[Long] =
    "^\\s*(\\d+)\\s*([a-zA-Z]+?)s?\\s*$".r.findFirstMatchIn(s).flatMap { m =>
      unitMicros.get(m.group(2).toLowerCase).map(_ * m.group(1).toLong)
    }

  /** Validate a TTL against the operator's watermark delay: a TTL
   * shorter than the watermark delay can expire a key while rows are
   * still buffered awaiting watermark release, silently dropping
   * matches/windows (the documented trade-off). Loudly warn so it
   * cannot be hit by accident. */
  def guard(ttl: Option[String], watermarkDelay: String): Unit =
    for (t <- ttl; tm <- micros(t); wm <- micros(watermarkDelay))
      if (tm < wm) log.warn(
        s"state TTL '$t' is shorter than the watermark delay " +
        s"'$watermarkDelay': idle keys may drop rows still buffered for " +
        "watermark release; use a TTL >= the watermark delay")

  /** Wrap a state-op body with TTL expiry + per-invocation re-arm. */
  def wrap[K, T, S, O](ttl: Option[String])(
      body: (K, Iterator[T], GroupState[S]) => Iterator[O])
      : (K, Iterator[T], GroupState[S]) => Iterator[O] =
    (k, it, state) =>
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val out = body(k, it, state)
        ttl.foreach(state.setTimeoutDuration)
        out
      }
}
