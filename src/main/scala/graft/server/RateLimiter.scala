package graft.server

import java.util.concurrent.atomic.AtomicLong

/** Per-tenant rate limiting and quota management — a faithful port of the
  * reference's token-bucket module (src/rate_limit.rs:1-330), which the
  * reference DEFINES but never wires into a handler; here it is wired into
  * [[HttpApi]] (query routes consume a query slot + RPS token, ingest routes
  * consume write RPS + bytes tokens; denials surface as HTTP 429 with
  * Retry-After). Reference semantics kept exactly, including the quirks:
  *
  *  - refill adds whole tokens from elapsed time and only resets the refill
  *    clock when ≥1 token accrued (fractional progress is never discarded,
  *    rate_limit.rs:91-103);
  *  - a write that passes the RPS bucket but fails the bytes bucket does NOT
  *    return its RPS token (rate_limit.rs:199-221);
  *  - `setTenantQuota` replaces the limiter wholesale — buckets restart full
  *    (rate_limit.rs:191-197).
  *
  * The storage/index quota fields exist for config parity; nothing enforces
  * them here (nothing does in the reference either — no call site).
  */
object RateLimiter {

  /** Reference defaults (rate_limit.rs:31-42). */
  final case class TenantQuota(maxWriteRps: Long = 10000L,
                               maxWriteBytesPerSec: Long = 100L << 20,
                               maxQueryRps: Long = 1000L,
                               maxConcurrentQueries: Long = 100L,
                               maxStorageBytes: Long = 1L << 40,
                               maxIndexes: Int = 50)

  sealed trait Result { def isAllowed: Boolean = this == Allowed }
  case object Allowed extends Result
  final case class Denied(denial: Denial) extends Result

  sealed trait Denial { def message: String; def retryAfterMs: Long }
  final case class WriteRpsExceeded(limit: Long, retryAfterMs: Long) extends Denial {
    def message = s"write rate limit exceeded ($limit req/s)"
  }
  final case class WriteBytesExceeded(limit: Long, retryAfterMs: Long) extends Denial {
    def message = s"write byte rate limit exceeded ($limit bytes/s)"
  }
  final case class QueryRpsExceeded(limit: Long, retryAfterMs: Long) extends Denial {
    def message = s"query rate limit exceeded ($limit req/s)"
  }
  final case class ConcurrentQueriesExceeded(current: Long, max: Long) extends Denial {
    def message = s"concurrent query limit exceeded ($current of $max)"
    def retryAfterMs = 0L
  }

  final case class TenantUsage(writeRpsAvailable: Long, writeBytesAvailable: Long,
                               queryRpsAvailable: Long, concurrentQueries: Long,
                               quota: TenantQuota)

  /** Token bucket (rate_limit.rs:45-107): starts full, CAS-decrement acquire,
    * continuous refill at `refillRate` tokens/sec capped at `capacity`.
    */
  private final class TokenBucket(capacity: Long, refillRate: Long, nanoTime: () => Long) {
    private val tokens = new AtomicLong(capacity)
    private var lastRefillNs = nanoTime()

    def tryAcquire(n: Long): Boolean = {
      refill()
      var ok = false
      var done = false
      while (!done) {
        val cur = tokens.get()
        if (cur < n) { done = true }
        else if (tokens.compareAndSet(cur, cur - n)) { ok = true; done = true }
      }
      ok
    }

    private def refill(): Unit = synchronized {
      val elapsed = nanoTime() - lastRefillNs
      val fresh = (elapsed / 1e9 * refillRate).toLong
      if (fresh > 0) { // only then reset the clock: fractional accrual survives
        var done = false
        while (!done) {
          val cur = tokens.get()
          done = tokens.compareAndSet(cur, math.min(cur + fresh, capacity))
        }
        lastRefillNs = nanoTime()
      }
    }

    def available(): Long = { refill(); tokens.get() }
  }

  private final class Tenant(val quota: TenantQuota, nanoTime: () => Long) {
    val writeRps = new TokenBucket(quota.maxWriteRps, quota.maxWriteRps, nanoTime)
    val writeBytes =
      new TokenBucket(quota.maxWriteBytesPerSec, quota.maxWriteBytesPerSec, nanoTime)
    val queryRps = new TokenBucket(quota.maxQueryRps, quota.maxQueryRps, nanoTime)
    val concurrentQueries = new AtomicLong(0)
  }
}

final class RateLimiter(defaultQuota: RateLimiter.TenantQuota = RateLimiter.TenantQuota(),
                        nanoTime: () => Long = () => System.nanoTime()) {
  import RateLimiter._

  private val tenants =
    new java.util.concurrent.ConcurrentHashMap[String, Tenant]()

  private def tenant(id: String): Tenant =
    tenants.computeIfAbsent(id, _ => new Tenant(defaultQuota, nanoTime))

  /** Replace a tenant's quota; buckets restart full (rate_limit.rs:191-197). */
  def setTenantQuota(id: String, quota: TenantQuota): Unit =
    tenants.put(id, new Tenant(quota, nanoTime))

  /** Write admission: 1 RPS token + `bytes` byte tokens (rate_limit.rs:199-225). */
  def checkWrite(id: String, bytes: Long): Result = {
    val t = tenant(id)
    if (!t.writeRps.tryAcquire(1))
      Denied(WriteRpsExceeded(t.quota.maxWriteRps, 1000L / math.max(t.quota.maxWriteRps, 1)))
    else if (!t.writeBytes.tryAcquire(bytes))
      Denied(WriteBytesExceeded(t.quota.maxWriteBytesPerSec,
        bytes * 1000L / math.max(t.quota.maxWriteBytesPerSec, 1)))
    else Allowed
  }

  /** Query admission: 1 RPS token + a concurrent slot; the caller MUST pair an
    * Allowed with `queryCompleted` (rate_limit.rs:227-255).
    */
  def checkQuery(id: String): Result = {
    val t = tenant(id)
    if (!t.queryRps.tryAcquire(1))
      return Denied(QueryRpsExceeded(t.quota.maxQueryRps, 1000L / math.max(t.quota.maxQueryRps, 1)))
    val current = t.concurrentQueries.getAndIncrement()
    if (current >= t.quota.maxConcurrentQueries) {
      t.concurrentQueries.decrementAndGet()
      Denied(ConcurrentQueriesExceeded(current, t.quota.maxConcurrentQueries))
    } else Allowed
  }

  def queryCompleted(id: String): Unit = {
    val t = tenants.get(id)
    if (t != null) t.concurrentQueries.decrementAndGet()
    ()
  }

  def getUsage(id: String): Option[TenantUsage] =
    Option(tenants.get(id)).map(t => TenantUsage(
      t.writeRps.available(), t.writeBytes.available(), t.queryRps.available(),
      t.concurrentQueries.get(), t.quota))
}
