package graft.operators

/** Shared HTTP plumbing for the service transports ([[EmbedService]],
  * [[MediaService]]) — one place that gets the transport failure modes
  * right (r10 prescription: the fault matrix below is pinned by
  * ServiceHttpSpec against real loopback sockets):
  *
  *  - FULL-exchange deadline: java.net.http's request `.timeout()` only
  *    covers up to receipt of the response HEADERS — a server that stalls
  *    MID-BODY would hang the Spark task forever. `sendAsync` +
  *    `orTimeout` bounds the header wait and the body streaming under one
  *    deadline.
  *  - Backpressure retry: 429/503 are a model fleet saying "later", not a
  *    broken batch — bounded exponential backoff (honoring a numeric
  *    `Retry-After` seconds header) runs INSIDE the transport, so the
  *    caller's fail-soft skip machinery only sees genuine failures.
  *  - Everything else — connection refused/reset, malformed responses,
  *    other non-2xx — throws immediately: per-batch skip policy and the
  *    consecutive-failure dead-backend threshold belong to the caller.
  */
object HttpSupport {

  /** POST `body` as JSON to `uri`; returns the response body. Retries
    * 429/503 up to `maxRetries` times with exponential backoff starting
    * at `retryBaseMillis` (a numeric Retry-After header overrides the
    * computed backoff). `what` prefixes error messages so embed/media
    * failures stay tellable apart in task logs.
    *
    * `timeoutSeconds` is the OVERALL per-call budget, shared across every
    * attempt and sleep: each exchange gets the REMAINING time, and a
    * backoff that would not leave room for another exchange gives up
    * instead of sleeping (r12 advice — per-attempt deadlines let a
    * stalling-then-429ing backend hold one task ~20 min at the embed
    * defaults; now worst case stays near timeoutSeconds regardless of
    * retries, so the caller's fail-soft skip fires on schedule).
    */
  def postJson(
      client: java.net.http.HttpClient,
      uri: String,
      body: String,
      timeoutSeconds: Long,
      maxRetries: Int,
      retryBaseMillis: Long,
      what: String): String = {
    val deadlineNanos = System.nanoTime() + timeoutSeconds * 1000000000L
    def remainingMs: Long = (deadlineNanos - System.nanoTime()) / 1000000L
    var attempt = 0
    while (true) {
      val budgetMs = math.max(1L, remainingMs)
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(uri))
        .timeout(java.time.Duration.ofMillis(budgetMs))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      // get(timeout) + cancel(true), NOT orTimeout: orTimeout completes
      // the future but leaves the exchange streaming in the background —
      // a stalled backend would leak one live connection per skipped
      // batch. cancel(true) on the sendAsync future aborts the in-flight
      // exchange (supported since JDK 16), releasing the connection.
      val fut = client.sendAsync(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val resp =
        try fut.get(budgetMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        catch {
          case t: java.util.concurrent.TimeoutException =>
            fut.cancel(true)
            throw new RuntimeException(
              s"$what: response stalled past the ${timeoutSeconds}s call budget" +
                (if (attempt > 0) s" ($attempt backoff retries consumed it)"
                 else " (mid-body timeout)"), t)
          case e: java.util.concurrent.ExecutionException =>
            val c = if (e.getCause != null) e.getCause else e
            throw new RuntimeException(s"$what: ${c.getMessage}", c)
        }
      val code = resp.statusCode()
      if (code / 100 == 2) return resp.body()
      if ((code == 429 || code == 503) && attempt < maxRetries) {
        val retryAfterMs = {
          val h = resp.headers().firstValue("Retry-After")
          if (h.isPresent)
            // clamp BEFORE the *1000: a negative header would sleep 0 and
            // slip past the budget give-up below (zero-delay retry storm),
            // and a huge one would overflow the multiply negative with the
            // same effect — cap at a day, far past any budget this client
            // accepts, so the give-up guard fires instead
            scala.util.Try(h.get.trim.toLong).toOption
              .map(s => math.min(math.max(0L, s), 86400L) * 1000L)
          else None
        }
        // Clamp the computed path like the Retry-After path above: a large
        // base or deep attempt makes `retryBaseMillis << attempt` overflow
        // negative, which slips past the budget give-up (backoff + 100 is
        // also negative) and sleep(max(0,·)) turns it into a zero-delay
        // retry storm bounded only by maxRetries. Cap at a day; the budget
        // give-up below then fires instead.
        val backoff = retryAfterMs.getOrElse {
          val shifted = retryBaseMillis << attempt
          if (shifted <= 0L || shifted > 86400000L) 86400000L else shifted
        }
        // Give up rather than sleep the budget away: a retry whose backoff
        // leaves no real time for the exchange itself can only end in a
        // timeout with a less truthful message (plus one wasted request) —
        // reserve 100ms of headroom for the exchange, not just > 0.
        if (backoff + 100 >= remainingMs)
          throw new RuntimeException(s"$what: HTTP $code and the " +
            s"${timeoutSeconds}s call budget cannot cover another " +
            s"${backoff}ms backoff (after $attempt retries)")
        Thread.sleep(math.max(0L, backoff))
        attempt += 1
      } else
        throw new RuntimeException(s"$what: HTTP $code" +
          (if (attempt > 0) s" (after $attempt backoff retries)" else ""))
    }
    throw new IllegalStateException("unreachable")
  }
}
