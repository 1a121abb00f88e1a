package graft.util

import java.util.concurrent.{CompletableFuture, ConcurrentHashMap}

/** Once-per-key memoization where the compute runs OUTSIDE the map's bin
  * lock (ADVICE round 5: two full Spark write jobs inside
  * `ConcurrentHashMap.computeIfAbsent` hold the bin lock for the entire
  * bucketing write — minutes at the 1000× tier — blocking unrelated keys
  * hashed to the same bin). Losers of the `putIfAbsent` race block on the
  * winner's future, not on the map; a failed compute removes its entry so
  * the next caller retries instead of joining a poisoned future.
  */
object Memo {
  def once[T](map: ConcurrentHashMap[String, CompletableFuture[T]], key: String)(
      build: => T): T = {
    val fut = new CompletableFuture[T]()
    val prior = map.putIfAbsent(key, fut)
    if (prior != null) prior.join()
    else
      try {
        val v = build
        fut.complete(v)
        v
      } catch {
        case e: Throwable =>
          map.remove(key, fut)
          fut.completeExceptionally(e)
          throw e
      }
  }
}
