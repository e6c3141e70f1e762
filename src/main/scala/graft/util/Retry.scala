package graft.util

/** Driver-side retry policies (SURVEY §2.7 X18): the reference retries
  * uploads 3× with exponential backoff from 1 s
  * (`/root/reference/services/screenshot_storage_service.py:224-247`) and
  * screenshots 3× with a fixed 2 s delay
  * (`services/screenshot_service.py:227-243`). In the engine these wrap
  * wave-level side effects (snapshot commits, external sinks); task-level
  * retries stay with Spark (`spark.task.maxFailures`).
  *
  * `sleeper` is injectable so tests (and deterministic replays) never touch
  * the wall clock.
  */
object Retry {

  final case class Result[T](value: Option[T], attempts: Int,
                             lastError: Option[Throwable])

  /** Exponential backoff: delays delayMs, 2·delayMs, 4·delayMs, … */
  def withBackoff[T](maxAttempts: Int = 3, delayMs: Long = 1000L,
                     sleeper: Long => Unit = Thread.sleep)(f: => T): Result[T] = {
    var attempt = 0
    var delay = delayMs
    var err: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try return Result(Some(f), attempt, None)
      catch {
        case e: Throwable =>
          err = e
          if (attempt < maxAttempts) { sleeper(delay); delay *= 2 }
      }
    }
    Result(None, attempt, Option(err))
  }

  /** Fixed-delay retry (screenshot policy). */
  def withFixedDelay[T](maxAttempts: Int = 3, delayMs: Long = 2000L,
                        sleeper: Long => Unit = Thread.sleep)(f: => T): Result[T] = {
    var attempt = 0
    var err: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try return Result(Some(f), attempt, None)
      catch {
        case e: Throwable =>
          err = e
          if (attempt < maxAttempts) sleeper(delayMs)
      }
    }
    Result(None, attempt, Option(err))
  }
}
