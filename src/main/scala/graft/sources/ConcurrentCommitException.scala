package graft.sources

/** The ONE retryable signal of the optimistic-concurrency commit paths:
  * a writer lost the race for a log/metadata version (Delta `NNN.json`
  * claim, Iceberg `vN.metadata.json` claim, or a stale
  * `expectedBaseVersion`). Retry loops catch EXACTLY this type — an
  * unrelated `IllegalStateException` escaping a commit body must surface
  * immediately, not be silently re-driven up to the attempt cap.
  * Extends [[IllegalStateException]] so callers that treated the race as
  * an ISE (specs, CLI error mapping) keep working unchanged.
  */
final class ConcurrentCommitException(msg: String)
    extends IllegalStateException(msg)
