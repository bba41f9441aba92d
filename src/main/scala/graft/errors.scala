package graft

/** Sealed exception taxonomy mirroring the reference's
  * (reference: gluettalax.py:122-167). The warning-vs-error split drives the
  * CLI exit-code contract (gluettalax.py:849-857): warnings exit 0, errors
  * exit 1.
  */
sealed abstract class GraftException(msg: String) extends RuntimeException(msg)

/** Warning subtree — caught by the CLI and mapped to exit code 0
  * (reference: gluettalax.py:126-127, 849-851).
  */
sealed abstract class GraftWarning(msg: String) extends GraftException(msg)

final case class CrawlerTimeout(msg: String) extends GraftException(msg)
final case class CrawlerNotFound(msg: String) extends GraftException(msg)
final case class JobNotFound(msg: String) extends GraftException(msg)
final case class JobTimeout(msg: String) extends GraftException(msg)
final case class JobConcurrentRunsExceeded(msg: String) extends GraftException(msg)
final case class TableNotFound(msg: String) extends GraftException(msg)
final case class PartitionNotFound(msg: String) extends GraftException(msg)
final case class PartitionAlreadyExists(msg: String) extends GraftWarning(msg)
final case class InvalidOption(msg: String) extends GraftException(msg)
/** Not in the reference taxonomy: raised by the CLI when a synchronous run
  * ends FAILED, so failure exits 1 — the deliberate fix of the reference's
  * always-exit-0 `cmd_run_job` bug (gluettalax.py:720, SURVEY §3.2). */
final case class JobFailed(msg: String) extends GraftException(msg)
final case class GraftCommandNotFound(msg: String) extends GraftException(msg)
