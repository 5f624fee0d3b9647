package graft

/** Marker for every graft-raised failure: `catch { case e: GraftException }`
  * handles them all (reference: exceptions/AriadneException.scala — its test
  * suites assert these types, so they are part of the API a switching user
  * relies on). Concrete types extend the unchecked JDK types they previously
  * surfaced as, so pre-existing call sites and tests keep working.
  *
  * Lock failures ([[graft.store.LockTimeoutException]],
  * [[graft.store.LockLostException]]) join the marker too. */
trait GraftException extends RuntimeException

/** A referenced column is not part of the index (not in the schema, or not
  * indexed where an indexed column is required). */
class ColumnNotFoundException(msg: String)
  extends IllegalArgumentException(msg) with GraftException

/** Reconnect with a schema that differs from the stored one (pass
  * `allowSchemaMismatch = true` to evolve). */
class SchemaMismatchException(msg: String)
  extends IllegalArgumentException(msg) with GraftException

/** Reconnect with a different file format than the index was created with. */
class FormatMismatchException(msg: String)
  extends IllegalArgumentException(msg) with GraftException

/** Connect/describe of an index that does not exist. */
class IndexNotFoundException(msg: String)
  extends IllegalArgumentException(msg) with GraftException

/** File format outside the supported set (parquet/csv/json/orc). */
class UnsupportedFormatException(msg: String)
  extends IllegalArgumentException(msg) with GraftException

/** A storage migration step failed or the store is newer than this build. */
class StorageMigrationException(msg: String, cause: Throwable = null)
  extends IllegalStateException(msg, cause) with GraftException

/** A persisted trained artifact (BPE vocab, text-model weights, IVF
  * centroids) is missing, of the wrong kind, from a newer format version
  * than this build, or structurally invalid. */
class ArtifactFormatException(msg: String, cause: Throwable = null)
  extends IllegalStateException(msg, cause) with GraftException
