package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Bounded cache lifecycle for multi-consumer operator plans: materialize the
  * (output-sized) result, then release the internal intermediates so repeated
  * operator calls don't pin executor memory for the session lifetime. On
  * failure the intermediates are still released. Callers may `unpersist()`
  * the returned frame when done.
  */
private[pipeline] object Lifecycle {
  def materializeAndRelease(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try out.count()
    catch {
      case e: Throwable =>
        // no handle escapes on failure — release the result too
        out.unpersist(blocking = false)
        throw e
    }
    finally intermediates.foreach(_.unpersist(blocking = false))
    out
  }
}
