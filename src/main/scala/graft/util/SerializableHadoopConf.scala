package graft.util

import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not java-serializable; this wrapper ships
  * one into task closures as a plain key/value snapshot, rebuilt lazily
  * on first executor-side access.
  *
  * Deliberately NOT the writeObject/readObject-hook trick Spark's
  * private `SerializableConfiguration` uses: Java serialization hooks
  * are bypassed when a deployment sets
  * `spark.serializer=KryoSerializer` (Kryo writes fields directly), so
  * a hook-based wrapper arrives with its `@transient` Configuration
  * null and every distributed footer-stats commit would NPE. A plain
  * serializable array of entries round-trips identically under BOTH
  * serializers. (Spark itself registers a dedicated Kryo serializer
  * for its wrapper — this engine can't, without reaching into
  * private[spark].)
  */
class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {

  /** Raw entries, unexpanded — `Configuration.iterator` yields the
    * stored property values, and re-`set`ting them preserves variable
    * expansion semantics at `get` time, same as Writable round-trip. */
  private val entries: Array[(String, String)] = {
    val it = conf.iterator()
    val b = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
    b.result()
  }

  /** The Configuration — the driver's original on the driver, a
    * snapshot-rebuilt copy on executors (thread-safe: broadcast values
    * are shared across task threads). */
  def value: Configuration = synchronized {
    if (conf == null) {
      val c = new Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      conf = c
    }
    conf
  }
}
