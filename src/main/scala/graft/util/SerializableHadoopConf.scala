package graft.util

import org.apache.hadoop.conf.Configuration

/** Hadoop `Configuration` is not java-serializable; this wrapper ships
  * one into task closures via its own Writable encoding (the same trick
  * Spark's private `SerializableConfiguration` uses — that class is
  * `private[spark]` at the Scala level, so the engine carries its own
  * ten-line copy rather than a bridge into spark internals). */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
