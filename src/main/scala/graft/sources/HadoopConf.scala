package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Serializable carrier for the session's Hadoop configuration, so the
  * custom sources honor `spark.hadoop.*` settings (object-store
  * credentials, endpoints, connector tuning) on BOTH the driver and the
  * executors. A bare `new Configuration()` would silently drop them — the
  * classic DSv2 mistake that only surfaces off local disk. (Spark's own
  * `SerializableConfiguration` is `private[spark]`, hence this wrapper;
  * same Writable-based wire format.) */
final class SerializableHadoopConf(@transient private var conf: Configuration)
  extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

object HadoopConf {
  /** The active session's Hadoop conf (with `spark.hadoop.*` applied);
    * plain defaults only when no session exists (e.g. bare unit code). */
  def session(): Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}
