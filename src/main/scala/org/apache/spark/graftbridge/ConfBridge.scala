package org.apache.spark.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** `org.apache.spark.util.SerializableConfiguration` — the standard way
  * to ship the Hadoop configuration to executor-side FS code — is
  * `private[spark]` at the Scala level (public bytecode, hidden from
  * external compilation units). This bridge (the [[ColumnBridge]]
  * convention) exposes exactly the broadcast + unwrap pair the
  * distributed file-copy job needs.
  */
object ConfBridge {
  def broadcastConf(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)
  def conf(b: Broadcast[SerializableConfiguration]): Configuration =
    b.value.value
}
