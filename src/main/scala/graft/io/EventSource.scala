package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming event decode (SURVEY §2.1 K3/K4, §2.8 ST1/ST2).
  *
  * The reference subscribes to a Redis pub/sub channel and `eval`s
  * Python-literal payloads `{'userId': ..}` / `{'userId': .., 'bookIds':
  * [..]}` (guessLike_u_like.py:179-188, guessLike_u_first_select.py:174-178),
  * skipping subscription-ack frames.
  *
  * The engine maps payloads to JSON decoded with `from_json`: non-JSON
  * frames yield null structs and are dropped (the ack-skip), invalid userIds
  * are filtered (the reference only logs them — we filter, SURVEY §2.1 K4).
  * Works identically on a batch DataFrame and a streaming one (MemoryStream
  * in tests, any DataStreamReader source in production).
  */
object EventSource {

  val eventSchema: StructType = StructType(Seq(
    StructField("userId", LongType),
    StructField("bookIds", ArrayType(LongType))))

  /** value: String column of raw frames -> (userId, bookIds) rows. */
  def decode(frames: DataFrame, valueCol: String = "value"): DataFrame =
    frames
      .select(from_json(col(valueCol), eventSchema).as("e"))
      .where(col("e").isNotNull && col("e.userId").isNotNull)
      .select(col("e.userId").as("userId"), col("e.bookIds").as("bookIds"))
      .where(col("userId") > 0)
}
