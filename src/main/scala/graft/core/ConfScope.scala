package graft.core

import org.apache.spark.sql.SparkSession

/** JVM-wide serialization + save/restore for session-global SQL conf
  * mutations (shuffle partitions for the streaming runs and the CC loop).
  * One shared lock — two independent locks each saving/restoring the same
  * conf key can interleave as save(32)/set(8)/save(8)/restore(32)/
  * restore(8) and permanently leak the narrowed value into the shared
  * session. Every caller must perform its eager work INSIDE `body`: the
  * previous value is restored before this returns, so lazily-consumed
  * results must not depend on the scoped conf. */
object ConfScope {
  private val lock = new Object

  /** Validated positive-int env knob (error names the variable). */
  def envInt(name: String, default: String): String = {
    val raw = sys.env.getOrElse(name, default)
    require(scala.util.Try(raw.toInt).toOption.exists(_ > 0),
      s"$name must be a positive int, got '$raw'")
    raw
  }

  /** Measured-size broadcast gate (r21, optimization guide §3.1): the
    * iterative loops (graph family, CC) carry checkpointed relations
    * whose PRESERVED stats are join-product estimates that grow per
    * round, so Spark's autoBroadcast never fires on them even when
    * their true size is a few hundred KB — and every round pays a full
    * sort-merge shuffle of the big side. The true cardinality of the
    * small side IS known to the caller (counted once per query), so
    * this returns the identity or a `broadcast(_)` hint by the same
    * rule correct stats would produce: rows × rowBytes under the
    * session's own autoBroadcastJoinThreshold (−1 disables, exactly as
    * it disables the planner's). Scale-adaptive by construction — a
    * cluster-scale relation fails the gate and keeps the shuffle plan. */
  def bcastIfFits(s: SparkSession, rows: Long, rowBytes: Long)
      : org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = {
    val thr = s.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 && rows <= thr / rowBytes)
      df => org.apache.spark.sql.functions.broadcast(df)
    else identity
  }

  /** Run `body` with the given session confs set, restoring previous
    * values (or unsetting) afterwards, serialized JVM-wide. The set loop
    * runs INSIDE the try and the restore is per-key exception-tolerant:
    * a conf that rejects its value (static conf, validation) must not
    * leave the keys already mutated before it un-restored, and one
    * failing restore must not abort the remaining restores — either
    * would be exactly the leak this utility exists to prevent. */
  def withConf[A](s: SparkSession, confs: Map[String, String])(body: => A): A =
    lock.synchronized {
      val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      try {
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        body
      } finally prev.foreach { case (k, ov) =>
        try ov.fold(s.conf.unset(k))(v => s.conf.set(k, v))
        catch { case e: Throwable =>
          System.err.println(s"[ConfScope] restore of $k failed: $e") }
      }
    }
}
