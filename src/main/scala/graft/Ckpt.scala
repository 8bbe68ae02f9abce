package graft

import org.apache.spark.sql.{DataFrame, GraftSql}

/** Syntax for the honest-statistics eager checkpoint — the repo-wide
  * replacement for bare `.localCheckpoint(true)` on DataFrames (see
  * [[org.apache.spark.sql.GraftSql.eagerCkpt]] and
  * [[graft.plans.HonestRddStats]] for why the stats rewrap must happen
  * at checkpoint time). */
object Ckpt {
  implicit class CkptSyntax(private val df: DataFrame) extends AnyVal {
    def eagerCkpt: DataFrame = GraftSql.eagerCkpt(df)
  }
}
