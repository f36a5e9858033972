package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point (`spark.sql.extensions=graft.GraftExtensions`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`): registers
  * the native vector expressions so SQL users get `graft_dot` /
  * `graft_normsq` / `graft_cosine` alongside the DataFrame API
  * ([[graft.functions.VectorOps]], which builds the expressions directly
  * and works in ANY session, extensions or not), the signature
  * aggregates `graft_minhash_sig`/`graft_simhash`
  * ([[graft.functions.expressions.SigAggs]]), plus the `graft_asof`
  * table-valued function ([[graft.plans.AsofTvf]]) so the as-of join's
  * custom exec is reachable from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.expressions.VecExprs.registrations.foreach(ext.injectFunction)
    ext.injectFunction(graft.functions.expressions.EwmaWin.registration)
    ext.injectFunction(graft.functions.expressions.CusumWin.registration)
    graft.functions.expressions.SigAggs.registrations.foreach(ext.injectFunction)
    ext.injectTableFunction(graft.plans.AsofTvf.registration)
    ext.injectTableFunction(graft.plans.StoreTvf.registration)
    ext.injectTableFunction(graft.plans.StoreChangesTvf.registration)
    ext.injectOptimizerRule(_ => graft.plans.RewriteSelfDotToNormSq)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
