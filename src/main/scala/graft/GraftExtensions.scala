package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Session-extension packaging: a cluster that starts Spark with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * gets every graft_* native function in ANY session (SQL included) without
  * per-DataFrame registration — the idiomatic deployment path. The
  * per-session `GraftFunctions.register` fallback stays for sessions
  * created without the extension (tests, the driver harness).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer guard: broadcast hints on oversized sides are stripped
    // before they can OOM the driver (see plans.DehintOversizedBroadcasts)
    ext.injectOptimizerRule(session => graft.plans.DehintOversizedBroadcasts(session))
    ext.injectFunction((FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(arr) - 60-bit SimHash of array<bigint>"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(arr, k) - MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - sequential double dot product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash", "graft_rolling_hash(s) - Rabin-Karp fingerprint"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(toks, n, modP) - hashed word n-gram shingles"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        exprs(2).eval(null).asInstanceOf[Boolean])))
    ext.injectFunction((FunctionIdentifier("graft_cdc_boundaries"),
      info("graft_cdc_boundaries", "graft_cdc_boundaries(s, w, divisor) - content-defined chunk boundary positions"),
      (exprs: Seq[Expression]) => CdcBoundaries(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue(),
        exprs(2).eval(null).asInstanceOf[Number].intValue())))
  }
}
