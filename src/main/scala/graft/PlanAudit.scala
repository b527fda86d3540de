package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries so the
  * scan pushdown / broadcast / codegen posture can be audited.
  * Usage: runMain graft.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("ledger_monthly", "o3_watermark_filter", "j3_snowflake_revenue")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      QueryRegistry.byName(n).run(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
