package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.cdc.{CanalJson, CdcApply}
import graft.tables.Tables

/** Ad-hoc stage profiler (dev tool, not part of the driver contract). Times
  * each phase of a hot query separately so regressions point at a stage, not
  * a query. Modes: `cdc` (wire-format apply pipeline), `misc` (q19 / x6 /
  * simhash stages). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("cdc")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.EngineSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (mode == "cdc") {
      val base = Tables.orders(spark, dir)
        .select($"o_orderkey".as("id"), $"o_orderstatus".as("final_status"))
        .repartition(spark.sparkContext.defaultParallelism)
      def line(op: String, status: Column, esOff: Int) = to_json(struct(
        array(map(lit("id"), $"id".cast("string"), lit("status"), status)).as("data"),
        lit(op).as("type"), lit("orders").as("table"), lit("testdb").as("database"),
        (lit(1704067200000L) + $"id" * 3 + esOff).as("es"), lit(false).as("isDdl")))
      def raw(df: DataFrame, op: String, status: Column, esOff: Int) = df.select(
        line(op, status, esOff).as("value"),
        lit(0).as("partition"), ($"id" * 3 + esOff).cast("bigint").as("offset"))
      val ins = raw(base, "INSERT", lit("pending"), 0)
      val upd = raw(base, "UPDATE", $"final_status", 1)
      val del = raw(base.filter($"id" % 7 === 0), "DELETE", $"final_status", 2)
      val all = ins.unionByName(upd).unionByName(del).unionByName(upd)

      time("events(flatten)")(noop(CanalJson.events(all)))
      time("materialize")(noop(CdcApply.materialize(CanalJson.events(all))))
      time("full cdc_wire_latest")(
        noop(graft.queries.CdcQueries.cdc_wire_latest(spark, dir)))
      time("full cdc_wire_parse")(
        noop(graft.queries.CdcQueries.cdc_wire_parse(spark, dir)))
      time("full s6_wire_logs")(
        noop(graft.queries.CdcQueries.s6_wire_logs(spark, dir)))
    } else if (mode == "explain") {
      // usage: runMain graft.tools.Profile explain <sfDir> <name1,name2,...>
      val names = args.drop(2).headOption.map(_.split(",").toSeq)
        .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
      names.foreach { n =>
        println(s"===== $n =====")
        println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan)
      }
    } else {
      time("q19_math_fns")(noop(graft.queries.Relational.q19_math_fns(spark, dir)))
      val ev = Tables.events(spark, dir)
      time("events count")(ev.count())
      time("x6 get_json_object")(noop(
        ev.select(get_json_object($"props", "$.k").cast("int").as("k"), $"value")))
      time("x6_props_agg full")(noop(graft.queries.LlmOps.x6_props_agg(spark, dir)))
      val docs = Tables.documents(spark, dir)
      time("simhashFrame")(noop(graft.ops.Dedup.simhashFrame(docs, "text", "doc_id")))
      time("x2_simhash full")(noop(graft.queries.LlmOps.x2_simhash(spark, dir)))
    }
    spark.stop()
  }
}
