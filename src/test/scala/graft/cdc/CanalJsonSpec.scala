package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parser/transform semantics (SURVEY.md T1-T7) against the embedded
  * replay fixture (FIXTURES.md §A.2 cases). */
class CanalJsonSpec extends SparkSpec {
  import spark.implicits._

  lazy val raw = CanalJson.fixtureRaw(spark)
  lazy val parsed = CanalJson.parse(raw)
  lazy val events = CanalJson.events(raw).cache()

  test("T3 flatten: one event per element of data (multi-row INSERT → 3 rows)") {
    val seedInsert = events.filter($"offset" === 0)
    assert(seedInsert.count() === 3)
    assert(seedInsert.select("op").distinct().as[String].collect().toSeq === Seq("insert"))
  }

  test("T4 old-image zip is positional: old[i] pairs with data[i]") {
    val upd = events.filter($"offset" === 2 && $"op" === "update")
      .select(element_at($"data", "id").as("id"),
              element_at($"data", "price").as("new_price"),
              element_at($"old_data", "price").as("old_price"))
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(upd.toSeq === Seq(("1", "165.00", "150.00"), ("2", "50.05", "45.50")))
  }

  test("T5 envelope: es epoch-ms → timestamp; op lowercased; sql null on DML") {
    val first = events.filter($"offset" === 0).select($"timestamp".cast("string"), $"operation", $"op", $"sql")
      .distinct().as[(String, String, String, Option[String])].head()
    assert(first._1.startsWith("2024-01-01 00:00:00")) // 1704067200000 ms UTC
    assert(first._2 === "INSERT" && first._3 === "insert" && first._4.isEmpty)
  }

  test("T5 defaults: missing table/database → 'unknown'/'testdb'; missing es → processing time (non-null)") {
    val row = events.filter($"offset" === 8)
      .select($"table", $"database", $"timestamp")
      .as[(String, String, java.sql.Timestamp)].head()
    assert(row._1 === "unknown")
    assert(row._2 === "testdb")
    assert(row._3 != null)
  }

  test("T2/T6 routing: DDL → ddl, malformed → parse_error; valid rows never lost") {
    val inv = CanalJson.invalid(parsed)
      .groupBy($"reason").count().as[(String, Long)].collect().toMap
    assert(inv("ddl") === 1)
    assert(inv("parse_error") === 1)
    // 10 fixture lines: 8 valid messages flatten to 11 rows
    assert(events.count() === 11) // 3+1+2+1+1+1+1(no-es)+1(dup)
  }

  test("T7 typed view: DECIMAL(10,2) price stays decimal, ints typed") {
    val typed = CanalJson.typedView(events, "products", CanalJson.productsSchema)
    val schema = typed.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("price") === "decimal(10,2)")
    assert(schema("stock") === "int")
    assert(schema("id") === "bigint")
    val laptop = typed.filter($"id" === 1 && $"op" === "update")
      .select($"price".cast("string")).as[String].head()
    assert(laptop === "165.00")
  }

  test("T7 schema evolution: a column added upstream but absent in old events reads null, no crash") {
    import org.apache.spark.sql.types._
    val evolved = StructType(CanalJson.productsSchema.fields :+
      StructField("discount_pct", DecimalType(5, 2)))
    val typed = CanalJson.typedView(events, "products", evolved)
    val rows = typed.select($"id", $"discount_pct").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.isNullAt(1)), "pre-DDL events must read the new column as null")
  }

  test("M4 three-way status: success, invalid reasons, and a materialized error branch") {
    val statuses = graft.queries.CdcQueries.cdc_message_status(spark, "")
      .as[(String, Long)].collect().toMap
    assert(statuses("success") === 8)     // the 8 clean valid messages
    assert(statuses("error") === 1)       // the poison line: valid envelope, failing payload
    assert(statuses("ddl") === 1)
    assert(statuses("parse_error") === 1)
    // poison parses as VALID (it is not a format problem) and errors later
    val poison = CanalJson.parse(Seq((CanalJson.poisonLine, 0, 100L))
      .toDF("value", "partition", "offset"))
    assert(poison.filter(CanalJson.isValid).count() === 1)
    assert(poison.filter(CanalJson.processError).count() === 1)
  }

  test("parse is PERMISSIVE: malformed JSON lands in _corrupt_record, stream never dies") {
    // PERMISSIVE from_json returns an all-null struct (never a null struct);
    // the corrupt-record column is the only reliable parse-failure signal
    assert(parsed.filter($"parsed._corrupt_record".isNotNull).count() === 1)
    assert(parsed.filter($"parsed._corrupt_record".isNotNull && $"parsed.data".isNotNull).count() === 0)
  }
}
