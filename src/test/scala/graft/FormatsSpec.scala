package graft

import org.apache.spark.sql.functions._

import graft.sources.{Formats, Tables}

/** The non-parquet ingress seam: schema-first JSONL/CSV round-trips must
  * be lossless — including µs-resolved timestamps, which Spark's default
  * text-format timestamp pattern would silently truncate to millis.
  */
class FormatsSpec extends SparkSpec {

  test("events JSONL round-trip is lossless, including microsecond timestamps") {
    val events = Tables.load(spark, sf, "events")
    val path = "target/format-scratch/spec-events-jsonl"
    Formats.writeJsonl(events, path)
    val back = Formats.readJsonl(spark, path, events.schema)
    assert(back.count() === events.count())
    assert(back.except(events).count() === 0)
    assert(events.except(back).count() === 0)
    // µs fidelity specifically: sub-millisecond fractions survive
    val micros = events.filter(expr("unix_micros(ts) % 1000 != 0")).count()
    assert(micros > 0, "fixture must actually exercise sub-ms timestamps")
    assert(back.filter(expr("unix_micros(ts) % 1000 != 0")).count() === micros)
  }

  test("orders CSV round-trip is lossless; documents survive via multiLine quoting") {
    val orders = Tables.load(spark, sf, "orders")
    val path = "target/format-scratch/spec-orders-csv"
    Formats.writeCsv(orders, path)
    val back = Formats.readCsv(spark, path, orders.schema)
    assert(back.except(orders).count() === 0)
    assert(orders.except(back).count() === 0)

    val docs = Tables.load(spark, sf, "documents")
    val dpath = "target/format-scratch/spec-docs-csv"
    Formats.writeCsv(docs, dpath)
    val dback = Formats.readCsv(spark, dpath, docs.schema, multiLine = true)
    assert(dback.except(docs).count() === 0)
    assert(docs.except(dback).count() === 0)
  }

  test("CSV round-trip keeps empty strings and nulls distinct (round-4 ADVICE)") {
    // the default CSV options write null and "" as the same empty field
    // and read both back as null — the explicit nullValue/emptyValue pair
    // must keep them apart even though no current fixture has empty text
    import spark.implicits._
    val df = Seq((1L, Some("")), (2L, None: Option[String]), (3L, Some("x")))
      .toDF("id", "text")
    val path = "target/format-scratch/spec-nullempty-csv"
    Formats.writeCsv(df, path)
    val back = Formats.readCsv(spark, path, df.schema).orderBy("id").collect()
    assert(back(0).getString(1) === "", "empty string must survive as empty, not null")
    assert(back(1).isNullAt(1), "null must survive as null")
    assert(back(2).getString(1) === "x")
  }
}
