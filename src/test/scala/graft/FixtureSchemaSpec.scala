package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Guard against silent driver-side fixture regeneration.
  *
  * Round 4 lost 115/228 queries because `/root/testdata` was regenerated
  * with `events.ts` as TIMESTAMP(MICROS) while the reader still hard-coded
  * the nanos-as-INT64 workaround. This spec pins the ingest contract for
  * every fixture table: if a future regeneration changes a column type the
  * engine can't adapt to, ONE named test here flips — instead of half the
  * query suite erroring at analysis time with no artifact trail.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def fixture(name: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  test("events: ts ingests to a usable timestamp under either fixture generation") {
    val raw = fixture("events")
    val tsType = raw.schema("ts").dataType
    assert(
      tsType == LongType || tsType.isInstanceOf[TimestampType] ||
        tsType.isInstanceOf[TimestampNTZType],
      s"events.ts is $tsType — neither nanos-as-INT64 nor a timestamp; adaptTs needs a new branch")
    val adapted = SparkEntry.adaptTs(raw)
    val adaptedType = adapted.schema("ts").dataType
    assert(adaptedType.isInstanceOf[TimestampType] || adaptedType.isInstanceOf[TimestampNTZType],
      s"adaptTs produced $adaptedType, expected a timestamp")
    // the adapted column must survive analysis + execution (r4's failure mode
    // was an AnalysisException on first use, not a schema read)
    val row = adapted.agg(min(unix_micros(col("ts"))), count(lit(1)),
      max(unix_micros(col("ts")))).head()
    assert(!row.isNullAt(0) && row.getLong(1) > 0L)
    // UNIT guard, not just type: adaptTs assumes a LongType ts is
    // NANOseconds. If a future fixture generation stores raw INT64
    // MICROS, the DIV 1000 would silently compress every timestamp
    // 1000× (everything lands near 1970) while the type checks above
    // still pass — pin the adapted values to a sane epoch window so a
    // unit drift flips THIS test instead of silently diverging 100+
    // time-window queries from the oracle.
    val y2000Micros = 946684800000000L  // 2000-01-01T00:00Z
    val y2100Micros = 4102444800000000L // 2100-01-01T00:00Z
    assert(row.getLong(0) > y2000Micros && row.getLong(2) < y2100Micros,
      s"adapted ts outside [2000, 2100): [${row.getLong(0)}, ${row.getLong(2)}] " +
        "— fixture ts UNIT likely changed; fix adaptTs, not the call sites")
  }

  test("events: full column contract") {
    val t = SparkEntry.adaptTs(fixture("events")).schema
    assert(t("event_id").dataType == LongType)
    assert(t("user_id").dataType == LongType)
    assert(t("event_type").dataType == StringType)
    assert(t("value").dataType == DoubleType)
    assert(t("props").dataType == StringType)
  }

  test("documents: column contract") {
    val t = fixture("documents").schema
    assert(t("doc_id").dataType == LongType)
    assert(t("text").dataType == StringType)
    assert(t("lang").dataType == StringType)
    assert(t("source").dataType == StringType)
    assert(t("n_chars").dataType == LongType)
  }

  test("embeddings: column contract") {
    val t = fixture("embeddings").schema
    assert(t("vec_id").dataType == LongType)
    assert(t("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      t("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embedding is ${t("embedding").dataType}")
    assert(t("label").dataType == IntegerType)
  }

  test("lineitem: column contract (joins + ts arithmetic must analyze)") {
    val df = fixture("lineitem")
    val t = df.schema
    assert(t("l_orderkey").dataType == LongType)
    assert(t("l_suppkey").dataType == LongType)
    assert(t("l_quantity").dataType == DoubleType)
    val sd = t("l_shipdate").dataType
    assert(sd.isInstanceOf[TimestampType] || sd.isInstanceOf[TimestampNTZType] ||
      sd == DateType, s"l_shipdate is $sd")
    assert(df.agg(count(lit(1))).head().getLong(0) > 0L)
  }

  test("all driver tables are readable") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = fixture(t)
      assert(df.columns.nonEmpty, s"$t has no columns")
    }
  }
}
