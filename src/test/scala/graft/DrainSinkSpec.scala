package graft

/** Locks the stress harness's distributed-drain knob: selecting the
  * parquet sink (what the 100× phase does — a driver memory sink
  * collecting 9M rows was ~73 s of a 94 s drain, pure harness cost)
  * must return EXACTLY the rows the default memory sink returns, so
  * the scaling artifact measures the operator under a production
  * sink shape, never a different result. */
class DrainSinkSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Set[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.mkString("|")).toSet
  }

  test("parquet drain returns the same rows as the memory drain") {
    val base = rows("stream_session_native")
    assert(base.nonEmpty, "fixture must produce sessions")
    try {
      sys.props("graft.drain.sink") = "parquet"
      sys.props("graft.drain.statePartitions") = "2"
      assert(rows("stream_session_native") == base,
        "sink selection must not change the drained result")
    } finally {
      sys.props.remove("graft.drain.sink")
      sys.props.remove("graft.drain.statePartitions")
    }
  }

  test("complete-mode drain works through the parquet sink (overwrite)") {
    val base = rows("stream_topk")
    assert(base.nonEmpty, "fixture must produce top-k rows")
    try {
      sys.props("graft.drain.sink") = "parquet"
      assert(rows("stream_topk") == base,
        "complete-mode parquet drain must overwrite, not append")
    } finally sys.props.remove("graft.drain.sink")
  }

  test("update mode through the parquet sink fails fast, never appends stale rows") {
    import org.apache.spark.sql.functions._
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val in = spark.readStream.schema(schema).parquet(s"$dir/documents.parquet")
      .withColumn("ts", timestamp_seconds(lit(86400L)))
      .withWatermark("ts", "1 hour")
      .groupBy("ts").count()
    try {
      sys.props("graft.drain.sink") = "parquet"
      val e = intercept[IllegalArgumentException] {
        SparkEntry.drainToTable(spark, in, "update", "spec_update_mode")
      }
      assert(e.getMessage.contains("update"),
        s"error must name the unsupported mode: ${e.getMessage}")
    } finally sys.props.remove("graft.drain.sink")
  }

  test("a refused update-mode drain leaves the tag's previous output intact") {
    import org.apache.spark.sql.functions._
    // FileStreamSource wants a DIRECTORY source; stage the fixture
    val src = java.nio.file.Files.createTempDirectory("graft_drain_src").toString
    spark.read.parquet(s"$dir/documents.parquet").write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def stream = spark.readStream.schema(schema).parquet(src)
      .withColumn("ts", timestamp_seconds(lit(86400L)))
      .withWatermark("ts", "1 hour")
      .groupBy("ts").count()
    try {
      sys.props("graft.drain.sink") = "parquet"
      val tag = "spec_refusal_keeps_prior"
      val good = SparkEntry.drainToTable(spark, stream, "complete", tag)
        .collect().map(_.mkString("|")).toSet
      assert(good.nonEmpty, "the first drain must produce rows")
      intercept[IllegalArgumentException] {
        SparkEntry.drainToTable(spark, stream, "update", tag)
      }
      // mode validation must run BEFORE the sink-path delete: the
      // refused drain may not have destroyed the prior drained table
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_drain_$tag"
      assert(spark.read.parquet(path).collect()
        .map(_.mkString("|")).toSet == good,
        "refused update-mode drain destroyed the previous output")
    } finally sys.props.remove("graft.drain.sink")
  }

  test("zero-batch parquet drain returns an empty table with the query schema") {
    import org.apache.spark.sql.functions._
    // a file source over an empty directory produces NO micro-batches,
    // so foreachBatch never writes — the drain must still match the
    // memory sink's contract (empty table, correct schema), not throw
    // on the absent read-back path
    val empty = java.nio.file.Files.createTempDirectory("graft_drain_empty")
    val in = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(empty.toString)
      .select(col("doc_id"), length(col("text")).as("text_len"))
    try {
      sys.props("graft.drain.sink") = "parquet"
      val out = SparkEntry.drainToTable(spark, in, "append", "spec_zero_batch")
      assert(out.columns.toSeq == Seq("doc_id", "text_len"),
        "empty drain must carry the query's schema")
      assert(out.count() == 0)
    } finally sys.props.remove("graft.drain.sink")
  }
}
