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
}
