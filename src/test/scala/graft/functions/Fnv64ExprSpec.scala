package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Fnv64ExprSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side FNV-1a 64 reference (the published constants). */
  private def ref(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    h
  }

  test("fnv64 matches the byte-fold reference, including the empty string") {
    val vals = Seq("hello", "", "a", "The quick", "x" * 300, "hélloé")
    val got = vals.toDF("s").select(fnv64(col("s"))).as[Long].collect()
    assert(got.toSeq == vals.map(ref), s"got ${got.toSeq}")
  }

  test("fnv64 agrees with the per-token hash every sibling kernel uses") {
    // tokenSet is sorted-distinct FNV of each token: a single token's
    // set must be exactly [fnv64(token)]
    val out = Seq("sometoken").toDF("s")
      .select(fnv64(col("s")).as("f"),
        tokenSet(array(col("s"))).as("ts"))
      .as[(Long, Seq[Long])].head()
    assert(out._2 == Seq(out._1), s"kernel drift: $out")
  }

  test("null propagates; non-string input is rejected at analysis") {
    val n = Seq((1L, Option.empty[String])).toDF("id", "s")
      .select(fnv64(col("s"))).as[Option[Long]].head()
    assert(n.isEmpty, "null input must yield null")
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(fnv64(col("x"))).collect()
    }
  }
}
