package graft

import graft.pipeline.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-16 projection-shaped SimHash
  * ([[graft.functions.SimHashSignature]], zero-exchange) must reproduce
  * the aggregate path ([[graft.functions.SimHashBits]] over the exploded
  * distinct-word relation) BIT-IDENTICALLY, and the banded near-dup
  * operator built on it must keep its pigeonhole-complete contract.
  */
class SimHashSignatureParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def aggShape(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // the pre-r16 operator interior, kept verbatim as the parity oracle
    df.select(col(idCol), explode(split(col(textCol), " ")).as("w")).distinct()
      .groupBy(col(idCol))
      .agg(graft.functions.SimHashBits(xxhash64(col("w"))).as("simhash"))

  private def shMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("projection simhash == aggregate simhash on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val wide = shMap(TextDedup.simhash(docs, "doc_id", "text"))
    val agg = shMap(aggShape(docs, "doc_id", "text"))
    assert(wide.keySet == agg.keySet)
    assert(wide == agg)
    assert(wide.nonEmpty)
  }

  test("edge docs: repeated words vote once, null text drops from both shapes") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c a a a"), // repeats must not re-vote (distinct semantics)
      (2L, "a b c"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val wide = shMap(TextDedup.simhash(docs, "doc_id", "text"))
    val agg = shMap(aggShape(docs, "doc_id", "text"))
    assert(wide == agg)
    assert(wide(1L) == wide(2L),
      "multiset-insensitive after distinct: repeated words change nothing")
    assert(wide.keySet == Set(1L, 2L, 3L), s"null text must drop: ${wide.keySet}")
  }

  test("projection simhash plans with zero exchanges and zero aggregates") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = TextDedup.simhash(docs, "doc_id", "text")
      .queryExecution.executedPlan
    val offending = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(offending.isEmpty,
      s"simhash plan must be exchange/aggregate-free:\n$plan")
    val wsc = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, s"simhash must run inside WholeStageCodegen:\n$plan")
  }

  test("simhashPairs through the new shape: pigeonhole completeness holds") {
    val s = spark
    import s.implicits._
    // two docs differing in ONE word out of many → tiny hamming distance;
    // an unrelated doc must not pair
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.replace("tok7", "tok7x")),
      (3L, (100 to 140).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = TextDedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact hamming check drives the expectation
    val sh = shMap(TextDedup.simhash(docs, "doc_id", "text"))
    val d12 = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    assert(pairs.contains((1L, 2L)) == (d12 <= 3),
      s"pair (1,2) at hamming $d12: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated doc must not pair: $pairs")
  }
}
