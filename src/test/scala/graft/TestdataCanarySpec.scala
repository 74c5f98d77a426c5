package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-schema canary (VERDICT r9 #2). The driver regenerates
  * `/root/testdata` between rounds and has already changed a physical
  * layout once (events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS), round
  * 9 — cost: 13 queries + 14 tests failing with an opaque analysis
  * error). This suite pins the LOADER-VISIBLE schema of every
  * `Tables.all` table at sf0.001; on the next silent regeneration it
  * fails naming the exact table and column instead.
  *
  * The events table is asserted through `Tables.events` — its
  * normalized layout is what downstream operators see and is
  * independent of whichever physical timestamp encoding the driver
  * ships (that independence is itself under test in OperatorsSpec's
  * dual-layout case).
  */
class TestdataCanarySpec extends SparkSpec {

  private def expect(table: String, df: => DataFrame,
      want: Seq[(String, DataType)]): Unit = {
    val got = df.schema.map(f => (f.name, f.dataType))
    // name-by-name so the failure message points at the first drifted
    // column, not a wall of two full schemas
    want.zipAll(got, ("<missing>", NullType), ("<extra>", NullType))
      .foreach { case ((wn, wt), (gn, gt)) =>
        assert(wn == gn && wt == gt,
          s"testdata layout drift: $table.$wn expected $wt, loader sees " +
            s"$gn: $gt — driver regenerated /root/testdata with a new " +
            "layout; adapt graft.Tables")
      }
    assert(want.size == got.size,
      s"testdata layout drift: $table has ${got.size} loader-visible " +
        s"columns, expected ${want.size}")
  }

  test("canary: every table's loader-visible schema is the pinned layout") {
    val s = spark
    expect("region", Tables.region(s, sf), Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    expect("nation", Tables.nation(s, sf), Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    expect("customer", Tables.customer(s, sf), Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    expect("supplier", Tables.supplier(s, sf), Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    expect("part", Tables.part(s, sf), Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    expect("orders", Tables.orders(s, sf), Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
    expect("lineitem", Tables.lineitem(s, sf), Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
    expect("events", Tables.events(s, sf), Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "ts_ns" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
    expect("documents", Tables.documents(s, sf), Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    expect("embeddings", Tables.embeddings(s, sf), Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("canary: events ts/ts_ns agree and are non-degenerate") {
    // value-level sanity beyond the schema: ts is exactly ts_ns at µs
    // precision, and the column actually spans time (a regeneration
    // that zeroed or constant-filled ts would pass the schema check).
    // ts_ns is truncated to µs on the comparison side so the invariant
    // holds even if a future regeneration carries nonzero
    // sub-microsecond residue (normalizeEvents truncates to µs — such
    // residue is layout drift, not a loader bug).
    val ev = Tables.events(spark, sf)
    val bad = ev.where(unix_micros(col("ts")) * lit(1000L) =!=
        col("ts_ns") - pmod(col("ts_ns"), lit(1000L)))
      .count()
    assert(bad == 0L, s"$bad events rows where ts != ts_ns at µs precision")
    val distinctTs = ev.select(countDistinct(col("ts"))).head().getLong(0)
    assert(distinctTs > 1L, "events.ts is constant — degenerate testdata")
  }
}
