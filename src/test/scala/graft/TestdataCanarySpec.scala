package graft

/** Testdata-drift canary: pins the Spark-side schema of every driver table
  * at sf0.001 (as read through `Queries.table`, the single read entry
  * point all queries share).
  *
  * Why: between rounds 4 and 5 the driver regenerated the parquet with
  * `ts`/date columns as TIMESTAMP_NTZ, `unix_micros` started throwing, and
  * three queries silently lost their correctness rows for two rounds —
  * the failure surfaced only in the external harness. This spec turns the
  * next silent regeneration into a loud, named `sbt test` failure at the
  * exact table/column that moved.
  *
  * On an INTENTIONAL regeneration: update the pins from
  * `Queries.table(spark, sfDir, t).schema` and re-check every query that
  * touches the changed column (grep the simpleString that changed).
  */
class TestdataCanarySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/events.parquet").exists()

  private val pinned = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint,ts:timestamp_ntz,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  test("driver testdata schemas match the pinned round-7 shapes") {
    assume(available, s"$sf not present")
    pinned.foreach { case (t, expected) =>
      val actual = Queries.table(spark, sf, t).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      assert(actual == expected,
        s"TESTDATA DRIFT in table '$t' — a column name or type changed; " +
          "re-audit every query touching it (the r5 TIMESTAMP_NTZ drift " +
          s"silently broke q57/q61/q94 for two rounds).\n  pinned: $expected" +
          s"\n  actual: $actual")
    }
  }
}
