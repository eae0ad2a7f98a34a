package graft

import org.apache.spark.sql.types._

/** Driver-testdata conformance: opens every sf0.01 parquet and asserts
  * the dtypes the GridSource helpers (and every oracle) assume. The
  * point is that dtype drift in the driver-generated testdata fails
  * HERE, in `sbt test`, instead of silently erroring 12 queries out of
  * the correctness artifacts (which is exactly what happened when
  * events.ts moved from TIMESTAMP(NANOS) to timestamp[us] in r10).
  *
  * Columns beyond the asserted set are allowed (additive drift is
  * harmless); missing columns or changed dtypes fail. */
class TestdataSchemaSpec extends SparkSpec {
  import TestdataSchemaSpec._

  val dir = "/root/testdata/sf0.01"

  test("testdata directory exists") {
    assert(new java.io.File(dir).isDirectory, s"$dir missing — driver contract broken")
  }

  Expected.foreach { case (table, cols) =>
    test(s"$table.parquet carries the assumed dtypes") {
      // TIMESTAMP(NANOS) columns are unreadable without the legacy
      // flag; set it so a reverted events.ts reports as LongType
      // instead of failing the scan itself
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$dir/$table.parquet").schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.foreach { case (name, ok) =>
        val got = byName.get(name)
        assert(got.isDefined, s"$table.$name missing (have: ${byName.keys.toSeq.sorted.mkString(", ")})")
        assert(ok(got.get), s"$table.$name is ${got.get.simpleString}, not an accepted dtype")
      }
    }
  }

  test("eventsTable normalizes ts to the raw-nanos long contract") {
    val df = GridSource.eventsTable(spark, dir)
    assert(df.schema("ts").dataType == LongType, "ts must be epoch nanos (long) after ingest")
    // sanity: values are nanos-scale (year-2000..2100 epoch range), so a
    // micros- or seconds-scale slip is caught by magnitude, not just type
    val r = df.selectExpr("min(ts)", "max(ts)").first()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo > 946684800L * 1000000000L, s"min ts $lo below year-2000 nanos — wrong scale?")
    assert(hi < 4102444800L * 1000000000L, s"max ts $hi above year-2100 nanos — wrong scale?")
  }
}

object TestdataSchemaSpec {
  private val isLong: DataType => Boolean = _ == LongType
  private val isInt: DataType => Boolean = d => d == IntegerType || d == LongType
  private val isDouble: DataType => Boolean = _ == DoubleType
  private val isString: DataType => Boolean = _ == StringType
  // ts has legitimately shipped as raw-nanos long AND as timestamp[us];
  // eventsTable normalizes both (asserted separately above)
  private val isTsLike: DataType => Boolean =
    d => d == LongType || d == TimestampType || d == TimestampNTZType
  private val isFloatArray: DataType => Boolean = {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** table -> (column -> dtype predicate) for every column a
    * GridSource helper, query, or oracle reads. */
  val Expected: Map[String, Map[String, DataType => Boolean]] = Map(
    "region" -> Map("r_regionkey" -> isInt, "r_name" -> isString),
    "nation" -> Map("n_nationkey" -> isInt, "n_name" -> isString, "n_regionkey" -> isInt),
    "customer" -> Map("c_custkey" -> isLong, "c_name" -> isString,
      "c_nationkey" -> isInt, "c_acctbal" -> isDouble, "c_mktsegment" -> isString),
    "supplier" -> Map("s_suppkey" -> isLong, "s_name" -> isString,
      "s_nationkey" -> isInt, "s_acctbal" -> isDouble),
    "part" -> Map("p_partkey" -> isLong, "p_name" -> isString, "p_brand" -> isString,
      "p_type" -> isString, "p_size" -> isInt, "p_retailprice" -> isDouble),
    "orders" -> Map("o_orderkey" -> isLong, "o_custkey" -> isLong,
      "o_orderstatus" -> isString, "o_totalprice" -> isDouble,
      "o_orderpriority" -> isString),
    "lineitem" -> Map("l_orderkey" -> isLong, "l_partkey" -> isLong,
      "l_suppkey" -> isLong, "l_linenumber" -> isInt, "l_quantity" -> isDouble,
      "l_extendedprice" -> isDouble, "l_discount" -> isDouble, "l_tax" -> isDouble,
      "l_returnflag" -> isString, "l_linestatus" -> isString),
    "events" -> Map("event_id" -> isLong, "ts" -> isTsLike, "user_id" -> isLong,
      "event_type" -> isString, "value" -> isDouble, "props" -> isString),
    "documents" -> Map("doc_id" -> isLong, "text" -> isString, "lang" -> isString,
      "source" -> isString, "n_chars" -> isLong),
    "embeddings" -> Map("vec_id" -> isLong, "embedding" -> isFloatArray,
      "label" -> isInt))
}
