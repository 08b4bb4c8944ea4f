package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The native DotProductF expression: interpreted eval == codegen eval ==
  * UDF kernel, and the SQL registration works. */
class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -0.25f), Array(2.0f, 8.0f)),
    (3L, Array.empty[Float], Array.empty[Float]))
    .toDF("id", "a", "b")

  test("expression value matches the UDF kernel bit-for-bit") {
    val rows = vecs
      .withColumn("e", GraftFunctions.dot(col("a"), col("b")))
      .withColumn("u", TextFunctions.dot_f(col("a"), col("b")))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)))
    }
    assert(rows.find(_.getLong(0) == 1L).get.getDouble(3) == 32.0)
  }

  test("SQL registration: graft_dot usable from spark.sql") {
    GraftFunctions.ensureRegistered(spark)
    vecs.createOrReplaceTempView("v")
    val out = spark.sql("SELECT id, graft_dot(a, b) AS d FROM v ORDER BY id").collect()
    assert(out(0).getDouble(1) == 32.0)
    assert(out(2).getDouble(1) == 0.0)
    // codec surface reachable from SQL too
    val jr = graft.codec.Lorawan.b64encode(
      Array(0x00.toByte) ++ graft.codec.Lorawan.hexToLe("55d239ac716f234d") ++
        graft.codec.Lorawan.hexToLe("b827eb891cf50003") ++
        Array(0xb7.toByte, 0xc9.toByte) ++ graft.codec.Lorawan.hexToBytes("7005c4a5"))
    val dec = spark.sql(s"SELECT phy_decode_b64('$jr') AS p")
      .select("p.m_type", "p.join_eui").collect().head
    assert(dec.getString(0) == "JoinRequest")
    assert(dec.getString(1) == "55d239ac716f234d")
  }

  test("null inputs yield null, not a crash") {
    val out = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
      .select(GraftFunctions.dot(col("a"), col("b")).as("d"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
