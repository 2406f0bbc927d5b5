package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model._
import graft.store._

class StoreSpec extends AnyFunSuite {
  lazy val spark = SparkBase.spark
  val sf = "/root/testdata/sf0.001"

  lazy val store: RdfStore = RelToRdf.cached(spark, sf)

  test("load produces quads for every table") {
    val sc = store.scheme
    val byGraph = store.quads.groupBy("g").count().collect()
      .map(r => sc.decodeIri(r.getLong(0)) -> r.getLong(1)).toMap
    // customer: 150 rows x (5 cols + 1 fk)
    assert(byGraph("urn:g:customer") == 150 * 6)
    // lineitem: 6000 x (11 cols + 3 fks)
    assert(byGraph("urn:g:lineitem") == 6000 * 14)
    assert(byGraph("urn:g:region") == 5 * 2)
    assert(byGraph("urn:g:nation") == 25 * 4)
  }

  test("native inline string ids agree with the Scala codec") {
    // distinct l_returnflag values are 1-char strings -> inline
    val sc = store.scheme
    val p = sc.tryInlineIri("urn:p:lineitem:l_returnflag").get
    val ids = store.quads.filter(col("p") === p).select("o").distinct()
      .collect().map(_.getLong(0)).toSet
    val expect = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag").distinct().collect()
      .map(r => TermId.tryInlineString(r.getString(0)).get).toSet
    assert(ids == expect)
  }

  test("integer / timestamp / double encodings round-trip against raw table") {
    val sc = store.scheme
    // integer: part.p_size
    val pSize = sc.tryInlineIri("urn:p:part:p_size").get
    val sizes = store.quads.filter(col("p") === pSize).select("o").collect()
      .map(r => TermId.decodeInline(r.getLong(0)).lex.toLong).sorted
    val rawSizes = spark.read.parquet(s"$sf/part.parquet")
      .select("p_size").collect().map(_.getInt(0).toLong).sorted
    assert(sizes.toSeq == rawSizes.toSeq)
    // timestamp: orders.o_orderdate round-trips through the µs inline encoding
    val pDate = sc.tryInlineIri("urn:p:orders:o_orderdate").get
    val n = store.quads.filter(col("p") === pDate).count()
    assert(n == 1500)
    val one = store.quads.filter(col("p") === pDate).select("o").first().getLong(0)
    assert(TermId.tag(one) == TermId.TAG_DATETIME)
    val t = TermId.decodeInline(one).asInstanceOf[Lit]
    assert(t.datatype == Term.xsdDateTime)
    // double: lineitem.l_quantity goes to the dictionary with onum populated
    val pQty = sc.tryInlineIri("urn:p:lineitem:l_quantity").get
    val qtys = store.quads.filter(col("p") === pQty)
    assert(qtys.filter(col("onum").isNull).count() == 0)
    val sumGot = qtys.agg(sum("onum")).first().getDouble(0)
    val sumExp = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(sum("l_quantity")).first().getDouble(0)
    assert(math.abs(sumGot - sumExp) < 1e-6)
  }

  test("fk quads join lineitem to orders") {
    val sc = store.scheme
    val fkOrders = sc.tryInlineIri("urn:fk:orders").get
    val joined = store.quads.filter(col("p") === fkOrders).count()
    assert(joined == 6000)
  }

  test("dictionary terms materialize and ids are unique") {
    val total = store.terms.count()
    val distinctIds = store.terms.select("id").distinct().count()
    assert(total == distinctIds && total > 0)
    // every double literal is in the dictionary with its num
    val doubles = store.terms.filter(col("dt") === Term.xsdDouble)
    assert(doubles.filter(col("num").isNull).count() == 0)
  }
}
