package graft

import graft.sources.XmlaSource
import graft.sources.XmlaSource.DimMapping

/** XMLA decode on the actual mddataset wire shape (A1–A6): axis
  * captions, regex hierarchy mapping with raw fall-through, sparse
  * cells, ordinal addressing.
  */
class XmlaSpec extends SparkSpec {

  private val xml = """<?xml version="1.0"?>
<root xmlns="urn:schemas-microsoft-com:xml-analysis:mddataset">
  <Axes>
    <Axis name="Axis0">
      <Tuples>
        <Tuple><Member Hierarchy="[Measures]"><Caption>TY Net Sales USD</Caption></Member></Tuple>
        <Tuple><Member Hierarchy="[Measures]"><Caption>TY Orders</Caption></Member></Tuple>
      </Tuples>
    </Axis>
    <Axis name="Axis1">
      <Tuples>
        <Tuple>
          <Member Hierarchy="[Franchise].[Store Number Label]"><Caption>S1</Caption></Member>
          <Member Hierarchy="[Calendar].[Calendar Hierarchy]"><Caption>11/5/25</Caption></Member>
          <Member Hierarchy="[Offer Code].[Offer Code Hierarchy]"><Caption>PROMO1</Caption></Member>
        </Tuple>
        <Tuple>
          <Member Hierarchy="[Franchise].[Store Number Label]"><Caption>S2</Caption></Member>
          <Member Hierarchy="[Calendar].[Calendar Hierarchy]"><Caption>11/5/25</Caption></Member>
          <Member Hierarchy="[Offer Code].[Offer Code Hierarchy]"><Caption>PROMO2</Caption></Member>
        </Tuple>
        <Tuple>
          <Member Hierarchy="[Franchise].[Store Number Label]"><Caption>S3</Caption></Member>
          <Member Hierarchy="[Calendar].[Calendar Hierarchy]"><Caption>11/6/25</Caption></Member>
          <Member Hierarchy="[Offer Code].[Offer Code Hierarchy]"><Caption>PROMO1</Caption></Member>
        </Tuple>
      </Tuples>
    </Axis>
  </Axes>
  <CellData>
    <Cell CellOrdinal="0"><Value>1234.5</Value></Cell>
    <Cell CellOrdinal="1"><Value>10</Value></Cell>
    <Cell CellOrdinal="2"><Value>88</Value></Cell>
    <Cell CellOrdinal="4"><Value>55.5</Value></Cell>
    <Cell CellOrdinal="5"><Value>3</Value></Cell>
  </CellData>
</root>"""

  private val dims = Seq(
    DimMapping("Store Number", "store"),
    DimMapping("Calendar", "cal_date"))

  test("parse: captions, regex-mapped dims with fall-through, sparse cells") {
    val p = XmlaSource.parse(xml, dims)
    assert(p.measures == Seq("TY Net Sales USD", "TY Orders"))
    assert(p.tuples(0).take(2) == Seq("store" -> "S1", "cal_date" -> "11/5/25"))
    // unmapped hierarchy falls through to a cleaned raw name
    assert(p.tuples(0)(2)._1 == "Offer Code_Offer Code Hierarchy")
    assert(p.cells.toMap ==
      Map(0L -> "1234.5", 1L -> "10", 2L -> "88", 4L -> "55.5", 5L -> "3"))
  }

  test("read: decoded frame has dims + measure columns, nulls for NON EMPTY gaps") {
    val df = XmlaSource.read(spark, xml, dims)
    val rows = df.orderBy("store").collect()
    assert(df.columns.toSet ==
      Set("store", "cal_date", "Offer Code_Offer Code Hierarchy", "TY Net Sales USD", "TY Orders"))
    assert(rows(0).getAs[String]("TY Net Sales USD") == "1234.5")
    assert(rows(0).getAs[String]("TY Orders") == "10")
    assert(rows(1).getAs[String]("TY Net Sales USD") == "88")
    assert(rows(1).getAs[String]("TY Orders") == null) // ordinal 3 missing
    assert(rows(2).getAs[String]("cal_date") == "11/6/25")
    assert(rows(2).getAs[String]("TY Orders") == "3")
  }
}
