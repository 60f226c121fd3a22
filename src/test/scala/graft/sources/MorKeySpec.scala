package graft.sources

import org.apache.spark.sql.graftbridge.ScanBridge
import org.scalatest.funsuite.AnyFunSuite

/** Data-file identity keys for delete bookkeeping: suffix after the LAST
  * `/data/`, full normalized path for externally-located files — never a
  * shared empty key (which would cross-match deletes between files). */
class MorKeySpec extends AnyFunSuite {

  test("in-table paths key by the suffix after the LAST /data/") {
    assert(ScanBridge.morKey("/wh/db/t/data/p1/f.parquet") == "p1/f.parquet")
    assert(ScanBridge.morKey("s3a://b/wh/t/data/f.parquet") == "f.parquet")
    // a table path that itself contains /data/ must anchor at the LAST one
    assert(ScanBridge.morKey("/data/lake/t/data/f.parquet") == "f.parquet")
    // scheme/qualification differences collapse to one key
    assert(ScanBridge.morKey("file:/wh/t/data/f.parquet") ==
      ScanBridge.morKey("file:///wh/t/data/f.parquet"))
  }

  test("externally-located files fall back to distinct normalized paths") {
    val a = ScanBridge.morKey("/elsewhere/a.parquet")
    val b = ScanBridge.morKey("/elsewhere/b.parquet")
    assert(a != b, "distinct external files must never share a key")
    assert(a.nonEmpty && b.nonEmpty)
    // the same file under different scheme qualification keys identically
    assert(ScanBridge.morKey("file:/ext/a.parquet") ==
      ScanBridge.morKey("file:///ext/a.parquet"))
    assert(ScanBridge.morKey("file:///ext/a.parquet") ==
      ScanBridge.morKey("/ext/a.parquet"))
    // bucket-qualified paths keep their authority (no cross-bucket collision)
    assert(ScanBridge.morKey("s3a://b1/ext/a.parquet") !=
      ScanBridge.morKey("s3a://b2/ext/a.parquet"))
  }
}
