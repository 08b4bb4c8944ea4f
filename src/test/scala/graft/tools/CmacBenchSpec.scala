package graft.tools

import graft.codec.LorawanCrypto
import org.scalatest.funsuite.AnyFunSuite

class CmacBenchSpec extends AnyFunSuite {
  test("cmac kernel throughput", org.scalatest.Tag("bench")) {
    val msg = Array.tabulate[Byte](19)(_.toByte)
    var sink = 0
    for (w <- 1 to 2) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 200000) {
        val key = Array.tabulate[Byte](16)(b => ((i >> (b % 4)) & 0xff).toByte)
        val s = new LorawanCrypto.CmacSession(key)
        var j = 0
        while (j < 8) { sink ^= s.cmac(msg)(0); j += 1 }
        i += 1
      }
      info(f"pass $w: ${(System.nanoTime() - t0) / 1e9}%.2f s for 200k sessions x 8 cmacs (sink=$sink)")
    }
  }
}
