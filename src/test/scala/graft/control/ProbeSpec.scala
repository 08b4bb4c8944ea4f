package graft.control

import graft.SparkSuite
import java.nio.file.Files

/** F10 test-connection probe against a real (file-log) source. */
class ProbeSpec extends SparkSuite {

  test("probe succeeds against a live source and fails fast on a broken one") {
    val dir = Files.createTempDirectory("probe").toString
    Files.write(java.nio.file.Paths.get(dir, "000001.jsonl"),
      """{"topic":"t","message":"m","data_collector_id":1,"organization_id":1,"seq":1,"arrival_ts":1700000000000000}"""
        .getBytes("UTF-8"))
    val ok = Orchestrator.testProbe(() =>
      spark.readStream.format("graft.sources.MessageLogSource").load(dir)
        .writeStream.format("noop").start(), timeoutMs = 20000)
    assert(ok)

    // a source that throws on construction → ERROR, not a hang
    val bad = Orchestrator.testProbe(() =>
      throw new RuntimeException("connect refused"), timeoutMs = 2000)
    assert(!bad)
  }
}
