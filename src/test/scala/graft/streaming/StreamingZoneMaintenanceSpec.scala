package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.{DynamicPrune, ZoneMap}

/** The arrival loop: a file-source stream lands batches and the
  * zone/bloom/HLL sidecar stays fresh per micro-batch — the metadata
  * census answers EXACTLY mid-stream (which proves every live file is
  * fresh-covered), point lookups stay isolated to holder files, and a
  * checkpointed restart extends the table without reprocessing.
  */
class StreamingZoneMaintenanceSpec extends AnyFunSuite with SparkTestBase {

  test("per-batch sidecar refresh keeps censuses exact and lookups pruned") {
    val work = java.nio.file.Files.createTempDirectory("szm").toString
    val drop = s"$work/drop"
    val table = s"$work/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(drop))

    def lines(ids: Range): String =
      ids.map(i => s"""{"id":$i,"tag":"g${(i * 7919) % 100000}"}""").mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$drop/b1.jsonl"), lines(0 until 500))

    def startStream() = StreamingZoneMaintenance.start(
      spark,
      spark.readStream.schema("id long, tag string")
        .option("maxFilesPerTrigger", "1").json(drop),
      table, s"$work/ckpt",
      zoneCols = Seq("id"), bloomCols = Seq("tag"), hllCols = Seq("tag"))

    startStream().awaitTermination(120000)

    // metadata census answers EXACTLY mid-stream: nRows can only be
    // exact if every live file carries a fresh zone entry
    val agg1 = ZoneMap.aggFromManifest(spark, table, "id")
      .getOrElse(fail("fresh streamed table must answer the census"))
    assert(agg1.nRows === 500L)
    val ndv1 = ZoneMap.ndvFromManifest(spark, table, "tag")
      .getOrElse(fail("HLL census must answer"))
    assert(ndv1.lower <= 500L && 500L <= ndv1.upper)

    // second drop + checkpointed restart: only the new file processes
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$drop/b2.jsonl"), lines(500 until 800))
    startStream().awaitTermination(120000)

    val agg2 = ZoneMap.aggFromManifest(spark, table, "id").get
    assert(agg2.nRows === 800L)
    assert(spark.read.parquet(table).count() === 800L,
      "restart must extend, not reprocess")

    // bloom isolation holds on the streamed (batch-partitioned) table:
    // tag g<(123*7919)%100000> exists exactly once, in one batch file
    val key = s"g${(123L * 7919) % 100000}"
    val pr = DynamicPrune.prunedProbe(spark, table, "tag",
      spark.range(1).select(lit(key).as("k")))
    assert(pr.usedBlooms)
    assert(pr.filesTotal >= 2 && pr.filesKept === 1,
      s"one holder among ${pr.filesTotal} files, kept ${pr.filesKept}")
    assert(pr.df.filter(col("tag") === key).count() === 1L)
  }
}
