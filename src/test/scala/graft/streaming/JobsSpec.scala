package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.streaming.VideoSessionProcessor.{Config, FrameIn}
import org.apache.spark.sql.functions._

/** Batch end-to-end: ingest → msgpack wire → decode → detect →
  * MP4 sink → upload (the §3.1→§3.2→§3.3 chain on one box). */
class JobsSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic "video file": 1 frame per 16-byte block. A val
  // lambda, not a def — a def would capture the (non-serializable)
  // suite instance in the Spark closure.
  private val splitter: Array[Byte] => Seq[Array[Byte]] =
    bytes => bytes.grouped(16).toSeq

  test("ingest emits sampled, keyed msgpack frames; decode round-trips") {
    val fileBytes = Array.tabulate(160)(_.toByte) // 10 frames
    val files = Seq(("vidA", fileBytes)).toDS()
    val wire = Jobs.ingest(files, splitter, extractionInterval = 2)
    val decoded = FrameSerde.decodeMsgpackDF(wire.toDF("key", "value"))
    val rows = decoded.orderBy("frame_number").collect()
    assert(rows.length == 5) // every 2nd of 10 frames (S2)
    assert(rows.map(_.getAs[Int]("frame_number")).toSeq == Seq(0, 2, 4, 6, 8))
    assert(rows.forall(_.getAs[String]("video_id") == "vidA"))
    assert(rows.head.getAs[Array[Byte]]("frame_data").length == 16)
  }

  test("detect splits detections and completions; MP4 sink + upload complete the chain") {
    val frames = (0 until 20).map(i => FrameIn("vidA", i, i * 1000L)) ++
      (0 until 5).map(i => FrameIn("vidB", i, i * 1000L))
    val obs = org.apache.spark.sql.Observation("detect_metrics")
    val out = Jobs.detect(frames.toDS(), Config(inferEveryN = 2), observation = Some(obs))
    assert(out.detections.count() == 25)
    // A7 run-level counters collected during the pass
    val m = obs.get
    assert(m("n_detections") == 25L)
    assert(m("n_completions") == 2L)
    val comps = out.completions.orderBy("video_id").collect()
    assert(comps.map(_.getAs[String]("video_id")).toSeq == Seq("vidA", "vidB"))
    assert(comps.head.getAs[org.apache.spark.sql.Row]("stats").getAs[Long]("total_frames") == 20L)

    // MP4 sink stage over annotated frames; the returned manifest is
    // the sink's publish record (video_id → finalized path)
    val outDir = Files.createTempDirectory("graft-mp4").toString
    val annotated = frames.map(f => (f.video_id, f.frame_number, Array.fill(8)(f.frame_number.toByte))).toDS()
    val manifest = Jobs.writeAnnotatedVideos(annotated, outDir)
    val written = Files.list(Paths.get(outDir)).toArray.map(_.toString).sorted
    assert(written.length == 2)
    assert(written.forall(p => VideoSink.verify(Paths.get(p))))
    assert(manifest.keySet == Set("vidA", "vidB"))
    assert(manifest.values.toSet == written.toSet)

    // upload via Hadoop FileSystem (file:// here, s3a:// on a cluster);
    // stampFilepaths is the production step that writes the sink's
    // real output path into the completion event before publish
    val destBase = "file://" + Files.createTempDirectory("graft-s3").toString
    val localDir = Paths.get(outDir)
    val Seq(completion) = Jobs.stampFilepaths(
      Seq(VideoSessionProcessor.completionOf("vidA", transitionStateOf("vidA", 20))),
      manifest)
    assert(completion.local_filepath == manifest("vidA"))
    val uploaded = Jobs.uploadCompletions(spark, Seq(completion), localDir, destBase)
    assert(uploaded.nonEmpty)
    val destPath = Paths.get(new java.net.URI(uploaded.head._2))
    assert(Files.exists(destPath))
  }

  test("upload keeps suffix-bumped segment names (multi-batch videos)") {
    // A video spanning micro-batches gets suffix-bumped sink outputs;
    // the upload must mirror the STAMPED filename or every segment
    // lands on the same destination object and only the last survives.
    val localDir = Files.createTempDirectory("graft-mp4-seg")
    val destBase = "file://" + Files.createTempDirectory("graft-s3-seg")
    val names = Seq("v1_with_heatmaps.mp4", "v1_with_heatmaps_1.mp4")
    names.foreach(n => Files.write(localDir.resolve(n), Array[Byte](1, 2, 3)))
    val comps = names.map(n =>
      VideoSessionProcessor.completionOf("v1", transitionStateOf("v1", 2))
        .copy(local_filepath = localDir.resolve(n).toString))
    val uploaded = Jobs.uploadCompletions(spark, comps, localDir, destBase)
    val destNames = uploaded.map(u => Paths.get(new java.net.URI(u._2)).getFileName.toString)
    assert(destNames == names)
    assert(uploaded.forall(u => Files.exists(Paths.get(new java.net.URI(u._2)))))

    // a completion whose stamped file is absent (manifest-less
    // pass-through) is skipped — it must not fail the whole batch
    val ghost = comps.head.copy(local_filepath = "/videos/ghost_s1.mp4")
    val mixed = Jobs.uploadCompletions(spark, ghost +: comps, localDir, destBase)
    assert(mixed.size == comps.size)
  }

  private def transitionStateOf(vid: String, n: Int) = {
    val (st, _) = VideoSessionProcessor.transition(vid, None,
      (0 until n).map(i => FrameIn(vid, i, i * 1000L)),
      Config(), FireModel.SyntheticFireModel(), new java.sql.Timestamp(0L))
    st.get
  }

  test("fire-class predicate matches the reference keyword rules") {
    val df = Seq("Fire", "smoke plume", "wildfire", "fire truck", "fire hydrant",
      "fire station", "fire extinguisher", "campfire burning", "water").toDF("c")
    val got = df.select(col("c"), FireModel.isFireClass(col("c")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("Fire") && got("smoke plume") && got("wildfire") && got("campfire burning"))
    assert(!got("fire truck") && !got("fire hydrant") && !got("fire station")
      && !got("fire extinguisher") && !got("water"))
  }

  test("multimodal batched decode preserves byte-level features") {
    import graft.llm.Multimodal
    val rows = (0 until 150).map(i =>
      Multimodal.MediaRow(i.toLong, Array.tabulate(10 + i % 5)(j => (j + i).toByte)))
    val ds = rows.toDS()
    val feats = Multimodal.extractFeatures(ds, Multimodal.StubCodec, batchSize = 64)
      .collect().sortBy(_.doc_id)
    assert(feats.length == 150)
    assert(feats(3).n_bytes == 13)
    assert(feats(3).first_byte == 3)
    assert(feats(3).width == 16 + 13 % 625)
  }
}
