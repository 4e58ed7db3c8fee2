package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace vs regex tokenization") {
    val df = Seq((1L, "Hello, world! 42 times")).toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.tokenCount("text"),
      TextAnalysis.regexTokenCount("text")).head()
    assert(r.getLong(0) === 4L)
    // hello , world ! 42 times
    assert(r.getLong(1) === 6L)
  }

  test("fingerprint is invariant to case, punctuation and extra whitespace") {
    val df = Seq((1L, "The   quick, brown fox!"), (2L, "the quick brown fox")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint("text")).as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("langId picks the language with the most stopword hits") {
    val docs = Seq(
      (1L, "the cat and the dog went to the house in the rain"),
      (2L, "der hund und die katze sind ein team nicht wahr"),
      (3L, "el perro y la casa de que los gatos una vez")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs).orderBy($"doc_id").collect()
    assert(out(0).getString(5) === "en")
    assert(out(1).getString(5) === "de")
    assert(out(2).getString(5) === "es")
  }

  test("qualityScore components are bounded and rounded") {
    val out = TextAnalysis.qualityScore(Tables.documents(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getDouble(4)
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("multimodal attachBinary: payload bytes + typed metadata struct") {
    val df = graft.operators.Multimodal.attachBinary(Tables.documents(spark, sfDir))
    assert(df.schema.fieldNames.toSeq === Seq("doc_id", "payload", "meta"))
    assert(df.schema("payload").dataType.simpleString === "binary")
    assert(df.schema("meta").dataType.simpleString === "struct<kind:string,width:int,height:int>")
    val r = df.orderBy($"doc_id").head()
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8").nonEmpty)
    assert(Set("image", "audio", "video").contains(r.getStruct(2).getString(0)))
  }

  test("charShingles produces distinct k-grams") {
    val out = Seq((1L, "abcabc")).toDF("doc_id", "text")
      .select(graft.operators.Dedup.charShingles("text", 3)).head.getSeq[String](0)
    assert(out.toSet === Set("abc", "bca", "cab"))
  }

  test("multimodal sampleFrames: one row per sampled chunk, deterministic checksums") {
    val media = Multimodal.mediaRecords(spark, Tables.documents(spark, sfDir))
      .filter($"kind" === "video")
    val frames = Multimodal.sampleFrames(media, frameBytes = 100, everyN = 2).collect()
    assert(frames.nonEmpty)
    // frame indices step by everyN and every sampled frame carries bytes
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq === fs.map(_.frame_idx).sorted.distinct.toSeq)
      fs.foreach(f => assert(f.frame_idx % 2 === 0 && f.frame_len > 0))
    }
    val again = Multimodal.sampleFrames(media, frameBytes = 100, everyN = 2).collect()
    assert(frames.map(_.checksum).sorted.toSeq === again.map(_.checksum).sorted.toSeq)
  }

  test("multimodal resize: payload resampled to the target pixel budget") {
    val media = Multimodal.mediaRecords(spark, Tables.documents(spark, sfDir)).limit(5)
    val out = Multimodal.resize(media, 320, 240).collect()
    out.foreach { r =>
      assert(r.width === 320 && r.height === 240)
      assert(r.payload.length === 320 * 240 / 64)
    }
  }

  test("multimodal featurize: deterministic 16-bin byte histogram summing to ~1") {
    val feats = Multimodal.featurize(spark, Tables.documents(spark, sfDir)).collect()
    assert(feats.length === 500)
    feats.take(10).foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9)
      assert(f.byte_len > 0)
    }
    // deterministic across runs
    val again = Multimodal.featurize(spark, Tables.documents(spark, sfDir)).collect()
    assert(feats.map(_.checksum).toSeq === again.map(_.checksum).toSeq)
  }
}
