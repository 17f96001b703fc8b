package graft.tools

import graft.operators.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Diagnostics main: stage-by-stage timing of the audio pipeline
  * (synthesize → decode → spectrum) to localize the ~2 s cost of the
  * audio queries vs the ~0.4 s image twins. usage: AuProbe <sfDir>
  */
object AuProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.get("local[32]", shufflePartitions = 32)
    val ids = Tables.load(spark, sfDir, "documents").select("doc_id")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val flat = ids.repartition(32)
      time("repartition.count")(flat.count())
      time("synthTone.count")(Multimodal.synthesizeToneWavs(flat).count())
      time("synthTone+spectrum.count")(
        Multimodal.audioSpectrum(Multimodal.synthesizeToneWavs(flat)).count())
      time("synthWav.count")(Multimodal.synthesizeWavs(flat).count())
      time("synthWav+decode.count")(
        Multimodal.decodeAudioMeta(Multimodal.synthesizeWavs(flat)).count())
      time("synthPhash+dhash.count")(
        Multimodal.imageDHash(Multimodal.synthesizePhashImages(flat)).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
