package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{AudioGate, Multimodal}

/** Real-codec audio pipeline: JDK javax.sound.sampled WAV decode
  * inside the engine's mapPartitions batch shape — known synthetic
  * PCM clips in, exact waveform features out, corrupt bytes
  * tolerated. The mm_audio_features DuckDB gate re-verifies the same
  * kernel against analytic oracles at verify time; this spec pins the
  * kernel-level contract in CI. */
class MultimodalAudioSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("decodeAudio recovers exact features from a constant-amplitude clip") {
    // clip 0: kind 0 (constant), sr 8000, n 500, amp 1000
    val f = Multimodal.decodeAudio(0L, AudioGate.makeWav(0)).get
    assert(f.sample_rate == 8000L && f.channels == 1)
    assert(f.n_samples == 500L)
    assert(f.duration_sec == 500.0 / 8000L)
    assert(f.peak == 1000L, "constant clip peak must equal its amplitude")
    assert(f.rms == math.sqrt((500L * 1000L * 1000L).toDouble / 500L))
    assert(f.zero_crossings == 0L, "a DC signal never crosses zero")
  }

  test("decodeAudio matches the closed-form waveform statistics of an LCG clip") {
    // clip 1: kind 1 (LCG pattern) — recompute features from the shared
    // closed form and require exact agreement with the decoded bytes
    val i = 1
    val n = 500 + (i * 131) % 1000
    val xs = (0 until n).map(j => AudioGate.sample(i, j))
    val f = Multimodal.decodeAudio(i.toLong, AudioGate.makeWav(i)).get
    assert(f.n_samples == n.toLong)
    assert(f.sample_rate == 16000L)
    assert(f.peak == xs.map(v => math.abs(v.toLong)).max)
    assert(f.rms == math.sqrt(xs.map(v => v.toLong * v).sum.toDouble / n))
    assert(f.zero_crossings ==
      xs.sliding(2).count { case Seq(a, b) => (a >= 0) != (b >= 0) })
  }

  test("audioFeatures decodes WAV blobs in the batch shape and drops corrupt ones") {
    import spark.implicits._
    val df = Seq(
      (0L, AudioGate.makeWav(0)),
      (1L, AudioGate.makeWav(1)),
      (2L, Array[Byte](82, 73, 70, 70, 1, 2, 3))) // truncated RIFF header
      .toDF("audio_id", "wav")
    val out = Multimodal.audioFeatures(df, "audio_id", "wav")
      .collect().map(r => r.getLong(0)).toSet
    assert(out == Set(0L, 1L), "corrupt blob must drop, not fail")
  }

  test("a structurally valid WAV with zero data frames is treated as undecodable") {
    // an empty data chunk decodes without exception but has no samples:
    // emitting it would ship rms = 0/0 = NaN downstream
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.emptyByteArray), fmt, 0L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decodeAudio(0L, bos.toByteArray).isEmpty,
      "zero-frame WAV must drop like other undecodable blobs")
  }

  test("the gate query decodes every synthesized clip") {
    val rows = SparkEntry.queries("mm_audio_features")(spark, TestSpark.sfDir).collect()
    assert(rows.length == AudioGate.NumClips,
      "every clip must decode — the gate corpus has no corrupt entries")
    // spot-check a 44.1 kHz clip (i % 3 == 2) decoded its header rate
    assert(rows.exists(_.getLong(1) == 44100L))
  }

  test("audio fingerprint is gain-invariant and separates different contours") {
    // hand-built WAVs: a ramp clip, the SAME ramp at 2x gain (every
    // window energy scales by 4 — the strict-compare bits cannot
    // move), and a reversed ramp (mirrored contour, different bits)
    def wav(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, j) =>
        pcm(2 * j) = (v & 0xff).toByte; pcm(2 * j + 1) = ((v >> 8) & 0xff).toByte }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val ramp = Array.tabulate(640)(j => (j * 10).toShort)
    val rampLoud = ramp.map(v => (v * 2).toShort)
    val rampRev = ramp.reverse
    val fp = Multimodal.decodeAudioFp(1L, wav(ramp)).get._2
    assert(fp == Multimodal.decodeAudioFp(2L, wav(rampLoud)).get._2,
      "a re-gained copy must land on the identical energy contour")
    assert(fp != Multimodal.decodeAudioFp(3L, wav(rampRev)).get._2,
      "a mirrored contour must produce different sign bits")
    // rising energy: every window beats its predecessor -> all 15 bits
    assert(fp == (1L << (Multimodal.AudioFpWindows - 1)) - 1)
    // too-short clips (empty windows) are rejected, not mis-hashed
    assert(Multimodal.decodeAudioFp(4L, wav(Array.tabulate(10)(_.toShort))).isEmpty)
  }

  test("decodeVad: burst/silence frames split on the exact half-mean cross-multiply, partial frames count, DC is one segment (r11)") {
    def wav(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { j =>
        pcm(2 * j) = (samples(j) & 0xff).toByte
        pcm(2 * j + 1) = ((samples(j) >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 380 samples: frame0 = 160×amp, frame1 = 160×0, frame2 = 60×amp
    // (partial) → voiced, silent, voiced: 2 segments
    val bursty = Array.tabulate(380)(j =>
      if (j < 160 || j >= 320) 1000.toShort else 0.toShort)
    val b = Multimodal.decodeVad(1L, wav(bursty)).get
    assert((b.n_samples, b.n_frames, b.n_voiced, b.n_segments) ==
      ((380L, 3L, 2L, 2L)), b.toString)
    // constant clip: every frame STRICTLY beats half the mean → one run
    val dc = Multimodal.decodeVad(2L, wav(Array.fill(320)(500.toShort))).get
    assert((dc.n_frames, dc.n_voiced, dc.n_segments) == ((2L, 2L, 1L)), dc.toString)
    // VadGate clip 0 cross-check: recompute frames from the closed form
    val n0 = 800
    val xs = (0 until n0).map(j => graft.multimodal.VadGate.sample(0, j).toLong)
    val total = xs.map(v => v * v).sum
    val frames = xs.grouped(Multimodal.VadFrameLen).toSeq
    val vs = frames.map(f => BigInt(2) * f.map(v => v * v).sum * n0 > BigInt(total) * f.size)
    val g = Multimodal.decodeVad(0L, graft.multimodal.VadGate.makeWav(0)).get
    assert(g.n_voiced == vs.count(identity).toLong, s"$g vs $vs")
    assert(g.n_segments ==
      vs.zip(false +: vs).count { case (c, p) => c && !p }.toLong, s"$g vs $vs")
  }
}
