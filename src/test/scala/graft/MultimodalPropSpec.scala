package graft

import scala.util.Random

import graft.llm.Multimodal

/** Totality fuzz for the header parsers: they are byte-walkers fed
  * whatever a 100 TB corpus contains, and one uncaught
  * ArrayIndexOutOfBounds / infinite marker walk on an adversarial
  * payload kills the whole decode stage — so every parser must return
  * an Option on ANY input, including truncations and bit-flips of valid
  * headers (the inputs most likely to steer a walker past a bounds
  * check: lengths and offsets that ALMOST parse). Seeded, so failures
  * reproduce.
  */
class MultimodalPropSpec extends SparkSpec {

  private val rng = new Random(4242)

  private def parsersTotalOn(b: Array[Byte], label: String): Unit = {
    try {
      Multimodal.parseDims(b)
      Multimodal.parseWav(b)
      Multimodal.parseMp4DurationMs(b)
      ()
    } catch {
      case e: Throwable =>
        fail(s"parser threw on $label (len=${b.length}, " +
          s"head=${b.take(16).map("%02x".format(_)).mkString}): $e")
    }
  }

  test("parsers are total on arbitrary byte arrays") {
    for (_ <- 1 to 400) {
      val len = rng.nextInt(2000)
      val b = new Array[Byte](len)
      rng.nextBytes(b)
      parsersTotalOn(b, "random bytes")
    }
    parsersTotalOn(Array.empty[Byte], "empty")
  }

  test("parsers are total on truncations and bit-flips of valid headers") {
    val valid: Seq[Array[Byte]] = Seq(
      Multimodal.pngPayload(1920, 1080, "body".getBytes("UTF-8")),
      Multimodal.jpegPayload(640, 480, "body".getBytes("UTF-8")),
      Multimodal.wavPayload(44100, 2, 16, 256),
      Multimodal.mp4Payload(600, 123456L))
    for (base <- valid) {
      // every truncation point: the almost-parses bounds checks must survive
      for (cut <- 0 to base.length)
        parsersTotalOn(base.take(cut), "truncation")
      // random single-byte flips, including in size/offset fields
      for (_ <- 1 to 300) {
        val b = base.clone()
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        parsersTotalOn(b, "bit-flip")
      }
      // flipped THEN truncated: corrupt sizes with missing tails
      for (_ <- 1 to 100) {
        val b = base.clone()
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        parsersTotalOn(b.take(rng.nextInt(b.length + 1)), "flip+truncate")
      }
    }
  }

  test("parsers are deterministic: same bytes, same result") {
    for (_ <- 1 to 50) {
      val b = new Array[Byte](rng.nextInt(500))
      rng.nextBytes(b)
      assert(Multimodal.parseDims(b) === Multimodal.parseDims(b.clone()))
      assert(Multimodal.parseWav(b) === Multimodal.parseWav(b.clone()))
      assert(Multimodal.parseMp4DurationMs(b) ===
        Multimodal.parseMp4DurationMs(b.clone()))
    }
  }
}
