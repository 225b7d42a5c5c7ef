package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.llm.{Multimodal, RawMedia}

/** Real-codec proof for the multimodal seam: genuine PNG bytes (encoded
  * with the JDK's own ImageIO, deterministic pixels from doc_id) travel
  * the SAME typed mapPartitions path the registered `mm_image_meta` entry
  * uses — only the codec argument differs ([[Multimodal.decodePng]] vs
  * the oracle-replayable stub).
  */
class MultimodalSpec extends SparkSuite {

  /** Deterministic little PNG: (1 + id%5) × (2 + id%7), pixel =
    * f(id, x, y). Real compression, real header, real IDAT.
    */
  private def png(id: Long): (Array[Byte], Int, Int) = {
    val (w, h) = (1 + (id % 5).toInt, 2 + (id % 7).toInt)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((id * 2654435761L + x * 97 + y) & 0xFFFFFF).toInt)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    (bos.toByteArray, w, h)
  }

  test("decodeMeta with the ImageIO codec recovers true PNG dimensions") {
    import spark.implicits._
    val fixtures = (0L until 40L).map(id => (id, png(id)))
    val ds = fixtures.map { case (id, (bytes, _, _)) => RawMedia(id, bytes) }
      .toDS().repartition(4)
    val got = Multimodal.decodeMeta(ds, Multimodal.decodePng _)
      .collect().map(d => d.doc_id -> d).toMap
    assert(got.size == 40)
    fixtures.foreach { case (id, (bytes, w, h)) =>
      val d = got(id)
      assert(d.width == w, s"doc $id width")
      assert(d.height == h, s"doc $id height")
      assert(d.channels == 3, s"doc $id channels")
      assert(d.byte_len == bytes.length, s"doc $id byte_len")
      // it really is a PNG container, not a byte-poke fixture
      assert(bytes.take(8).map(_ & 0xFF).toSeq ==
        Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
    }
  }

  test("decodeAudioMeta with the javax.sound codec recovers true WAV header facts") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(id: Long): (Array[Byte], Int, Int, Long) = {
      val rate = 8000 + (id % 4).toInt * 4000
      val channels = 1 + (id % 2).toInt
      val frames = 100L + id * 7
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val pcm = new Array[Byte](frames.toInt * fmt.getFrameSize)
      var i = 0
      while (i < pcm.length) { pcm(i) = ((id * 31 + i * 7) & 0xFF).toByte; i += 1 }
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      (bos.toByteArray, rate, channels, frames)
    }
    val fixtures = (0L until 24L).map(id => (id, wav(id)))
    val ds = fixtures.map { case (id, (bytes, _, _, _)) => RawMedia(id, bytes) }
      .toDS().repartition(3)
    val got = Multimodal.decodeAudioMeta(ds, Multimodal.decodeWav _)
      .collect().map(a => a.doc_id -> a).toMap
    fixtures.foreach { case (id, (bytes, rate, ch, frames)) =>
      val a = got(id)
      assert(a.sample_rate == rate, s"doc $id rate")
      assert(a.channels == ch, s"doc $id channels")
      assert(a.frames == frames, s"doc $id frames")
      // genuinely a RIFF/WAVE container
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    }
  }

  test("the codec seam rejects non-image bytes instead of fabricating metadata") {
    val junk = Array.tabulate[Byte](16)(_.toByte)
    intercept[IllegalArgumentException](Multimodal.decodePng(junk))
    // while the stub (the oracle twin) happily decodes the same bytes
    val s = Multimodal.decodeStub(junk)
    assert(s.width == 1 && s.height == 2 && s.byteLen == 16)
  }
}
