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

  test("sampleFrames with the ImageIO GIF demuxer explodes real animated GIFs") {
    import spark.implicits._
    import javax.imageio.{IIOImage, ImageIO => IIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode

    // an animated GIF: nFrames solid-gray frames, per-frame delay in ms
    def gif(id: Long): (Array[Byte], Int, Seq[Int]) = {
      val nFrames = 2 + (id % 3).toInt
      val delaysMs = (0 until nFrames).map(i => 100 + 10 * i) // multiples of 10
      val writer = IIO.getImageWritersByFormatName("gif").next()
      val bos = new ByteArrayOutputStream()
      val ios = IIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { i =>
        val img = new BufferedImage(4, 4, BufferedImage.TYPE_3BYTE_BGR)
        val gray = (16 * (i + 1) + id % 16).toInt
        for (x <- 0 until 4; y <- 0 until 4)
          img.setRGB(x, y, gray << 16 | gray << 8 | gray)
        val meta = writer.getDefaultImageMetadata(new ImageTypeSpecifier(img), null)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val gce = new IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", (delaysMs(i) / 10).toString) // centiseconds
        root.appendChild(gce)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      (bos.toByteArray, nFrames, delaysMs)
    }

    val fixtures = (0L until 12L).map(id => (id, gif(id)))
    val ds = fixtures.map { case (id, (bytes, _, _)) => RawMedia(id, bytes) }
      .toDS().repartition(3)
    val got = Multimodal.sampleFrames(ds, Multimodal.demuxGif _)
      .collect().groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    fixtures.foreach { case (id, (bytes, nFrames, delaysMs)) =>
      val fs = got(id)
      assert(fs.length == nFrames, s"doc $id frame count")
      // offsets accumulate the real per-frame delays from the container
      val wantOffsets = delaysMs.scanLeft(0)(_ + _).dropRight(1)
      assert(fs.map(_.offset_ms).toSeq == wantOffsets, s"doc $id offsets")
      // solid-gray frames survive palette quantization exactly
      fs.zipWithIndex.foreach { case (f, i) =>
        assert(f.frame_sig == 16 * (i + 1) + (id % 16).toInt, s"doc $id frame $i sig")
      }
      assert(new String(bytes.take(6), "US-ASCII").startsWith("GIF8"))
    }
  }

  test("resize with the Java2D codec scales real PNGs into the box") {
    import spark.implicits._
    // larger-than-box images so the scale genuinely shrinks
    def bigPng(id: Long): (Array[Byte], Int, Int) = {
      val (w, h) = (40 + (id % 30).toInt, 50 + (id % 20).toInt)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((id * 131 + x * 17 + y * 3) & 0xFFFFFF).toInt)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", bos))
      (bos.toByteArray, w, h)
    }
    val fixtures = (0L until 15L).map(id => (id, bigPng(id)))
    val ds = fixtures.map { case (id, (bytes, _, _)) => RawMedia(id, bytes) }
      .toDS().repartition(3)
    val got = Multimodal.resize(ds, Multimodal.resizeImage _)
      .collect().map(r => r.doc_id -> r).toMap
    fixtures.foreach { case (id, (_, w, h)) =>
      val r = got(id)
      val m = math.max(w, h)
      assert(r.out_w == math.max(1, w * Multimodal.ResizeBox / m), s"doc $id out_w")
      assert(r.out_h == math.max(1, h * Multimodal.ResizeBox / m), s"doc $id out_h")
      assert(math.max(r.out_w, r.out_h) == Multimodal.ResizeBox, s"doc $id box fit")
      assert(r.out_len > 0, s"doc $id re-encoded bytes")
    }
  }

  test("the codec seam rejects non-image bytes instead of fabricating metadata") {
    val junk = Array.tabulate[Byte](16)(_.toByte)
    intercept[IllegalArgumentException](Multimodal.decodePng(junk))
    // while the stub (the oracle twin) happily decodes the same bytes
    val s = Multimodal.decodeStub(junk)
    assert(s.width == 1 && s.height == 2 && s.byteLen == 16)
  }

  test("imageMetaReal: seed-rendered PNG round-trips through the real decoder") {
    import spark.implicits._
    // arbitrary seeds, including edge bytes (0x00, 0xFF)
    val seeds = (0L until 30L).map { id =>
      RawMedia(id, Array.tabulate[Byte](16)(i =>
        ((id * 2654435761L + i * 97) & 0xFF).toByte))
    } :+ RawMedia(30L, Array.fill[Byte](16)(0)) :+
      RawMedia(31L, Array.fill[Byte](16)(0xFF.toByte))
    val got = Multimodal.imageMetaReal(seeds.toDS().repartition(4))
      .collect().map(d => d.doc_id -> d).toMap
    seeds.foreach { m =>
      val seed = m.media
      val d = got(m.doc_id)
      val (w, h) = ((seed(0) & 0xFF) % 16 + 1, (seed(1) & 0xFF) % 16 + 1)
      assert(d.width == w && d.height == h, s"doc ${m.doc_id} dims")
      assert(d.channels == 3, s"doc ${m.doc_id} channels")
      // the solid fill survives PNG compression bit-exactly
      assert(d.pixel_sum ==
        w.toLong * h * ((seed(2) & 0xFF) + (seed(3) & 0xFF) + (seed(4) & 0xFF)),
        s"doc ${m.doc_id} raster checksum")
      // and the wire bytes really are a PNG container
      assert(Multimodal.renderPng(seed).take(8).map(_ & 0xFF).toSeq ==
        Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A),
        s"doc ${m.doc_id} PNG magic")
    }
  }

  test("audioMetaReal: seed-rendered WAV header parses back exactly") {
    import spark.implicits._
    val seeds = (0L until 30L).map { id =>
      RawMedia(id, Array.tabulate[Byte](16)(i =>
        ((id * 40503L + i * 31 + 7) & 0xFF).toByte))
    } :+ RawMedia(30L, Array.fill[Byte](16)(0)) :+
      RawMedia(31L, Array.fill[Byte](16)(0xFF.toByte))
    val got = Multimodal.audioMetaReal(seeds.toDS().repartition(4))
      .collect().map(a => a.doc_id -> a).toMap
    seeds.foreach { m =>
      val seed = m.media
      val a = got(m.doc_id)
      assert(a.sample_rate == 8000 + (seed(5) & 0xFF) * 100, s"doc ${m.doc_id} rate")
      assert(a.channels == (seed(6) & 1) + 1, s"doc ${m.doc_id} channels")
      assert(a.frames == (seed(7) & 0xFF) * 32 + (seed(8) & 0xFF) % 32 + 1,
        s"doc ${m.doc_id} frames")
      // RIFF/WAVE magic on the wire
      val wav = Multimodal.renderWav(seed)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
        new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc ${m.doc_id} WAV magic")
    }
  }
}
