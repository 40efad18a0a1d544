package graft

import graft.scale.Multimodal

/** Scratch diagnostic (task: the q79 JRE-registry lesson, applied to the
  * image path): is `ImageIO.getImageReaders` / `getImageWritersByFormatName`
  * — an IIORegistry service lookup per RECORD in decodeFrames/syntheticGif —
  * a serialization point for 32 decode threads, the way the audio provider
  * registry was (96% lock wait)?
  *
  * Measures, on N threads × M assets each, wall + summed thread-CPU for:
  *   A. per-record lookup (the current shape): getImageReaders per decode,
  *      getImageWritersByFormatName per encode;
  *   B. per-thread reuse: one reader/writer looked up per thread, setInput/
  *      setOutput + reset per record (the per-partition-reuse candidate).
  *
  * A CPU fraction near 100% under A says the registry iteration is cheap
  * unsynchronized work (unlike the audio path, whose CPU fraction was 4%);
  * B quantifies what per-partition reuse would actually buy.
  */
object ProbeImageIO {
  def main(args: Array[String]): Unit = {
    val threads = if (args.length > 0) args(0).toInt else 32
    val perThread = if (args.length > 1) args(1).toInt else 1500
    javax.imageio.ImageIO.setUseCache(false)

    // one representative payload per thread (decode work constant per rep)
    def gif(id: Long): Array[Byte] =
      Multimodal.syntheticGif((4 + id % 16).toInt, (3 + id % 12).toInt,
        (0 until (2 + id % 5).toInt).map(i => ((id * 31 + i * 40) % 256).toInt))

    def grayMeans(reader: javax.imageio.ImageReader,
                  bytes: Array[Byte]): Double = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        var s = 0.0
        for (i <- 0 until n) {
          val img = reader.read(i)
          s += (img.getRGB(0, 0) & 0xff).toDouble
        }
        reader.reset()
        s / n
      } finally iis.close()
    }

    def run(label: String)(decodeOne: (Long, Array[Byte]) => Double): Unit = {
      val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      val payloads = (0L until threads.toLong).map(gif)
      val cpu = new java.util.concurrent.atomic.AtomicLong(0)
      val sink = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val c0 = tmx.getCurrentThreadCpuTime
          var i = 0
          var acc = 0.0
          while (i < perThread) { acc += decodeOne(t.toLong, payloads(t)); i += 1 }
          cpu.addAndGet(tmx.getCurrentThreadCpuTime - c0)
          sink.addAndGet(acc.toLong)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val cpuS = cpu.get / 1e9
      println(f"$label%-22s wall=$wall%7.2fs cpu=$cpuS%8.2fs " +
        f"cpuFrac=${cpuS / (wall * threads) * 100}%5.1f%% (sink=${sink.get})")
    }

    // warmup both paths (JIT + registry init)
    run("warmup-A") { (_, b) =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val r = javax.imageio.ImageIO.getImageReaders(iis).next()
      try { r.setInput(iis); val img = r.read(0); (img.getRGB(0, 0) & 0xff).toDouble }
      finally { r.dispose(); iis.close() }
    }

    println(s"== $threads threads x $perThread assets ==")
    // A: registry lookup per record (current decodeFrames shape)
    run("A per-record lookup") { (_, b) =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      val r = readers.next()
      try {
        r.setInput(iis)
        val n = r.getNumImages(true)
        var s = 0.0
        for (i <- 0 until n) s += (r.read(i).getRGB(0, 0) & 0xff).toDouble
        s / n
      } finally { r.dispose(); iis.close() }
    }
    // B: one reader per thread, reused
    locally {
      val perThreadReader = new ThreadLocal[javax.imageio.ImageReader] {
        override def initialValue(): javax.imageio.ImageReader =
          javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      }
      run("B per-thread reuse") { (_, b) => grayMeans(perThreadReader.get(), b) }
    }
    // encode side: per-record writer lookup vs per-thread reuse
    // (same one-8x8-frame workload so the delta isolates the lookup)
    run("A' encode per-record") { (_, _) =>
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.prepareWriteSequence(null)
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        w.endWriteSequence()
        bos.size.toDouble
      } finally { ios.close(); w.dispose() }
    }
    locally {
      val perThreadWriter = new ThreadLocal[javax.imageio.ImageWriter] {
        override def initialValue(): javax.imageio.ImageWriter =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      }
      run("B' encode reuse") { (t, _) =>
        val w = perThreadWriter.get()
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          w.setOutput(ios)
          w.prepareWriteSequence(null)
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          w.endWriteSequence()
          w.reset()
          bos.size.toDouble
        } finally ios.close()
      }
    }
  }
}
