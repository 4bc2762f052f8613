package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` columns next to a typed metadata struct,
  * exactly how a 100 TB multimodal training-data pipeline carries them
  * (content-addressed bytes + queryable metadata, decode deferred to
  * the last possible stage).
  *
  * The Spark-side plumbing — schema, partition-preserving batch
  * transforms, deterministic feature shape — is real and tested, and
  * so is header DECODING for images ([[decodeImage]]: PNG/JPEG/GIF/BMP
  * via `javax.imageio`), audio ([[decodeAudio]]: WAV/AIFF/AU via
  * `javax.sound.sampled`), and video ([[decodeVideo]]: MP4/ISO-BMFF
  * box walk, pure JRE byte parsing) — no new dependency. Image RESIZE
  * is also real ([[resizeImage]]: ImageIO + bilinear Graphics2D,
  * headless-safe), and so is video FRAME EXTRACTION — for animated
  * GIFs ([[gifFrames]]: multi-frame ImageIO decode with per-frame
  * offset compositing) AND for MP4 ([[mp4FrameSlices]]: the
  * stsz/stsc/stco sample-table walk a demuxer runs, yielding each
  * frame's exact byte range with keyframes preferred — pure JRE, no
  * ffmpeg). Motion-JPEG MP4s (`stsd` fourcc `jpeg`/`mjpa`/`mjpb`)
  * go one step further: each sample is a self-contained JPEG, so
  * [[mp4DecodedFrames]] yields real video PIXELS too. For
  * inter-frame codecs (avc1/hevc) the demux boundary is where the
  * pure-JRE guarantee ends — pixel decode there needs a codec
  * runtime. Bytes no decode path claims fall back to the pluggable
  * [[ByteEmbedder]] lane — default: the DETERMINISTIC HASH EMBEDDING
  * ([[hashEmbedding]]), which keeps the fallback filterable and
  * reproducible rather than null. A learned-embedding model runtime
  * slots in as another ByteEmbedder without touching callers; the
  * seam is exercised with real learned weights by
  * [[ByteEmbedders.trainLinear]] (a logistic head over deterministic
  * byte statistics, trained by the engine's own gradient loop — this
  * container ships no external model runtime).
  */
object Multimodal {

  // ImageIO file-cache switch — centralized in [[MediaIoDefaults]]
  // (a JVM-global mutation; see the note there). This init covers the
  // driver; each ImageIO-touching UDF body calls ensure() so executor
  // JVMs flip it too.
  MediaIoDefaults.ensure()

  /** media(media_id, kind, bytes, meta(width, height, sample_rate,
    * format)) — the canonical multimodal row. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], format: Option[String])
  final case class MediaRecord(media_id: Long, kind: String,
      bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
      byte_len: Int, feature: Array[Float])

  /** Real image decode via `javax.imageio`: (width, height, format)
    * parsed from the actual header of any format the JRE registers a
    * reader for (PNG, JPEG, GIF, BMP, WBMP). Header-only — `getWidth`/
    * `getHeight` on the reader never decode pixel data, so per-row cost
    * is O(header bytes), not O(pixels); the stream is an in-memory
    * wrapper over the column value (no temp-file cache, which matters
    * when executors decode millions of rows). Null or unrecognizable
    * bytes → null, so corrupt blobs degrade to a filterable column
    * instead of failing the job. */
  val decodeImage: UserDefinedFunction = udf { bytes: Array[Byte] =>
    if (bytes == null) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0),
              r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
          } catch {
            // not just IOException: ImageIO readers throw unchecked
            // exceptions (IllegalArgument/IndexOutOfBounds/...) on
            // malformed bodies whose magic bytes matched — at millions
            // of rows one such blob must not fail the job
            case scala.util.control.NonFatal(_) => None
          } finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** Real audio header decode via `javax.sound.sampled` (also in the
    * JRE): (sample_rate, channels, format) from actual WAV/AIFF/AU
    * headers. Header-only like [[decodeImage]] — getAudioFileFormat
    * reads the container header, never the PCM frames. Null or
    * unrecognizable bytes → null. */
  val decodeAudio: UserDefinedFunction = udf { bytes: Array[Byte] =>
    if (bytes == null) None
    else try {
      val fileFmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val af = fileFmt.getFormat
      Some((af.getSampleRate.toInt, af.getChannels,
        fileFmt.getType.toString.toLowerCase(java.util.Locale.ROOT)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  final case class VideoMeta(width: Option[Int], height: Option[Int],
      duration_s: Option[Double], format: String)

  /** Pure-JRE MP4/ISO-BMFF header parse: walks the box tree to `moov`,
    * reads duration from `mvhd` (duration/timescale) and pixel size
    * from the first `trak`→`tkhd` with nonzero 16.16-fixed width/height
    * (audio-only tracks carry 0×0). `size==1` 64-bit largesize and
    * `size==0` to-end boxes are honored; any malformed structure stops
    * the walk at the last well-formed box rather than throwing. Returns
    * None unless both `ftyp` and `moov` parse — random bytes are not a
    * video. Header-only: `mdat` (the actual media payload, ~all of the
    * file) is never touched, so per-row cost is O(moov bytes). */
  /** Shared ISO-BMFF byte-walk primitives — [[parseMp4]] (header
    * metadata) and [[mp4SampleTable]] (frame extraction) walk the same
    * box grammar. */
  private final class BmffWalk(val bytes: Array[Byte]) {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def tag(off: Int): String = new String(bytes, off, 4,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    def typ(off: Int): String = tag(off + 4)
    // children of byte range [from, to) as (type, payloadStart, boxEnd)
    def boxes(from: Int, to: Int): List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var off = from
      var ok = true
      while (ok && off + 8 <= to) {
        val size32 = u32(off)
        val (payload, end) =
          if (size32 == 1L && off + 16 <= to) (off + 16L, off + u64(off + 8))
          else if (size32 == 0L) (off + 8L, to.toLong)
          else (off + 8L, off + size32)
        if (end < payload || end > to) ok = false // malformed: stop here
        else {
          out += ((typ(off), payload.toInt, end.toInt))
          off = end.toInt
        }
      }
      out.result()
    }
    /** First child box of type `t` in [from, to) → (payloadStart, end). */
    def find(from: Int, to: Int, t: String): Option[(Int, Int)] =
      boxes(from, to).find(_._1 == t).map(b => (b._2, b._3))
  }

  private[graft] def parseMp4(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 16) return None
    val walk = new BmffWalk(bytes)
    import walk.{boxes, u32, u64}
    try {
      val top = boxes(0, bytes.length)
      val brand = top.find(_._1 == "ftyp").collect {
        case (_, p, e) if e - p >= 4 =>
          new String(bytes, p, 4,
            java.nio.charset.StandardCharsets.ISO_8859_1)
            .trim.toLowerCase(java.util.Locale.ROOT)
      }
      val moov = top.find(_._1 == "moov")
      if (brand.isEmpty || moov.isEmpty) None
      else {
        val inMoov = boxes(moov.get._2, moov.get._3)
        val duration = inMoov.find(_._1 == "mvhd").flatMap {
          case (_, p, e) =>
            val v1 = (bytes(p) & 0xff) == 1
            val tsOff = p + 4 + (if (v1) 16 else 8)
            val durEnd = tsOff + 4 + (if (v1) 8 else 4)
            if (durEnd > e) None
            else {
              val timescale = u32(tsOff)
              val dur = if (v1) u64(tsOff + 4) else u32(tsOff + 4)
              if (timescale == 0) None
              else Some(dur.toDouble / timescale.toDouble)
            }
        }
        val trackDims = inMoov.filter(_._1 == "trak").flatMap {
          case (_, p, e) =>
            boxes(p, e).find(_._1 == "tkhd").flatMap { case (_, tp, te) =>
              val v1 = (bytes(tp) & 0xff) == 1
              // after version+flags: creation/modification/trackID/
              // reserved/duration, then reserved(8) layer(2) altgroup(2)
              // volume(2) reserved(2) matrix(36), then 16.16 width/height
              val wOff = tp + 4 + (if (v1) 32 else 20) + 52
              if (wOff + 8 > te) None
              else Some(((u32(wOff) >>> 16).toInt,
                (u32(wOff + 4) >>> 16).toInt))
            }
        }
        val dims = trackDims.find { case (w, h) => w > 0 && h > 0 }
        Some(VideoMeta(dims.map(_._1), dims.map(_._2), duration,
          brand.get))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real video container header decode — MP4/ISO-BMFF via
    * [[parseMp4]], no ffmpeg needed for (width, height, duration,
    * brand). Null or non-MP4 bytes → null, same degrade-to-filterable
    * contract as [[decodeImage]]/[[decodeAudio]]. Frame EXTRACTION is
    * real too ([[mp4FrameSlices]] — the sample-table walk); only
    * PIXEL decode of the extracted frames needs a codec runtime. */
  val decodeVideo: UserDefinedFunction = udf { bytes: Array[Byte] =>
    parseMp4(bytes)
  }

  /** The video track's sample table: per-sample absolute byte offset
    * and size, plus the sync-sample (keyframe) numbers when an `stss`
    * box declares them (absent = every sample is sync, per ISO
    * 14496-12), plus the first `stsd` sample-entry fourcc (the codec —
    * `jpeg`/`mjpa` samples are per-frame JPEG images the JRE can
    * pixel-decode; `avc1`&c. need an external codec runtime). */
  private[graft] final case class Mp4SampleTable(offsets: Array[Long],
      sizes: Array[Long], syncs: Option[Array[Int]],
      codec: Option[String])

  /** Pure-JRE MP4 sample-table walk (stsz/stsc/stco|co64/stss): maps
    * every media sample of the video track to its absolute byte range
    * in the file — no ffmpeg, exactly the walk a demuxer runs before
    * any codec touches a byte. Track selection prefers the `mdia→hdlr`
    * handler `vide`; a file with no handler boxes falls back to the
    * first track carrying a sample table. Per ISO 14496-12: `stsz`
    * gives sizes (fixed or per-sample), `stco`/`co64` gives chunk start
    * offsets, `stsc` runs map chunks to samples-per-chunk (entry i
    * applies from its first_chunk until entry i+1's), and samples pack
    * back-to-back within a chunk. Malformed structure degrades to the
    * well-formed prefix ([[BmffWalk.boxes]]' contract) or None — never
    * a throw. Header-only cost: O(moov), `mdat` untouched. */
  private[graft] def mp4SampleTable(bytes: Array[Byte])
      : Option[Mp4SampleTable] = {
    if (bytes == null || bytes.length < 16) return None
    val walk = new BmffWalk(bytes)
    import walk.{boxes, find, tag, u32, u64}
    try {
      val top = boxes(0, bytes.length)
      val moov = top.find(_._1 == "moov").getOrElse(return None)
      // (stblPayloadStart, stblEnd, isVideoHandler) per track
      val stbls = boxes(moov._2, moov._3).filter(_._1 == "trak")
        .flatMap { case (_, tp, te) =>
          for {
            mdia <- find(tp, te, "mdia")
            minf <- find(mdia._1, mdia._2, "minf")
            stbl <- find(minf._1, minf._2, "stbl")
          } yield {
            val vide = find(mdia._1, mdia._2, "hdlr").exists {
              case (hp, he) => he - hp >= 12 && tag(hp + 8) == "vide" }
            (stbl._1, stbl._2, vide)
          }
        }
      val (sp, se, _) = stbls.find(_._3).orElse(stbls.headOption)
        .getOrElse(return None)
      val inStbl = boxes(sp, se)
      def box(t: String) = inStbl.find(_._1 == t)
      val (zp, ze) = box("stsz").map(b => (b._2, b._3)).getOrElse(return None)
      if (ze - zp < 12) return None
      val fixedSize = u32(zp + 4)
      val sampleCount = u32(zp + 8)
      // malformed counts must not size allocations: a variable-size
      // table must FIT its box; a fixed-size count is capped at one
      // sample per file byte (any real table is far under)
      if (sampleCount < 0 || sampleCount > bytes.length.toLong ||
        (fixedSize == 0L && zp + 12 + 4 * sampleCount > ze)) return None
      val n = sampleCount.toInt
      val sizes = new Array[Long](n)
      var i = 0
      while (i < n) {
        sizes(i) = if (fixedSize != 0L) fixedSize else u32(zp + 12 + 4 * i)
        i += 1
      }
      val chunkOffs: Array[Long] = {
        val stco = box("stco").map(b => (b._2, b._3, 4))
          .orElse(box("co64").map(b => (b._2, b._3, 8)))
          .getOrElse(return None)
        val (cp, ce, w) = stco
        if (ce - cp < 8) return None
        val cnt = u32(cp + 4)
        if (cnt < 0 || cp + 8 + w * cnt > ce) return None
        Array.tabulate(cnt.toInt)(j =>
          if (w == 4) u32(cp + 8 + 4 * j) else u64(cp + 8 + 8 * j))
      }
      // stsc runs: (firstChunk 1-based, samplesPerChunk)
      val runs: Array[(Long, Long)] = {
        val (scp, sce) = box("stsc").map(b => (b._2, b._3))
          .getOrElse(return None)
        if (sce - scp < 8) return None
        val cnt = u32(scp + 4)
        if (cnt < 0 || scp + 8 + 12 * cnt > sce) return None
        Array.tabulate(cnt.toInt)(j =>
          (u32(scp + 8 + 12 * j), u32(scp + 8 + 12 * j + 4)))
      }
      if (runs.isEmpty || chunkOffs.isEmpty) return None
      val offsets = new Array[Long](n)
      var si = 0
      var ci = 0            // 0-based chunk index
      var ri = 0            // current stsc run
      while (si < n && ci < chunkOffs.length) {
        while (ri + 1 < runs.length && runs(ri + 1)._1 <= ci + 1) ri += 1
        var off = chunkOffs(ci)
        var j = 0L
        while (j < runs(ri)._2 && si < n) {
          offsets(si) = off; off += sizes(si); si += 1; j += 1
        }
        ci += 1
      }
      // a table whose chunks run out early keeps its well-formed prefix
      val m = si
      val syncs = box("stss").map(b => (b._2, b._3)).flatMap {
          case (yp, ye) =>
        if (ye - yp < 8) None
        else {
          val cnt = u32(yp + 4)
          if (cnt < 0 || yp + 8 + 4 * cnt > ye) None
          else Some(Array.tabulate(cnt.toInt)(j =>
            u32(yp + 8 + 4 * j).toInt))
        }
      }
      // stsd: full box, entry_count at +4, first entry = size(4) +
      // fourcc(4) — the codec tag; absent/truncated → None
      val codec = box("stsd").flatMap { b =>
        val (dp, de) = (b._2, b._3)
        if (de - dp >= 16) Some(tag(dp + 12)) else None
      }
      if (m == 0) None
      else Some(Mp4SampleTable(offsets.take(m), sizes.take(m), syncs,
        codec))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Up to `n` evenly-spaced frame byte slices from an MP4 — the real
    * demux step (what ffmpeg's packet reader produces before a codec
    * runs): each slice is one media sample's exact byte range per the
    * sample table. Sync samples (keyframes) are preferred when `stss`
    * declares them — they are the independently-decodable frames a
    * downstream decoder wants. Samples whose declared range falls
    * outside the file (truncated download, fragmented MP4 whose data
    * lives elsewhere) are skipped; None when nothing valid remains. */
  private[graft] def mp4FrameSlices(bytes: Array[Byte], n: Int)
      : Option[IndexedSeq[Array[Byte]]] =
    mp4SampleTable(bytes).flatMap(st => mp4FrameSlices(bytes, n, st))

  /** Overload threading an ALREADY-PARSED sample table so callers
    * that parsed the moov once ([[mp4DecodedFrames]],
    * [[extractFeatures]]' video arm) don't walk the same header
    * again per row. */
  private[graft] def mp4FrameSlices(bytes: Array[Byte], n: Int,
      st: Mp4SampleTable): Option[IndexedSeq[Array[Byte]]] =
    if (n <= 0) None
    else {
      val cand: IndexedSeq[Int] = st.syncs match {
        case Some(ss) => ss.iterator.map(_ - 1)
          .filter(i => i >= 0 && i < st.sizes.length).toIndexedSeq
        case None => 0 until st.sizes.length
      }
      // overflow-safe range check: a malformed co64 can declare an
      // offset near Long.MaxValue, so `offset + size` may wrap
      // negative and sneak past a naive `<= length` — compare the
      // SIZE against the remaining room instead (never throw on
      // corrupt bytes; skip the sample)
      val valid = cand.filter { i =>
        st.offsets(i) >= 0 && st.sizes(i) > 0 &&
          st.offsets(i) <= bytes.length &&
          st.sizes(i) <= bytes.length - st.offsets(i)
      }
      if (valid.isEmpty) None
      else {
        val m = math.min(n, valid.length)
        Some((0 until m).map { i =>
          val s = valid((i.toLong * valid.length / m).toInt)
          java.util.Arrays.copyOfRange(bytes, st.offsets(s).toInt,
            (st.offsets(s) + st.sizes(s)).toInt)
        })
      }
    }

  /** JPEG-in-MP4 pixel decode (fourcc `jpeg`/`mjpa`/`mjpb` — the
    * Motion-JPEG family): each media sample IS a self-contained JPEG
    * image, so the JRE decodes REAL video frame pixels with no
    * external codec runtime. Up to `n` evenly-spaced decoded frames
    * (keyframes preferred via the sample-table walk); None when the
    * codec isn't JPEG-family or nothing decodes — degrade-to-
    * filterable, the caller falls back to container-level features. */
  private[graft] def mp4DecodedFrames(bytes: Array[Byte], n: Int)
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    mp4DecodedFrames(bytes, n, mp4SampleTable(bytes))

  /** Overload over an already-parsed sample table — one moov walk per
    * row no matter how many stages consume it. */
  private[graft] def mp4DecodedFrames(bytes: Array[Byte], n: Int,
      table: Option[Mp4SampleTable])
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    table match {
      case Some(st) if st.codec.exists(c =>
          c == "jpeg" || c == "mjpa" || c == "mjpb") =>
        mp4FrameSlices(bytes, n, st).flatMap { slices =>
          val imgs = slices.flatMap { s =>
            MediaIoDefaults.ensure()
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(s)))
            catch { case scala.util.control.NonFatal(_) => None }
          }
          if (imgs.isEmpty) None else Some(imgs)
        }
      case _ => None
    }

  /** Real image resize on the JRE: ImageIO decode → bilinear
    * Graphics2D scale so the longest side equals `maxDim` → PNG
    * re-encode. Images already within bounds pass through UNCHANGED
    * (no decode-reencode churn, no upscaling). All of java.awt.image
    * used here is headless-safe. Null, undecodable, or non-image bytes
    * → null (same degrade-to-filterable contract as [[decodeImage]]);
    * this is the one media op that must touch pixels, so per-row cost
    * is O(pixels) — run it AFTER metadata-level filtering has pruned
    * the corpus, not before. */
  /** Cheap magic-byte screen so non-image bytes (common in mixed-media
    * corpora) skip the ImageIO reader machinery. Covers the JRE's
    * registered decoders: PNG, JPEG, GIF, BMP, TIFF (both byte
    * orders), and WBMP (whose 0x00 0x00 prefix is generic — such bytes
    * fall through to ImageIO, which settles it; the screen only has to
    * be a cheap NO for obvious junk, never a wrong no for real
    * images). */
  private def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N') ||
      (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) ||        // JPEG
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') ||
      (bytes(0) == 'B' && bytes(1) == 'M') ||
      (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42) ||      // TIFF LE
      (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
        bytes(3) == 42) ||                                           // TIFF BE
      (bytes(0) == 0 && bytes(1) == 0))                              // WBMP

  /** Shared decode preamble: magic-screened ImageIO access with the
    * degrade-to-None contract. `headerOnly = true` reads just the
    * dimensions (no pixel decode — the decodeImage pattern);
    * otherwise the image is fully decoded. Returns (dims, image-if-
    * decoded, reader-reported format). */
  private def readImage(bytes: Array[Byte], headerOnly: Boolean)
      : Option[(Int, Int, Option[java.awt.image.BufferedImage], String)] =
    if (bytes == null || !looksLikeImage(bytes)) None
    else try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
            if (headerOnly)
              Some((r.getWidth(0), r.getHeight(0), None, fmt))
            else {
              val img = r.read(0)
              Some((img.getWidth, img.getHeight, Some(img), fmt))
            }
          } catch {
            case scala.util.control.NonFatal(_) => None
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  val resizeImage: UserDefinedFunction =
    udf { (bytes: Array[Byte], maxDim: Int) =>
      if (maxDim <= 0) None
      // header-only first: pass-through rows (already within bounds —
      // the common case on a mostly-conformant corpus) never pay the
      // O(pixels) decode
      else readImage(bytes, headerOnly = true).flatMap {
        case (w0, h0, _, _) if w0 <= maxDim && h0 <= maxDim => Some(bytes)
        case _ => readImage(bytes, headerOnly = false).flatMap {
          case (_, _, None, _) => None
          case (_, _, Some(img), fmt) => try {
          val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          val nw = math.max(1, math.round(img.getWidth * scale).toInt)
          val nh = math.max(1, math.round(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            // transparent source pixels composite onto WHITE, the
            // curation-pipeline convention — an unfilled INT_RGB canvas
            // would silently turn alpha regions black
            g.setColor(java.awt.Color.WHITE)
            g.fillRect(0, 0, nw, nh)
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, nw, nh, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          // preserve the input format when the JRE can write it (JPEG
          // stays JPEG — a lossless PNG re-encode of a photo can GROW
          // past the input); the guarantee is pixel-bounded output,
          // not byte-bounded
          val fmtOut =
            if (javax.imageio.ImageIO.getImageWritersByFormatName(fmt)
              .hasNext) fmt
            else "png"
          MediaIoDefaults.ensure()
          javax.imageio.ImageIO.write(out, fmtOut, bos)
          Some(bos.toByteArray)
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }

  /** (left, top) placement of GIF frame `i` from its ImageDescriptor —
    * animated-GIF frames may be partial deltas positioned inside the
    * logical screen. Missing/unparseable metadata degrades to (0,0). */
  private def gifFrameOffset(r: javax.imageio.ImageReader,
      i: Int): (Int, Int) =
    try {
      val tree = r.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
      val kids = tree.getChildNodes
      var j = 0
      while (j < kids.getLength) {
        val nd = kids.item(j)
        if (nd.getNodeName == "ImageDescriptor") {
          val at = nd.getAttributes
          return (at.getNamedItem("imageLeftPosition").getNodeValue.toInt,
            at.getNamedItem("imageTopPosition").getNodeValue.toInt)
        }
        j += 1
      }
      (0, 0)
    } catch { case scala.util.control.NonFatal(_) => (0, 0) }

  /** GIF logical-screen (canvas) size from the stream metadata's
    * LogicalScreenDescriptor — the true compositing surface. Frame 0
    * is NOT a safe substitute: it may be smaller than the screen or
    * sit at a nonzero ImageDescriptor offset, and a frame-0-sized
    * canvas would silently clip every frame that extends past it. */
  private def gifScreenSize(r: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val tree = r.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
      val kids = tree.getChildNodes
      var j = 0
      while (j < kids.getLength) {
        val nd = kids.item(j)
        if (nd.getNodeName == "LogicalScreenDescriptor") {
          val at = nd.getAttributes
          val w = at.getNamedItem("logicalScreenWidth").getNodeValue.toInt
          val h = at.getNamedItem("logicalScreenHeight").getNodeValue.toInt
          if (w > 0 && h > 0) return Some((w, h))
        }
        j += 1
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL multi-frame decode for animated GIFs — the one video-frame
    * path the plain JRE can serve (ImageIO: `getNumImages(true)` /
    * `read(i)`). Returns `n` evenly-spaced fully-composited frames:
    * GIF frames after the first are often partial deltas at an offset,
    * so frames 0..maxWanted are drawn sequentially onto a canvas (the
    * logical-screen size from the stream metadata, falling back to
    * frame 0's bounds incl. its offset; transparent pixels composite
    * onto white, the same convention as [[resizeImage]]) and the
    * wanted indices are snapshotted. Compositing assumes do-not-dispose semantics — the
    * restore-to-background/previous disposal modes would need the
    * per-frame GraphicControlExtension; for frame-level feature
    * extraction the difference is noise. Non-GIF bytes → None. */
  private[graft] def gifFrames(bytes: Array[Byte], n: Int)
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    if (bytes == null || n <= 0 || bytes.length < 6 ||
      !(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')) None
    else try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val count = r.getNumImages(true)
            if (count <= 0) None
            else {
              val want: IndexedSeq[Int] =
                if (count <= n) 0 until count
                else if (n == 1) IndexedSeq(0)
                else (0 until n)
                  .map(i => (i.toLong * (count - 1) / (n - 1)).toInt).distinct
              val wantSet = want.toSet
              val first = r.read(0)
              val lastComposited = want.max
              val (cw, ch) = gifScreenSize(r).getOrElse {
                // no/unparseable LogicalScreenDescriptor: size the
                // canvas to cover EVERY composited frame's
                // offset+bounds — frame 0 alone would silently clip
                // later frames that extend past it (metadata-only
                // reads; no pixel decode here)
                var w = 0; var h = 0
                var j = 0
                while (j <= lastComposited) {
                  val (fx, fy) = gifFrameOffset(r, j)
                  w = math.max(w, fx + r.getWidth(j))
                  h = math.max(h, fy + r.getHeight(j))
                  j += 1
                }
                (w, h)
              }
              val canvas = new java.awt.image.BufferedImage(cw,
                ch, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = canvas.createGraphics()
              try {
                g.setColor(java.awt.Color.WHITE)
                g.fillRect(0, 0, canvas.getWidth, canvas.getHeight)
                val out = IndexedSeq.newBuilder[java.awt.image.BufferedImage]
                var i = 0
                val maxIdx = lastComposited
                while (i <= maxIdx) {
                  val img = if (i == 0) first else r.read(i)
                  val (dx, dy) = gifFrameOffset(r, i)
                  g.drawImage(img, dx, dy, null)
                  if (wantSet(i)) {
                    val snap = new java.awt.image.BufferedImage(canvas.getWidth,
                      canvas.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
                    val sg = snap.createGraphics()
                    try sg.drawImage(canvas, 0, 0, null) finally sg.dispose()
                    out += snap
                  }
                  i += 1
                }
                Some(out.result())
              } finally g.dispose()
            }
          } catch {
            case scala.util.control.NonFatal(_) => None
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    MediaIoDefaults.ensure()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Frame sampling: REAL for animated (and single-frame) GIFs —
    * `n` evenly-spaced composited frames via [[gifFrames]], re-encoded
    * as PNG — and REAL for MP4 — `n` evenly-spaced sample byte ranges
    * via [[mp4FrameSlices]]' stsz/stsc/stco walk, keyframes preferred
    * (encoded access units, the demuxer's output; pixel decode of
    * those needs a codec runtime). Every other container degrades to
    * slicing the byte stream into `n` equal chunks standing in for
    * frames. All paths share the array-of-binary output shape
    * downstream per-frame ops consume. */
  val sampleFrames: UserDefinedFunction =
    udf { (bytes: Array[Byte], n: Int) =>
      gifFrames(bytes, n) match {
        case Some(frames) => frames.map(pngBytes)
        case None => mp4FrameSlices(bytes, n) match {
          case Some(slices) => slices
          case None =>
            if (bytes == null || n <= 0) Seq.empty[Array[Byte]]
            else {
              val stride = math.max(1, bytes.length / n)
              (0 until math.min(n, bytes.length)).map(i =>
                bytes.slice(i * stride,
                  math.min(bytes.length, (i + 1) * stride)))
            }
        }
      }
    }

  /** Per-frame DECODED pixel stats for Motion-JPEG MP4s: `(width,
    * height, mean luminance 0..255)` per sampled frame — the
    * per-frame resolution/brightness gates a video-curation pipeline
    * filters on, computed from REAL decoded pixels (the samples are
    * JPEGs; no codec runtime involved). Non-MJPEG or undecodable
    * bytes → empty array, the degrade-to-filterable contract. */
  val videoFrameStats: UserDefinedFunction =
    udf { (bytes: Array[Byte], n: Int) =>
      mp4DecodedFrames(bytes, n).toSeq.flatten.map { img =>
        val lum = imageFeaturesOf(img)
          .map(f => f(3).toDouble * 255.0).getOrElse(0.0)
        (img.getWidth, img.getHeight, lum)
      }
    }

  /** Feature extraction over batches. Runs as `mapPartitions` so a real
    * implementation amortizes model/codec setup once per partition (the
    * Scala analog of a Pandas-UDF batch loop). Partitioning is
    * preserved — no shuffle. Images/audio/GIF/MP4 all get REAL
    * decoded features; only unrecognizable bytes take the
    * deterministic 8-float hash fold ([[hashEmbedding]] — the
    * documented learned-model extension point). */
  def extractFeatures(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    extractFeatures(spark, media, HashByteEmbedder)

  /** As above, with the unknown-bytes lane supplied by the caller —
    * the [[ByteEmbedder]] seam: a learned-model runtime (or the
    * in-repo [[ByteEmbedders.trainLinear]] linear head) replaces the
    * hash fold without any other call site changing. The embedder is
    * Serializable and ships with the closure, like broadcast
    * centroids. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord],
      embedder: ByteEmbedder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // mapPartitions so a model-based implementation can hoist its
      // setup here once per partition (the JRE codecs used below are
      // stateless and need none). Images and WAV/AIFF/AU audio get
      // REAL content features (pixel statistics / PCM energy); video
      // gets REAL per-frame pixel features for GIF and Motion-JPEG
      // MP4 containers and REAL container/sample-table features (fps,
      // bitrate proxy, keyframe density) for other MP4s, with a
      // magic-byte screen keeping non-media bytes off the decoder;
      // everything else falls back to the deterministic byte-hash
      // embedding — the documented extension point a learned-
      // embedding model runtime slots in behind.
      it.map { m =>
        val bytes = Option(m.bytes).getOrElse(Array.empty[Byte])
        val feat = m.kind match {
          case "image" => imageFeatures(bytes)
          case "audio" => audioFeatures(bytes)
          case "video" => videoFrameFeatures(bytes).orElse {
            // parse the moov ONCE; both MP4 stages share the table
            // (the GIF path above never reaches here for MP4 bytes)
            val st = mp4SampleTable(bytes)
            mjpegFrameFeatures(bytes, 4, st)
              .orElse(mp4Features(bytes, st))
          }
          case _ => None
        }
        MediaFeatures(m.media_id, m.kind, bytes.length,
          feat.getOrElse(embedder.embed(bytes)))
      }
    }
  }

  /** Real image features from decoded pixels: per-channel RGB means
    * (0..1), luminance mean and variance, aspect ratio, and the
    * normalized log-area — the filter signals (too dark, degenerate
    * aspect, tiny) an image-curation pipeline gates on before any
    * learned model. O(pixels); run after metadata pruning. */
  private[graft] def imageFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    readImage(bytes, headerOnly = false).flatMap {
      case (_, _, None, _) => None
      case (_, _, Some(img), _) => imageFeaturesOf(img)
    }

  /** [[imageFeatures]] core over an already-decoded image — shared by
    * the single-image path and the per-frame video path. */
  private[graft] def imageFeaturesOf(
      img: java.awt.image.BufferedImage): Option[Array[Float]] =
    {
      try {
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb, sy, syy) = (0.0, 0.0, 0.0, 0.0, 0.0)
        // bulk row reads: one getRGB call per ROW (batched conversion
        // inside awt), not one per pixel — this is the O(pixels) hot
        // loop of the media path
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val r = ((rgb >> 16) & 0xff) / 255.0
            val g = ((rgb >> 8) & 0xff) / 255.0
            val b = (rgb & 0xff) / 255.0
            val lum = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sy += lum; syy += lum * lum
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val meanY = sy / n
        Some(Array(
          (sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
          meanY.toFloat, math.max(0.0, syy / n - meanY * meanY).toFloat,
          (w.toDouble / h).toFloat,
          (math.log1p(n) / 20.0).toFloat, 0f))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Real video features for GIF containers: [[imageFeaturesOf]] over
    * up to `frames` evenly-spaced composited frames (see
    * [[gifFrames]]), averaged element-wise — the static-vs-animated /
    * brightness / degenerate-aspect gates of a video-curation
    * pipeline, from actual pixels. Non-GIF containers → None (the
    * caller tries [[mp4Features]], then the hash-embedding
    * fallback). */
  private[graft] def videoFrameFeatures(bytes: Array[Byte],
      frames: Int = 4): Option[Array[Float]] =
    gifFrames(bytes, frames).flatMap(imgs =>
      meanFrameFeatures(imgs.flatMap(imageFeaturesOf)))

  /** Real video PIXEL features for Motion-JPEG MP4s: the same
    * per-frame [[imageFeaturesOf]] average as the GIF path, over
    * frames decoded by [[mp4DecodedFrames]] — no codec runtime
    * needed, the samples are JPEGs. Non-MJPEG MP4s → None (the caller
    * falls back to [[mp4Features]]' container/sample-table gates). */
  private[graft] def mjpegFrameFeatures(bytes: Array[Byte],
      frames: Int = 4): Option[Array[Float]] =
    mjpegFrameFeatures(bytes, frames, mp4SampleTable(bytes))

  private[graft] def mjpegFrameFeatures(bytes: Array[Byte], frames: Int,
      table: Option[Mp4SampleTable]): Option[Array[Float]] =
    mp4DecodedFrames(bytes, frames, table).flatMap(imgs =>
      meanFrameFeatures(imgs.flatMap(imageFeaturesOf)))

  /** Element-wise mean over per-frame feature vectors. */
  private def meanFrameFeatures(feats: Seq[Array[Float]])
      : Option[Array[Float]] =
    if (feats.isEmpty) None
    else {
      val acc = new Array[Float](8)
      feats.foreach { f =>
        var i = 0
        while (i < acc.length) { acc(i) += f(i); i += 1 }
      }
      var i = 0
      while (i < acc.length) { acc(i) /= feats.size; i += 1 }
      Some(acc)
    }

  /** Real MP4 features from the container header + sample table (no
    * pixel decode needed): aspect ratio, normalized log-area, duration
    * (s), frames-per-second, normalized log mean-frame-bytes (the
    * bitrate proxy), keyframe ratio, normalized log frame count — the
    * resolution / fps / bitrate / keyframe-density gates a
    * video-curation pipeline filters on before any codec runs. */
  private[graft] def mp4Features(bytes: Array[Byte]): Option[Array[Float]] =
    mp4Features(bytes, mp4SampleTable(bytes))

  private[graft] def mp4Features(bytes: Array[Byte],
      st: Option[Mp4SampleTable]): Option[Array[Float]] =
    parseMp4(bytes).map { meta =>
      val n = st.map(_.sizes.length).getOrElse(0)
      val meanSize =
        if (n > 0) st.get.sizes.sum.toDouble / n else 0.0
      // no stss box = every sample is a sync sample (ISO 14496-12)
      val syncRatio =
        if (n == 0) 0.0
        else st.get.syncs.map(_.length.toDouble / n).getOrElse(1.0)
      val dur = meta.duration_s.getOrElse(0.0)
      val area = (for (w <- meta.width; h <- meta.height)
        yield w.toDouble * h).getOrElse(0.0)
      val aspect = (for (w <- meta.width; h <- meta.height; if h > 0)
        yield w.toDouble / h).getOrElse(0.0)
      Array(aspect.toFloat, (math.log1p(area) / 20.0).toFloat,
        dur.toFloat, (if (dur > 0) n / dur else 0.0).toFloat,
        (math.log1p(meanSize) / 20.0).toFloat, syncRatio.toFloat,
        (math.log1p(n.toDouble) / 20.0).toFloat, 0f)
    }

  /** Real audio features from decoded PCM (WAV/AIFF/AU): RMS energy,
    * mean absolute amplitude, zero-crossing rate, duration in seconds,
    * sample rate (kHz), channel count — the silence/clipping/noise
    * gates of an audio-curation pipeline. Decodes up to ~1M frames
    * (bounded work per row; the gate statistics converge long before
    * that). */
  private[graft] def audioFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val ch = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        // validate everything header-derived BEFORE sizing buffers: a
        // malformed header can declare absurd channel counts (Int
        // overflow into a GB allocation) or NOT_SPECIFIED (-1) sizes
        if (fmt.getSampleSizeInBits != 16 || ch <= 0 || ch > 16 ||
          frameBytes != ch * 2) None
        else {
          // frame length may legitimately be NOT_SPECIFIED (-1, e.g.
          // streamed AU): read up to the byte budget regardless; the
          // gate statistics converge long before it
          val maxBytes = 4 << 20
          val declared = in.getFrameLength
          val toRead =
            if (declared >= 0)
              math.min(declared * frameBytes, maxBytes.toLong).toInt
            else maxBytes
          val buf = new Array[Byte](toRead)
          var off = 0
          var r = 0
          while (off < toRead && { r = in.read(buf, off, toRead - off); r > 0 })
            off += r
          val bb = java.nio.ByteBuffer.wrap(buf, 0, off).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          // downmix interleaved channels per FRAME — sample statistics
          // over the raw interleaved stream would compare L against R
          // and report inter-channel sign flips as zero crossings
          val nFrames = off / frameBytes
          var (ss, sa, crossings) = (0.0, 0.0, 0L)
          var prevNeg = false
          var i = 0
          while (i < nFrames) {
            var c = 0
            var acc = 0.0
            while (c < ch) {
              acc += bb.getShort((i * ch + c) * 2) / 32768.0
              c += 1
            }
            val s = acc / ch
            ss += s * s; sa += math.abs(s)
            val neg = s < 0
            if (i > 0 && neg != prevNeg) crossings += 1
            prevNeg = neg
            i += 1
          }
          if (nFrames == 0) None
          else {
            val duration =
              if (declared >= 0 && fmt.getFrameRate > 0)
                declared.toDouble / fmt.getFrameRate
              else if (fmt.getFrameRate > 0) nFrames.toDouble / fmt.getFrameRate
              else 0.0
            Some(Array(
              math.sqrt(ss / nFrames).toFloat,
              (sa / nFrames).toFloat,
              (crossings.toDouble / nFrames).toFloat,
              duration.toFloat,
              (fmt.getSampleRate / 1000.0).toFloat,
              ch.toFloat, 0f, 0f))
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Hash-embedding fallback for bytes no real decode path claims: a
    * deterministic 8-float xorshift fold — filterable, reproducible,
    * and engine-independent, which is what a curation pipeline needs
    * from its "unknown bytes" lane. The EXTENSION POINT is the
    * [[ByteEmbedder]] trait this implements ([[HashByteEmbedder]]):
    * ONNX/JNI bindings slot in behind it unchanged, and
    * [[ByteEmbedders.trainLinear]] demonstrates the swap with real
    * in-repo learned weights — see SCALING.md's multimodal
    * disclosure. */
  private[graft] def hashEmbedding(bytes: Array[Byte]): Array[Float] = {
    val feat = new Array[Float](8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i); h *= 0x100000001b3L
      feat(i % 8) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    feat
  }

  /** Attach decoded-metadata columns to a media frame (images get
    * width/height/format, audio gets sample_rate/channels/format, video
    * gets width/height/duration/brand; the rest pass through). Narrow
    * projection. */
  def withDecodedMeta(df: DataFrame): DataFrame =
    df.withColumn("decoded", when(col("kind") === "image",
        decodeImage(col("bytes"))).otherwise(lit(null)))
      .withColumn("decoded_audio", when(col("kind") === "audio",
        decodeAudio(col("bytes"))).otherwise(lit(null)))
      .withColumn("decoded_video", when(col("kind") === "video",
        decodeVideo(col("bytes"))).otherwise(lit(null)))

  // ------------------------------------------------- perceptual dedup

  /** 64-bit difference hash (dHash) from REAL decoded pixels: box-
    * average the image onto a 9×8 luminance grid (integer-geometry
    * averaging, not Graphics2D resampling — deterministic across JREs)
    * and set bit `(row, col)` when the cell right of `(row, col)` is
    * brighter. Robust to re-encoding, resizing, and small edits; flips
    * ~1 bit per local change. The rescale guarantee holds down to one
    * source pixel per grid cell (≥ 9×8; property-tested at ≤ 12 bits
    * drift across sizes); sub-grid thumbnails get bilinear cell-center
    * sampling — strictly better than nearest-pixel, but below ~half
    * the grid the information is simply gone (a 6×4 thumbnail measured
    * up to 24 bits of drift) and such images should be treated as
    * unmatchable by this hash. Undecodable bytes → None (the same
    * degrade-to-filterable contract as every decoder here). */
  private[graft] def dHash64(bytes: Array[Byte]): Option[Long] =
    readImage(bytes, headerOnly = false).flatMap {
      case (_, _, Some(img), _) =>
        try {
          val (gw, gh) = (9, 8)
          val (w, h) = (img.getWidth, img.getHeight)
          if (w < 1 || h < 1) None
          else {
            // Separable resampling onto the 9×8 grid, per axis:
            //  - axis length >= grid: BOX average over
            //    [g*len/glen, max(+1, (g+1)*len/glen)) — the boxes
            //    partition the pixels, one visit each (downscale).
            //  - axis length < grid (sub-grid thumbnails): BILINEAR
            //    sample at the cell center (g+0.5)*len/glen - 0.5,
            //    edge-clamped. Nearest-pixel upsampling would map
            //    adjacent grid cells onto the SAME source pixel —
            //    equal cells, strict-> comparison bits silently unset,
            //    ~3 lost columns × 8 rows for a 6-wide thumbnail.
            //    Bilinear keeps a monotone source monotone across the
            //    grid, so a true downscale of an image hashes within a
            //    few bits of the original even below 9×8.
            val row = new Array[Int](w)
            val rowLum = new Array[Double](w)
            // one source row -> gw resampled luminances
            def resampleRow(y: Int): Array[Double] = {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val rgb = row(x)
                rowLum(x) = 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              val out = new Array[Double](gw)
              var gx = 0
              if (w >= gw) {
                while (gx < gw) {
                  val x0 = gx * w / gw
                  val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
                  var xx = x0
                  var s = 0.0
                  while (xx < x1) { s += rowLum(xx); xx += 1 }
                  out(gx) = s / (x1 - x0)
                  gx += 1
                }
              } else {
                while (gx < gw) {
                  val cx = (gx + 0.5) * w / gw - 0.5
                  val x0 = math.max(0, math.min(w - 1, math.floor(cx).toInt))
                  val x1 = math.min(w - 1, x0 + 1)
                  val f = math.max(0.0, math.min(1.0, cx - x0))
                  out(gx) = rowLum(x0) * (1 - f) + rowLum(x1) * f
                  gx += 1
                }
              }
              out
            }
            val cell = Array.ofDim[Double](gh, gw)
            var gy = 0
            if (h >= gh) {
              val acc = new Array[Double](gw)
              while (gy < gh) {
                val y0 = gy * h / gh
                val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
                var y = y0
                java.util.Arrays.fill(acc, 0.0)
                while (y < y1) {
                  val r = resampleRow(y)
                  var gx = 0
                  while (gx < gw) { acc(gx) += r(gx); gx += 1 }
                  y += 1
                }
                var gx = 0
                while (gx < gw) {
                  cell(gy)(gx) = acc(gx) / (y1 - y0)
                  gx += 1
                }
                gy += 1
              }
            } else {
              // h < 8 source rows — materializing them all is tiny
              val rows = Array.tabulate(h)(resampleRow)
              while (gy < gh) {
                val cy = (gy + 0.5) * h / gh - 0.5
                val y0 = math.max(0, math.min(h - 1, math.floor(cy).toInt))
                val y1 = math.min(h - 1, y0 + 1)
                val f = math.max(0.0, math.min(1.0, cy - y0))
                var gx = 0
                while (gx < gw) {
                  cell(gy)(gx) = rows(y0)(gx) * (1 - f) + rows(y1)(gx) * f
                  gx += 1
                }
                gy += 1
              }
            }
            var bits = 0L
            gy = 0
            while (gy < gh) {
              var gx = 0
              while (gx < gw - 1) {
                if (cell(gy)(gx + 1) > cell(gy)(gx))
                  bits |= 1L << (gy * (gw - 1) + gx)
                gx += 1
              }
              gy += 1
            }
            Some(bits)
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }

  /** Near-duplicate image pairs by perceptual hash: every pair whose
    * dHashes differ in at most `maxHamming` of 64 bits — re-encoded,
    * rescaled, or lightly-edited copies that exact byte dedup can
    * never see. EXACT over the hash space: candidates come from
    * SimHash-style pigeonholing (split 64 bits into `maxHamming + 1`
    * chunks — a qualifying pair must agree on at least one chunk
    * verbatim), so generation is an equi-join on (chunk index, chunk
    * value), verification is `bit_count(xor)` as a join residual, and
    * no all-pairs comparison exists anywhere. The O(pixels) decode
    * runs exactly once per image (the hash is 8 bytes from there on);
    * only (id, hash, chunk) scalars cross the shuffle.
    *
    * Returns `(id_a < id_b, hamming)`. Undecodable rows drop out
    * (they have no perceptual content to compare — run byte-level
    * exact dedup for those). */
  def imageNearDup(spark: SparkSession, media: DataFrame, idCol: String,
      bytesCol: String, maxHamming: Int = 8): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val nChunks = maxHamming + 1
    // The id column keeps the CALLER's type end-to-end (it only needs
    // to be orderable for the `<` dedup); casting to long would null
    // out non-numeric ids and drop their rows silently.
    val dHashUdf = udf { bytes: Array[Byte] =>
      dHash64(Option(bytes).getOrElse(Array.empty[Byte]))
    }
    // MATERIALIZED before the self-join (same discipline as ivfTopK's
    // inverted file): both join branches reference this frame, and
    // without the checkpoint each branch would re-run the O(pixels)
    // decode+hash — the "decode runs exactly once per image" contract
    // would silently become twice
    val hashes = media
      .select(col(idCol).as("__id"), dHashUdf(col(bytesCol)).as("__h"))
      .filter(col("__h").isNotNull)
      .localCheckpoint(true)
    // chunk i covers bits [i*64/n, (i+1)*64/n) — extracted inside one
    // transform, so the fan-out is n rows of (id, hash, idx, value).
    // The 64-bit-wide single-chunk case (maxHamming = 0, exact hash
    // equality) keeps the raw hash: shiftleft wraps at 64 and would
    // zero the mask.
    val chunks = hashes.select(col("__id"), col("__h"),
      posexplode(expr(
        if (nChunks == 1) "array(__h)"
        else s"""transform(sequence(0, ${nChunks - 1}), i ->
           |  shiftright(__h, (i * 64) div $nChunks) &
           |  (shiftleft(1L, ((i + 1) * 64) div $nChunks
           |    - (i * 64) div $nChunks) - 1L))""".stripMargin)))
      .toDF("__id", "__h", "__i", "__v")
    chunks.as("ca")
      .join(chunks.as("cb"),
        col("ca.__i") === col("cb.__i") && col("ca.__v") === col("cb.__v") &&
          col("ca.__id") < col("cb.__id"))
      .select(col("ca.__id").as("id_a"), col("cb.__id").as("id_b"),
        bit_count(col("ca.__h").bitwiseXOR(col("cb.__h"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
