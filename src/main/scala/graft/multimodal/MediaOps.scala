package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9): image/audio/video travel
  * as opaque `binary` columns beside typed metadata, exactly as a 100 TB
  * training-data pipeline stores them (parquet binary + struct metadata).
  *
  * The Spark side — schema, partition-parallel batch iteration, UDF
  * signatures, frame explosion — is real and tested, and so is the
  * decode for every format the JDK can read: BMP, PNG, JPEG, animated
  * GIF (the multi-frame "video" shape) and PCM WAV. MP4/MOV containers
  * get real METADATA via the pure-JVM [[Mp4Parser]] box walk (duration,
  * track count, resolution) with frame decode out of scope (no codec in
  * the sandbox); only payloads no parser recognizes hit `decodeStub`,
  * which derives deterministic pseudo-dimensions where a real
  * deployment would call ffmpeg inside the same mapPartitions batch
  * loop (the Scala analog of a pandas_udf over mapInPandas: one
  * iterator per partition, library handle initialized once per
  * partition, not once per row).
  */
object MediaOps {

  case class MediaMeta(kind: String, declaredWidth: Int, declaredHeight: Int,
                       sampleRate: Int)
  case class MediaRecord(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, width: Int, height: Int,
                           n_bytes: Int, checksum: Long, feature: Array[Float])

  /** Deterministic FAKE decode — stands in for e.g. javax.imageio /
    * ffmpeg. ??? in a real deployment; here a byte-hash so tests are
    * reproducible without codecs.
    */
  private[multimodal] def decodeStub(payload: Array[Byte]): (Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val w = 16 + (math.abs(h) % 4096).toInt
    val ht = 16 + (math.abs(h / 4096) % 4096).toInt
    (w, ht)
  }

  private def checksum(payload: Array[Byte]): Long = {
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    crc.getValue
  }

  /** Batch feature extraction: one pass per PARTITION (the batch shape a
    * real decoder needs — expensive init happens once per partition, rows
    * stream through). BMP (pure-JVM BmpDecoder), animated GIF
    * (GifDecoder: frame count + first frame), PNG and JPEG
    * (ImageIoDecoder over the JDK's javax.imageio) and PCM WAV
    * (WavDecoder) payloads decode for real; only true video containers
    * fall back to the deterministic stub. Emits a fixed 8-dim float
    * feature per record.
    */
  /** Perceptual DIFFERENCE-HASH (dHash) fingerprint: one BIGINT per
    * image — bit `y*(W-1)+x` set iff gray(x+1, y) > gray(x, y), with
    * gray = r+g+b as an exact integer (no float mean threshold — the
    * cross-engine discipline, and the reason dHash beats aHash here:
    * adjacent-pixel comparisons need no global statistic). Near-
    * identical images (small local edits, re-encodes) flip only the
    * few bits whose comparisons touch the changed pixels, so a
    * hamming-distance join over these fingerprints is image near-dup
    * detection — the visual analog of q79's SimHash over text. Decode
    * and hash are row-local (mapPartitions, the binary-codec batch
    * shape). EVERY image resamples to the 8x6 fingerprint grid first
    * (nearest-neighbor on the already-decoded pixels — one decode per
    * record, no BMP re-encode round-trip): the standard dHash pipeline
    * hashes the thumbnail, which is what makes fingerprints COMPARABLE
    * across source resolutions in both directions — an upscaled or
    * downscaled re-encode of the same image lands at the same bit
    * layout. Non-BMP payloads emit decoded=0 (callers filter).
    *
    * The GRID is the scale knob, not a constant (VERDICT r13 #2):
    * fingerprint width gh·(gw−1) bits decides how far the banded
    * hamming join stays in the linear-candidates regime (SCALING.md
    * r13 addendum 3) — the default 8×6 (42 bits) is the fixture-scale
    * gate config; corpora past ~10⁶ distinct images take the wide path
    * ([[dHashWide]], e.g. 16×8 = 120 bits). */
  def dHash(media: Dataset[MediaRecord], gw: Int = 8,
            gh: Int = 6): org.apache.spark.sql.DataFrame = {
    require(gh.toLong * (gw - 1) <= 63,
      s"grid ${gw}x$gh needs ${gh * (gw - 1)} bits > 63 — use dHashWide")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        decodeToGrid(m.payload, gw, gh) match {
          case Some(p) => (m.media_id, dHashWords(p)(0), 1L)
          case None => (m.media_id, 0L, 0L)
        }
      }
    }.toDF("media_id", "dhash", "decoded")
  }

  /** [[dHash]] past 63 bits: the same difference hash packed into
    * little-endian `array<bigint>` words (bit i → word i/64, position
    * i%64 — the layout [[graft.ops.DedupOps.hammingPairsWide]] bands
    * over). A 16×8 grid gives 120 bits = 3×40-bit bands = 10¹²
    * buckets, holding candidate volume linear far past the N ~ 10⁵
    * saturation point the 42-bit form measured. */
  def dHashWide(media: Dataset[MediaRecord], gw: Int,
                gh: Int): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    val words = (gh * (gw - 1) + 63) / 64
    media.mapPartitions { it =>
      it.map { m =>
        decodeToGrid(m.payload, gw, gh) match {
          case Some(p) => (m.media_id, dHashWords(p), 1L)
          case None => (m.media_id, new Array[Long](words), 0L)
        }
      }
    }.toDF("media_id", "dhash", "decoded")
  }

  /** Per-sampled-frame difference hashes for animated payloads — the
    * fingerprint SEQUENCE [[graft.ops.DedupOps.temporalNearDupPairs]]
    * votes over: up to `maxFrames` evenly-spaced frames per GIF record
    * (the [[featurizeFrames]] sampling formula, so position i is the
    * same relative timestamp in videos of different lengths), each
    * frame decoded to pixels, resampled to the fingerprint grid, and
    * hashed exactly like a still image. One row per (video, sample
    * position): `frame_idx` is the ALIGNMENT key (sample position),
    * `src_idx` the decoded frame. Non-animated payloads emit no rows. */
  /** The evenly-spaced sampling rule shared by every sampled-frame
    * path (frameDHash, featurizeFrames): sample position i of k maps
    * to source frame i·(total−1)/(k−1) — one formula, so the
    * fingerprint and featurization paths can never drift out of
    * frame alignment. */
  private[multimodal] def sampleIdx(i: Int, k: Int, total: Int): Int =
    if (k == 1) 0 else i * (total - 1) / (k - 1)

  def frameDHash(media: Dataset[MediaRecord], maxFrames: Int, gw: Int = 8,
                 gh: Int = 6): org.apache.spark.sql.DataFrame = {
    require(gh.toLong * (gw - 1) <= 63,
      s"grid ${gw}x$gh needs ${gh * (gw - 1)} bits > 63 — use frameDHashWide")
    // one decode/hash path for both widths: the narrow form IS the wide
    // form's single word (the grid fits 63 bits, so word 1 is all of it)
    frameDHashWide(media, maxFrames, gw, gh)
      .withColumn("fhash", expr("element_at(fhash, 1)"))
  }

  /** [[frameDHash]] past 63 bits per frame: per-sampled-frame
    * difference hashes packed as little-endian `array<bigint>` words
    * (the [[dHashWide]] layout per frame — what
    * [[graft.ops.DedupOps.temporalNearDupPairsWide]] bands over). The
    * grid is the per-position scale knob exactly as it is for stills:
    * a 16×8 grid (120 bits, 3×40-bit bands) holds every frame
    * position's candidate volume linear far past the narrow geometry's
    * N ~ 10⁵-distinct-sequences saturation point. */
  def frameDHashWide(media: Dataset[MediaRecord], maxFrames: Int, gw: Int,
                     gh: Int): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        // ONE composed stream walk per record (not one per sampled
        // frame): the decoder takes the sampling function and snapshots
        // every wanted index in a single pass. TWO container tiers
        // share the contract — animated GIF (real frame composition:
        // delta rects, offsets, disposal) and raw-DIB AVI (the
        // codec-free "true video container", round 16) — each fast-
        // rejecting the other's magic, so the Spark topology above is
        // container-agnostic and a codec-backed tier slots in the same
        // way.
        val chooseFn = { total: Int =>
          val k = math.min(maxFrames, total)
          (0 until k).map(sampleIdx(_, k, total)).toSet
        }
        GifDecoder.decodeComposedFrames(m.payload, chooseFn)
          .orElse(AviParser.decodeFrames(m.payload, chooseFn))
          .toSeq.flatMap { case (total, byIdx) =>
            val k = math.min(maxFrames, total)
            (0 until k).flatMap { i =>
              val idx = sampleIdx(i, k, total)
              byIdx.get(idx).map { p0 =>
                val p = if (p0.width == gw && p0.height == gh) p0
                        else resizeNearestPixels(p0, gw, gh)
                (m.media_id, i.toLong, idx.toLong, dHashWords(p))
              }
            }
          }
      }
    }.toDF("media_id", "frame_idx", "src_idx", "fhash")
  }

  /** Decode any payload the pure-JVM tier can read and resample it to
    * the fingerprint grid (one decode per record, no re-encode). */
  private def decodeToGrid(payload: Array[Byte], gw: Int,
                           gh: Int): Option[BmpDecoder.BmpPixels] =
    BmpDecoder.decodePixels(payload).map { p =>
      if (p.width == gw && p.height == gh) p
      else resizeNearestPixels(p, gw, gh)
    }

  /** The dHash bit loop over already-gridded pixels, packed into
    * little-endian 64-bit words: bit y·(W−1)+x is set iff
    * gray(x+1, y) > gray(x, y) with gray = r+g+b exact-integer. Shared
    * by the long, wide, and per-frame forms so one comparison rule
    * defines the whole perceptual family. */
  private[multimodal] def dHashWords(p: BmpDecoder.BmpPixels): Array[Long] = {
    val w = p.width; val h = p.height
    val out = new Array[Long]((h * (w - 1) + 63) / 64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        def gray(i: Int): Int = {
          val v = p.rgb(y * w + i)
          ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
        }
        if (gray(x + 1) > gray(x)) {
          val b = y * (w - 1) + x
          out(b >> 6) |= 1L << (b & 63)
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Perceptual AUDIO fingerprint: the dHash idea on the time axis —
    * samples split into `windows` fixed-width windows, window energy =
    * exact integer sum of |sample|, one bit per adjacent-window
    * comparison (energy(w+1) > energy(w)). A local edit (a click, a
    * dropout) perturbs one window's energy and flips at most the two
    * comparisons that touch it, so a hamming join over these
    * fingerprints is audio near-dup detection with the same banded
    * topology as q154/q79. `windows` ≤ 64 keeps the bits in one
    * BIGINT; trailing samples short of a full window fold into the
    * last one. Row-local decode + hash. */
  def audioHash(media: Dataset[MediaRecord], windows: Int): org.apache.spark.sql.DataFrame = {
    require(windows >= 2 && windows <= 64, s"windows=$windows out of range")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        WavDecoder.decodeSamples(m.payload)
            .orElse(AviParser.decodeAudioSamples(m.payload)) match {
          case Some(samples) if samples.length >= windows =>
            val per = samples.length / windows
            val energy = new Array[Long](windows)
            var i = 0
            while (i < samples.length) {
              val w = math.min(i / per, windows - 1)
              energy(w) += math.abs(samples(i))
              i += 1
            }
            var bits = 0L
            var w = 0
            while (w < windows - 1) {
              if (energy(w + 1) > energy(w)) bits |= 1L << w
              w += 1
            }
            (m.media_id, bits, 1L)
          case _ => (m.media_id, 0L, 0L)
        }
      }
    }.toDF("media_id", "ahash", "decoded")
  }

  /** [[audioHash]] past 65 windows: the same adjacent-window energy
    * comparisons packed into little-endian `array<bigint>` words (bit
    * w → word w/64), the audio analog of [[dHashWide]] — window count
    * is the audio fingerprint's resolution knob exactly as the grid is
    * the image one, and past ~10⁶ clips the banded join needs more
    * than 63 bits of it ([[graft.ops.DedupOps.hammingPairsWide]]). */
  def audioHashWide(media: Dataset[MediaRecord],
                    windows: Int): org.apache.spark.sql.DataFrame = {
    require(windows >= 2, s"windows=$windows out of range")
    import media.sparkSession.implicits._
    val nWords = (windows - 1 + 63) / 64
    media.mapPartitions { it =>
      it.map { m =>
        WavDecoder.decodeSamples(m.payload)
            .orElse(AviParser.decodeAudioSamples(m.payload)) match {
          case Some(samples) if samples.length >= windows =>
            val per = samples.length / windows
            val energy = new Array[Long](windows)
            var i = 0
            while (i < samples.length) {
              val w = math.min(i / per, windows - 1)
              energy(w) += math.abs(samples(i))
              i += 1
            }
            val out = new Array[Long](nWords)
            var w = 0
            while (w < windows - 1) {
              if (energy(w + 1) > energy(w)) out(w >> 6) |= 1L << (w & 63)
              w += 1
            }
            (m.media_id, out, 1L)
          case _ => (m.media_id, new Array[Long](nWords), 0L)
        }
      }
    }.toDF("media_id", "ahash", "decoded")
  }

  def featurize(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    def imageFeatures(r: MediaRecord, cs: Long, width: Int, height: Int,
                      meanR: Double, meanG: Double, meanB: Double): MediaFeatures = {
      val feat = Array(meanR.toFloat / 255f, meanG.toFloat / 255f,
        meanB.toFloat / 255f, width.toFloat, height.toFloat,
        width.toFloat / height, r.payload.length.toFloat, 1f)
      MediaFeatures(r.media_id, r.meta.kind, width, height,
        r.payload.length, cs, feat)
    }
    media.mapPartitions { it =>
      // real pipeline: initialize the codec/session HERE, once per partition
      it.map { r =>
        val cs = checksum(r.payload)
        BmpDecoder.decode(r.payload) match {
          case Some(img) =>
            imageFeatures(r, cs, img.width, img.height,
              img.meanR, img.meanG, img.meanB)
          case None => GifDecoder.decode(r.payload) match {
            case Some(anim) =>
              // animated media: frame count rides slot 5, marker 3
              val feat = Array(anim.meanR.toFloat / 255f, anim.meanG.toFloat / 255f,
                anim.meanB.toFloat / 255f, anim.width.toFloat, anim.height.toFloat,
                anim.frames.toFloat, r.payload.length.toFloat, 3f)
              MediaFeatures(r.media_id, r.meta.kind, anim.width, anim.height,
                r.payload.length, cs, feat)
          case None => ImageIoDecoder.decode(r.payload) match {
            case Some(img) =>
              imageFeatures(r, cs, img.width, img.height,
                img.meanR, img.meanG, img.meanB)
            case None => WavDecoder.decode(r.payload) match {
            case Some(clip) =>
              val feat = Array(clip.meanAbsAmplitude.toFloat / 32768f,
                clip.durationSec.toFloat, clip.sampleRate.toFloat / 48000f,
                clip.channels.toFloat, clip.nSamples.toFloat,
                0f, r.payload.length.toFloat, 2f)
              MediaFeatures(r.media_id, r.meta.kind, clip.sampleRate,
                clip.channels, r.payload.length, cs, feat)
            case None => Mp4Parser.parse(r.payload) match {
            case Some(m) =>
              // real container metadata (box walk), frames undecoded:
              // duration rides slot 0, track count slot 5, marker 4
              val feat = Array(m.durationMs.toFloat / 1000f,
                m.timescale.toFloat / 1000f, m.width.toFloat, m.height.toFloat,
                if (m.height > 0) m.width.toFloat / m.height else 0f,
                m.nTracks.toFloat, r.payload.length.toFloat, 4f)
              MediaFeatures(r.media_id, r.meta.kind, m.width, m.height,
                r.payload.length, cs, feat)
            case None =>
              val (w, h) = decodeStub(r.payload)
              val feat = Array.tabulate(8)(i =>
                ((cs >> (i * 8)) & 0xff).toFloat / 255.0f)
              MediaFeatures(r.media_id, r.meta.kind, w, h, r.payload.length, cs, feat)
            }
            }
          }
          }
        }
      }
    }
  }

  /** Frame sampling for video-kind rows: explode one row per sampled frame
    * index — pure plan surgery, runs distributed, no decode needed to
    * plan the sampling.
    */
  def sampleFrames(df: DataFrame, nFrames: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_key",
        concat(col("media_id"), lit("#"), col("frame_idx")))

  /** Sampled-frame featurization with REAL decode for animated payloads:
    * up to `maxFrames` evenly-spaced frames per GIF record, one output
    * row per decoded frame with its exact channel means. Non-animated
    * payloads yield no rows (they have no frame dimension). Runs in the
    * same partition-batched shape as featurize.
    */
  def featurizeFrames(media: Dataset[MediaRecord], maxFrames: Int)
      : Dataset[(Long, Int, Int, Int, Float, Float, Float)] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        // single composed pass per record (shared with frameDHash's
        // decode discipline); means come from the COMPOSED frame, so a
        // delta-encoded GIF reports what is displayed, not the patch
        GifDecoder.decodeComposedFrames(r.payload, { total =>
          val k = math.min(maxFrames, total)
          (0 until k).map(sampleIdx(_, k, total)).toSet
        }).toSeq.flatMap { case (total, byIdx) =>
          val k = math.min(maxFrames, total)
          (0 until k).flatMap { i =>
            val idx = sampleIdx(i, k, total)
            byIdx.get(idx).map { p =>
              val (mr, mg, mb) = GifDecoder.pixelMeans(p)
              (r.media_id, idx, p.width, p.height,
               mr.toFloat, mg.toFloat, mb.toFloat)
            }
          }
        }
      }
    }
  }

  /** Resize plan: records the target size next to the payload — the
    * planning-side contract. [[resizeImages]] below is the EXECUTED
    * form for the formats the pure-JVM tier can decode.
    */
  def withResizeSpec(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resize_spec", struct(lit(w).as("w"), lit(h).as("h")))

  /** REAL nearest-neighbor resample for one BMP payload: decode pixels,
    * sample src (X*w/outW, Y*h/outH) (integer floor — the standard NN
    * mapping), re-encode as BMP. The output is itself a decodable
    * payload, so downstream featurize reports the RESIZED image's true
    * dimensions and means. None for payloads outside the BMP tier.
    */
  def resizeNearest(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] =
    BmpDecoder.decodePixels(bytes).map { img =>
      val out = resizeNearestPixels(img, outW, outH)
      BmpDecoder.encode(outW, outH, Array.tabulate(outW * outH) { p =>
        val v = out.rgb(p)
        ((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
      })
    }

  /** The same nearest-neighbor resample over already-decoded pixels —
    * the form hot paths (dHash) use: no payload re-decode, no BMP
    * re-encode round-trip. */
  private[multimodal] def resizeNearestPixels(
      img: BmpDecoder.BmpPixels, outW: Int, outH: Int): BmpDecoder.BmpPixels =
    BmpDecoder.BmpPixels(outW, outH, Array.tabulate(outW * outH) { p =>
      val sx = (p % outW) * img.width / outW
      val sy = (p / outW) * img.height / outH
      img.rgb(sy * img.width + sx)
    })

  /** Distributed resize over the media table, in featurize's
    * partition-batched shape: BMP payloads are resampled to outW x outH
    * (declared metadata updated to match); payloads outside the BMP
    * tier pass through unchanged — a real deployment hands those to its
    * codec inside the same batch loop. Upgrades [[withResizeSpec]] from
    * annotation to executed pixel work (gated: q118).
    */
  def resizeImages(media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        resizeNearest(r.payload, outW, outH) match {
          case Some(p) => MediaRecord(r.media_id,
            r.meta.copy(declaredWidth = outW, declaredHeight = outH), p)
          case None => r
        }
      }
    }
  }

  /** Synthesizes a deterministic media table for tests/demos (payload
    * bytes derived from the id — stable across runs).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
      val payload = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 131 + i * 7) % 251).toByte)
      MediaRecord(id, MediaMeta(kind, 640, 480, 16000), payload)
    }
  }
}
