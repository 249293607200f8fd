package graft.ops

import graft.io.PngCodec.Image

/** Image kernels over decoded pixel buffers — the feature-extraction /
  * resize / fingerprint layer of the image-multimodal family (decode is
  * [[graft.io.PngCodec]]). Every kernel is INTEGER-EXACT on purpose:
  * the board oracles restate each one relationally (DuckDB regenerates
  * the pixels from the same closed-form synthesis and aggregates), so
  * the whole encode → PNG bytes → decode → kernel path is hash-gated
  * with no golden values and no float tolerance. */
object ImageOps {

  /** Deterministic synthetic pixels (the fixture generator, and the
    * formula the oracles restate). Kinds: 0 horizontal gradient (gray),
    * 1 vertical gradient (gray), 2 checkerboard 8px (gray), 3 RGB with
    * one kind per channel. All math is integer (floor division). */
  def synth(w: Int, h: Int, kind: Int): Image = {
    require(w > 1 && h > 1, s"degenerate image ${w}x$h")
    def v(x: Int, y: Int, c: Int): Int = (if (kind == 3) c else kind) match {
      case 0 => x * 255 / (w - 1)
      case 1 => y * 255 / (h - 1)
      case _ => (x / 8 + y / 8) % 2 * 255
    }
    val ch = if (kind == 3) 3 else 1
    val px = new Array[Byte](w * h * ch)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) { px(i) = v(x, y, c).toByte; i += 1; c += 1 }
        x += 1
      }
      y += 1
    }
    Image(w, h, ch, px)
  }

  /** Composite a 4-channel CMYK image (Adobe's STORED ink-inverted
    * convention, as [[graft.io.JpegCodec.decode]] returns it: 255 = no
    * ink) to RGB. With C' = stored value = 255·(1−C) and likewise K',
    * the standard composite R = 255·(1−C)·(1−K) reduces to the integer
    * form R = C'·K'/255 (floor) — exact, so the board oracle restates
    * it relationally with no float tolerance. */
  def cmykToRgb(img: Image): Image = {
    require(img.channels == 4, s"cmykToRgb needs 4 channels, got ${img.channels}")
    val out = new Array[Byte](img.width * img.height * 3)
    var p = 0
    while (p < img.width * img.height) {
      val k = img.pixels(p * 4 + 3) & 0xff
      var c = 0
      while (c < 3) {
        out(p * 3 + c) = ((img.pixels(p * 4 + c) & 0xff) * k / 255).toByte
        c += 1
      }
      p += 1
    }
    Image(img.width, img.height, 3, out)
  }

  /** (pixel sum, clipped-white count, position-weighted checksum): the
    * weighted sum Σ v·(x+1)·(3y+7)·(c+1) pins every pixel's VALUE AND
    * POSITION — a transposed, shifted, or channel-swapped decode cannot
    * hash-collide. Fits a Long with headroom (≤2¹¹ per side). */
  def stats(img: Image): (Long, Long, Long) = {
    var sum = 0L; var clip = 0L; var wsum = 0L
    var i = 0
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        var c = 0
        while (c < img.channels) {
          val v = img.pixels(i) & 0xff
          sum += v
          if (v == 255) clip += 1
          wsum += v.toLong * (x + 1) * (3L * y + 7) * (c + 1)
          i += 1; c += 1
        }
        x += 1
      }
      y += 1
    }
    (sum, clip, wsum)
  }

  /** EXIF orientation APPLY — normalize a decoded raster to display-
    * upright (the transform q310 deliberately reads as metadata only;
    * a curation pipeline that IGNORES orientation trains on rotated
    * images, one that applies it before dedup breaks byte identity —
    * both operators exist so the pipeline chooses). All 8 EXIF values
    * are EXACT sample transpositions (no resampling, no loss), so the
    * operator composes with relational oracles: destination of source
    * (x, y) per EXIF/TIFF tag 274:
    *   1 = as stored            2 = mirror horizontal
    *   3 = rotate 180           4 = mirror vertical
    *   5 = transpose (mirror horizontal + rotate 270 CW)
    *   6 = rotate 90 CW         7 = transverse (mirror h. + rotate 90 CW)
    *   8 = rotate 270 CW
    * Values 5-8 swap the output dimensions. */
  def applyOrientation(img: Image, orient: Int): Image = {
    require(orient >= 1 && orient <= 8, s"EXIF orientation 1-8, got $orient")
    if (orient == 1) return img
    val w = img.width; val h = img.height; val ch = img.channels
    val swap = orient >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Byte](img.pixels.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val dx = orient match {
          case 2 => w - 1 - x
          case 3 => w - 1 - x
          case 4 => x
          case 5 => y
          case 6 => h - 1 - y
          case 7 => h - 1 - y
          case _ => y // 8
        }
        val dy = orient match {
          case 2 => y
          case 3 => h - 1 - y
          case 4 => h - 1 - y
          case 5 => x
          case 6 => x
          case 7 => w - 1 - x
          case _ => w - 1 - x // 8
        }
        val src = (y * w + x) * ch
        val dst = (dy * ow + dx) * ch
        var c = 0
        while (c < ch) { out(dst + c) = img.pixels(src + c); c += 1 }
        x += 1
      }
      y += 1
    }
    Image(ow, oh, ch, out)
  }

  /** BOX-FILTER downscale — the area-average resize a vision-training
    * pipeline actually wants for thumbnails (nearest-neighbor aliases;
    * box averaging is the standard antialiased integer kernel). Every
    * source pixel belongs to exactly ONE output cell by the inverse
    * floor map i = x·W/w (a clean partition, so the whole operator is
    * Σv / count in integers — restatable relationally with no float
    * tolerance). Downscale only: W ≤ w, H ≤ h keeps every cell
    * non-empty. */
  def resizeBox(img: Image, outW: Int, outH: Int): Image = {
    require(outW > 0 && outH > 0 && outW <= img.width && outH <= img.height,
      s"box resize is a downscale: ${img.width}x${img.height} -> ${outW}x$outH")
    val ch = img.channels
    val sums = new Array[Long](outW * outH * ch)
    val counts = new Array[Long](outW * outH)
    var y = 0
    while (y < img.height) {
      val j = y * outH / img.height
      var x = 0
      while (x < img.width) {
        val i = x * outW / img.width
        counts(j * outW + i) += 1
        var c = 0
        while (c < ch) {
          sums((j * outW + i) * ch + c) +=
            img.pixels((y * img.width + x) * ch + c) & 0xff
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](outW * outH * ch)
    var p = 0
    while (p < outW * outH) {
      var c = 0
      while (c < ch) {
        out(p * ch + c) = (sums(p * ch + c) / counts(p)).toByte
        c += 1
      }
      p += 1
    }
    Image(outW, outH, ch, out)
  }

  /** Nearest-neighbor resize with the floor source map sx = i·w/W — the
    * standard integer mapping, restatable in SQL. */
  def resizeNearest(img: Image, outW: Int, outH: Int): Image = {
    val px = new Array[Byte](outW * outH * img.channels)
    var i = 0
    var j = 0
    while (j < outH) {
      val sy = j * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        var c = 0
        while (c < img.channels) {
          px(i) = img.pixels((sy * img.width + sx) * img.channels + c)
          i += 1; c += 1
        }
        x += 1
      }
      j += 1
    }
    Image(outW, outH, img.channels, px)
  }

  /** Integer grayscale: the channel value for 1-channel images, floor
    * (r+g+b)/3 for 3/4-channel (alpha ignored). */
  private def grayAt(img: Image, x: Int, y: Int): Int = {
    val base = (y * img.width + x) * img.channels
    if (img.channels == 1) img.pixels(base) & 0xff
    else ((img.pixels(base) & 0xff) + (img.pixels(base + 1) & 0xff) +
      (img.pixels(base + 2) & 0xff)) / 3
  }

  /** 64-dim integer feature vector: 8×8 grid of grayscale box means
    * (pixel x lands in box x·8/w — q294's dHash geometry without the
    * comparison step), row-major. The image-similarity embedding: exact
    * integer dot products rank neighbors with zero float noise, and an
    * oracle restates every coordinate relationally. Requires w,h ≥ 8. */
  def boxFeatures(img: Image): Array[Long] = {
    require(img.width >= 8 && img.height >= 8,
      s"boxFeatures needs ≥8x8 input, got ${img.width}x${img.height}")
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < img.height) {
      val j = y * 8 / img.height
      var x = 0
      while (x < img.width) {
        val i = x * 8 / img.width
        sums(j * 8 + i) += grayAt(img, x, y)
        counts(j * 8 + i) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(64)(k => sums(k) / counts(k))
  }

  /** Integer Laplacian sharpness: Σ over INTERIOR pixels of
    * |4·g(x,y) − g(x−1,y) − g(x+1,y) − g(x,y−1) − g(x,y+1)| on the
    * grayscale — the focus/edge-energy proxy an image curation gate
    * thresholds on (blurry/flat content scores ~0, block edges score
    * ~4·255 each). Integer-exact, restatable in SQL by neighbor joins
    * over the regenerated pixels. */
  def sharpness(img: Image): Long = {
    var s = 0L
    var y = 1
    while (y < img.height - 1) {
      var x = 1
      while (x < img.width - 1) {
        s += math.abs(4L * grayAt(img, x, y) - grayAt(img, x - 1, y) -
          grayAt(img, x + 1, y) - grayAt(img, x, y - 1) - grayAt(img, x, y + 1))
        x += 1
      }
      y += 1
    }
    s
  }

  /** dHash perceptual fingerprint as a 64-char bit string: box-mean the
    * grayscale to a 9×8 grid (pixel x lands in box x·9/w — floor), then
    * bit (i,j) = mean(i,j) < mean(i+1,j). Returned as a STRING so the
    * oracle restates it without 64-bit shift edge cases; near-identical
    * content (same pattern at any size) collides, which is the dedup
    * key. Requires w ≥ 9, h ≥ 8 (every box nonempty). */
  def dhash(img: Image): String = {
    require(img.width >= 9 && img.height >= 8,
      s"dhash needs ≥9x8 input, got ${img.width}x${img.height}")
    val sums = Array.ofDim[Long](8, 9)
    val counts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < img.height) {
      val j = y * 8 / img.height
      var x = 0
      while (x < img.width) {
        val i = x * 9 / img.width
        sums(j)(i) += grayAt(img, x, y)
        counts(j)(i) += 1
        x += 1
      }
      y += 1
    }
    val sb = new StringBuilder(64)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val l = sums(j)(i) / counts(j)(i)
        val r = sums(j)(i + 1) / counts(j)(i + 1)
        sb.append(if (l < r) '1' else '0')
        i += 1
      }
      j += 1
    }
    sb.toString
  }
}
