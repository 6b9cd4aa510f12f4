"""Multimodal columns: opaque binary payloads + typed metadata.

Design per the build brief: image/audio/video are `binary` columns with
a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched kernels over mapInPandas.

Codec status (this container has no PIL/ffmpeg and installs are
forbidden, so everything here is PURE STDLIB):
  - image/png : REAL decode + encode (zlib inflate/deflate, scanline
    filters 0-4 incl. Paeth, 8-bit gray/RGB/RGBA, non-interlaced) —
    `png_decode`/`png_encode` below, roundtrip-tested. Unfiltering,
    resize, palette mapping, and feature extraction are numpy-
    vectorized (filters 0/1/2 fully; Average/Paeth keep the exact
    x-sequential byte loop their data dependency requires).
  - image/gif : REAL decode (full LZW: variable code width,
    clear/EOI, 4096-entry dictionary) + a writer using the classic
    uncompressed-GIF technique; dispatch is by magic bytes.
  - audio/wav : REAL decode + encode (stdlib `wave` + struct, 16-bit
    PCM).
  - video/mp4 : container demux is REAL — box parsing (`mp4_probe`:
    mvhd duration, tkhd dims, v0/v1/largesize) AND the per-trak
    sample table (`mp4_samples`: stts/stsc/stsz/stco -> absolute
    per-sample byte ranges + timestamps), so `sample_frames` emits
    the ACTUAL sample bytes nearest each grid point. PIXEL decode is
    REAL for the 'raw ' codec (uncompressed RGB24/gray8 samples,
    declared by a real stsd VisualSampleEntry and read back by
    `_decode_raw_frame`); COMPRESSED codecs (avc1, ...) stay an
    honest NotImplementedError under strict=True (the documented
    integration point for a real codec, e.g. pyav shipped via
    --py-files) and a deterministic payload digest otherwise.

Everything around the kernels is production-shaped: payloads never
pass through Python row-at-a-time, metadata is JVM-prunable, and frame
sampling happens before feature extraction so only sampled bytes cross
into the kernel.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<format:string, width:int, height:int, "
    "duration_ms:int, sample_rate:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, sha bigint, "
    "decode_ok boolean, features array<float>"
)

RESIZE_SCHEMA = (
    "media_id bigint, width int, height int, payload binary"
)

FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_ms int, payload binary"
)

N_FEATURES = 64

# ---------------------------------------------------------------------------
# PNG codec (pure stdlib; RFC 2083 / W3C PNG: 8-bit, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, pixels: bytes,
               channels: int = 3) -> bytes:
    """Minimal PNG writer: 8-bit gray/RGB/RGBA, filter 0 scanlines."""
    import numpy as np

    color_type = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    assert len(pixels) == stride * height
    rows = np.zeros((height, stride + 1), dtype=np.uint8)
    rows[:, 1:] = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, stride)
    raw = rows.tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes):
    """Minimal PNG reader: returns (width, height, channels, pixels).
    Supports 8-bit depth, color types 0/2/4/6, non-interlaced — the
    full inverse of png_encode plus filters 1-4 from any writer."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = channels = None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or inter != 0 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} ctype={ctype} "
                    f"interlace={inter})")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    import numpy as np

    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        raise ValueError("short PNG pixel data")
    rows = np.frombuffer(
        raw[:(stride + 1) * height], dtype=np.uint8
    ).reshape(height, stride + 1)
    ftypes = rows[:, 0]
    out = rows[:, 1:].copy()  # writable reconstruction buffer
    bad = ftypes[ftypes > 4]
    if bad.size:
        raise ValueError(f"bad PNG filter {int(bad[0])}")
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(ftypes[y])
        line = out[y]
        if ftype == 1:  # Sub: mod-256 prefix sum along x, per channel
            np.cumsum(line.reshape(width, channels), axis=0,
                      dtype=np.uint8, out=line.reshape(width, channels))
        elif ftype == 2:  # Up: fully vectorized (uint8 wraps)
            line += prev
        elif ftype in (3, 4):
            # Average/Paeth carry an x-sequential dependency on the
            # reconstructed left pixel — keep the exact byte loop
            lb = bytearray(line.tobytes())
            pb = prev.tobytes()
            if ftype == 3:
                for i in range(stride):
                    a = lb[i - channels] if i >= channels else 0
                    lb[i] = (lb[i] + ((a + pb[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = lb[i - channels] if i >= channels else 0
                    c = pb[i - channels] if i >= channels else 0
                    lb[i] = (lb[i] + _paeth(a, pb[i], c)) & 0xFF
            line[:] = np.frombuffer(bytes(lb), dtype=np.uint8)
        prev = line
    return width, height, channels, out.tobytes()


# ---------------------------------------------------------------------------
# GIF codec (pure stdlib; 87a/89a, first frame, global/local color table)
# ---------------------------------------------------------------------------


def gif_decode(data: bytes):
    """Minimal GIF reader: returns (width, height, 3, rgb_pixels) for
    the first image block — full LZW decode (variable code width,
    clear/EOI codes, 4096-entry dictionary), non-interlaced."""
    if data[:4] != b"GIF8":
        raise ValueError("not a GIF")
    w_scr, h_scr, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos:pos + n]
        pos += n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack("<HHHHB",
                                                  data[pos + 1:pos + 10])
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 3 * (2 << (ipacked & 0x07))
                ct = data[pos:pos + n]
                pos += n
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if ct is None:
                raise ValueError("GIF without color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                stream += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decode(bytes(stream), min_code, w * h)
            import numpy as np

            idx = np.asarray(indices[:w * h], dtype=np.int64)
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            px = pal[idx]  # vectorized palette lookup
            if len(idx) < w * h:  # short stream: pad with black
                px = np.vstack([
                    px, np.zeros((w * h - len(idx), 3), dtype=np.uint8)])
            return w, h, 3, px.tobytes()
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    raise ValueError("GIF without image block")


def _lzw_decode(stream: bytes, min_code: int, limit: int) -> list:
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table = [(i,) for i in range(clear)] + [None, None]
    out: list = []
    acc = nbits = 0
    prev = None
    for byte in stream:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [(i,) for i in range(clear)] + [None, None]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + (entry[0],))
            else:
                entry = prev + (prev[0],)
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= limit:
                return out
    return out


def gif_encode(width: int, height: int, indices: bytes,
               palette: bytes) -> bytes:
    """Minimal GIF87a writer using the classic 'uncompressed GIF'
    technique: every pixel index is emitted as its own LZW code with a
    CLEAR before the dictionary could force a width increase."""
    nloglen = max((len(palette) // 3 - 1).bit_length(), 1)
    min_code = max(2, nloglen)
    clear = 1 << min_code
    eoi = clear + 1
    width_bits = min_code + 1
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (nloglen - 1), 0, 0)
    pal = bytearray(palette)
    pal += b"\x00" * (3 * (1 << nloglen) - len(pal))
    out += pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out += bytes([min_code])
    codes = [clear]
    budget = (1 << width_bits) - eoi - 2
    count = 0
    for idx in indices:
        if count >= budget:
            codes.append(clear)
            count = 0
        codes.append(idx)
        count += 1
    codes.append(eoi)
    acc = nbits = 0
    payload = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        payload.append(acc & 0xFF)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# WAV codec (stdlib wave, 16-bit PCM)
# ---------------------------------------------------------------------------


def wav_encode(samples, sample_rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(data: bytes):
    """Returns (sample_rate, n_channels, samples list of int16)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        n = w.getnframes()
        frames = w.readframes(n)
    samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    return rate, nch, samples


# ---------------------------------------------------------------------------
# deterministic synthetic corpus (REAL png/wav payloads)
# ---------------------------------------------------------------------------


def _noise(seed_key: str, n: int) -> bytes:
    """Deterministic byte stream from blake2b in counter mode."""
    out = bytearray()
    c = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{seed_key}:{c}".encode(),
                               digest_size=64).digest()
        c += 1
    return bytes(out[:n])


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL encoded payloads
    for image (PNG) and audio (WAV); video stays an opaque seeded blob
    behind the documented codec stub."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = 16 + (i % 4) * 8
            h = 12 + (i % 4) * 6
            if i % 12 == 0:
                # every 4th image is a real GIF (16-color palette)
                pal = _noise(f"{seed}:pal:{i}", 48)
                idx = bytes(b % 16 for b in _noise(f"{seed}:gif:{i}",
                                                   w * h))
                payload = gif_encode(w, h, idx, pal)
                fmt = "gif"
            else:
                payload = png_encode(
                    w, h, _noise(f"{seed}:img:{i}", w * h * 3))
                fmt = "png"
            meta = {"format": fmt, "width": w, "height": h,
                    "duration_ms": None, "sample_rate": None}
        elif kind == "audio":
            ns = 400 + (i % 5) * 100
            pcm = struct.unpack(
                f"<{ns}h", _noise(f"{seed}:pcm:{i}", ns * 2))
            payload = wav_encode(list(pcm), 16000)
            meta = {"format": "wav", "width": None, "height": None,
                    "duration_ms": int(ns * 1000 / 16000),
                    "sample_rate": 16000}
        else:
            dur = 1000 * (1 + i % 30)
            # REAL sample table + REAL raw-codec frames: one
            # uncompressed RGB24 frame (vw*vh*3 bytes) per second of
            # duration, declared by a 'raw ' VisualSampleEntry so the
            # pixel decode path runs end to end
            nf = 1 + i % 30
            vw, vh = 16, 12
            frames = [
                _noise(f"{seed}:vid:{i}:f{k}", vw * vh * 3)
                for k in range(nf)
            ]
            payload = mp4_encode_stub(dur, vw, vh, b"", frames=frames)
            meta = {"format": "mp4", "width": vw, "height": vh,
                    "duration_ms": dur, "sample_rate": None}
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction kernels
# ---------------------------------------------------------------------------


def _pad(vals) -> list:
    out = [float(v) for v in vals][:N_FEATURES]
    return out + [0.0] * (N_FEATURES - len(out))


def _decode_image(payload: bytes):
    """Sniff by magic bytes — real decoders dispatch on content."""
    if payload[:4] == b"GIF8":
        return gif_decode(payload)
    return png_decode(payload)


def _image_features(payload: bytes) -> list:
    import numpy as np

    w, h, ch, px = _decode_image(payload)
    a = np.frombuffer(px, dtype=np.uint8)
    n = a.size
    mean = float(a.mean())
    std = float(a.std())
    hist = np.bincount(a >> 4, minlength=16)
    ch_means = [0.0] * 4
    planes = a.reshape(-1, ch).mean(axis=0) / 255.0
    ch_means[:ch] = [float(v) for v in planes]
    return _pad(
        [w, h, ch, mean / 255.0, std / 255.0]
        + ch_means
        + [float(v) / n for v in hist]
    )


def _audio_features(payload: bytes) -> list:
    import numpy as np

    rate, nch, samples = wav_decode(payload)
    s = np.asarray(samples, dtype=np.int64)
    n = max(s.size, 1)
    mean_abs = float(np.abs(s).mean()) / 32768.0 if s.size else 0.0
    rms = float(np.sqrt((s * s).mean())) / 32768.0 if s.size else 0.0
    neg = s < 0
    zc = int(np.count_nonzero(neg[:-1] != neg[1:])) / n
    hist = np.bincount((s + 32768) >> 12, minlength=16) if s.size else (
        np.zeros(16, dtype=np.int64))
    return _pad([rate, s.size, nch, mean_abs, rms, zc]
                + [float(v) / n for v in hist])


def _decode_raw_frame(sample: bytes, width: int, height: int,
                      depth: int = 24):
    """Decode one 'raw ' codec sample: uncompressed interleaved
    RGB24 (or gray8 at depth 8), row-major. Raises ValueError when
    the byte count does not match the declared geometry."""
    import numpy as np

    ch = {8: 1, 24: 3, 32: 4}.get(depth)
    if ch is None or len(sample) != width * height * ch:
        raise ValueError("sample bytes do not match raw geometry")
    return np.frombuffer(sample, dtype=np.uint8).reshape(
        height, width, ch)


def _video_features(payload: bytes):
    """REAL ISO-BMFF demux (duration/dims/box count from the actual
    boxes) + REAL pixel statistics when the stsd declares the 'raw '
    codec (uncompressed samples — decoded by _decode_raw_frame).
    Returns (features, pixels_decoded): compressed codecs (avc1, ...)
    have no decoder in this container, so their rows carry a
    deterministic payload digest instead and pixels_decoded=False —
    decode_media(strict=True) raises on those."""
    try:
        dur, w, h, n_boxes = mp4_probe(payload)
        # entry and samples MUST come from the same trak: pairing
        # "first trak with an entry" with "first trak with a table"
        # can mix a video codec declaration with audio sample ranges
        entry, samples = mp4_video_stream(payload)
    except ValueError:
        dur = w = h = n_boxes = 0
        entry, samples = None, []
    if entry is not None and entry[0] == "raw " and samples:
        import numpy as np

        fourcc, ew, eh, depth = entry
        frames = [
            _decode_raw_frame(payload[off:off + size], ew, eh, depth)
            for off, size, _t in samples
        ]  # ValueError on any geometry mismatch -> caller's per-row
        # tolerance marks the row decode_ok=false
        px = np.concatenate([f.reshape(-1) for f in frames])
        hist = np.bincount(px >> 4, minlength=16)
        frame_means = [float(f.mean()) / 255.0 for f in frames[:8]]
        frame_means += [0.0] * (8 - len(frame_means))
        feats = _pad(
            [dur or 0, w or 0, h or 0, n_boxes, len(frames),
             float(px.mean()) / 255.0, float(px.std()) / 255.0]
            + [float(v) / px.size for v in hist]
            + frame_means
        )
        return feats, True
    digest = hashlib.blake2b(payload, digest_size=58).digest()
    return _pad([dur or 0, w or 0, h or 0, n_boxes]
                + [x / 255.0 for x in digest]), False


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    image/png, audio/wav, and RAW-codec video decode FOR REAL
    (pure-stdlib codecs above; mp4 'raw ' sample streams are demuxed
    via the real sample table and their pixels decoded by
    _decode_raw_frame). Compressed video codecs (avc1, hev1, ...)
    have no decoder in this container: strict=True raises
    NotImplementedError for those rows (the documented production
    integration point for a real codec, e.g. pyav shipped via
    --py-files); strict=False substitutes a deterministic payload
    digest for the pixel part of the feature vector.
    """

    def _kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, shas, nbytes, oks = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload)
                nbytes.append(len(b))
                shas.append(
                    int.from_bytes(
                        hashlib.blake2b(b, digest_size=4).digest(), "little"
                    )
                )
                # per-row tolerance: ONE corrupt payload in a 100 TB
                # corpus must mark its row, not kill the batch
                try:
                    if kind == "image":
                        feats.append(_image_features(b))
                    elif kind == "audio":
                        feats.append(_audio_features(b))
                    else:
                        vf, pixels_decoded = _video_features(b)
                        if strict and not pixels_decoded:
                            raise NotImplementedError(
                                "no pixel decoder for this video's "
                                "codec (only 'raw ' sample streams "
                                "decode in this container); ship a "
                                "real codec (e.g. pyav) via "
                                "--py-files and extend "
                                "_video_features at this "
                                "integration point"
                            )
                        feats.append(vf)
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:  # noqa: BLE001 — corrupt payload
                    feats.append([])
                    oks.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "sha": shas,
                "decode_ok": oks,
                "features": feats,
            })

    return df.select("media_id", "kind", "payload").mapInPandas(
        _kernel, FEATURE_SCHEMA
    )


def resize_images(df: DataFrame, width: int = 32,
                  height: int = 32) -> DataFrame:
    """REAL nearest-neighbor resize: filter to images JVM-side
    (partition pruning friendly), then a batched kernel that decodes
    the PNG, resamples, and re-encodes. Output payload is a valid PNG
    of the requested dimensions."""

    def _kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                # per-row tolerance (same policy as decode_media): one
                # corrupt image marks its row null, not the whole batch
                try:
                    w, h, ch, px = _decode_image(bytes(payload))
                    img = np.frombuffer(px, dtype=np.uint8).reshape(
                        h, w, ch)
                    sy = np.arange(height) * h // height
                    sx = np.arange(width) * w // width
                    resized = img[sy[:, None], sx[None, :], :]
                    out.append(bytearray(png_encode(
                        width, height, resized.tobytes(), ch)))
                except Exception:  # noqa: BLE001 — corrupt payload
                    out.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "payload": out,
            })

    imgs = df.where(F.col("kind") == "image")
    return imgs.select("media_id", "payload").mapInPandas(
        _kernel, RESIZE_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for video: JVM-side explode of the sample GRID
    (timestamps from metadata — no payload touched), then one batched
    kernel that demuxes the REAL ISO-BMFF sample table (mp4_samples:
    stts/stsc/stsz/stco) and emits the actual sample bytes nearest
    each grid timestamp; payloads without a sample table fall back to
    proportional byte slicing. At scale the pre-explode keeps Python
    traffic proportional to sampled frames, not to video bytes."""
    vids = df.where(F.col("kind") == "video").select(
        "media_id", "payload",
        F.least(
            (F.col("meta.duration_ms") / every_ms).cast("int") + 1,
            F.lit(max_frames),
        ).alias("n_frames"),
    )
    grid = vids.select(
        "media_id", "payload",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1)
        ).alias("frame_idx"),
    ).withColumn("frame_ms", F.col("frame_idx") * every_ms)

    def _kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            # keyed by a CONTENT digest: media_id alone would apply the
            # first row's sample table to a different payload if ids
            # ever duplicate upstream; one blake2b pass per exploded
            # row (<= max_frames per video) is the price of safety
            table_cache: dict = {}
            for payload, idx, fms in zip(
                    pdf["payload"], pdf["frame_idx"], pdf["frame_ms"]):
                b = bytes(payload)
                key = hashlib.blake2b(b, digest_size=16).digest()
                if key not in table_cache:
                    try:
                        table_cache[key] = mp4_samples(b)
                    except ValueError:
                        table_cache[key] = []
                samples = table_cache[key]
                if samples:
                    # real demux: the sample whose timestamp is
                    # nearest the grid point
                    off, size, _t = min(
                        samples, key=lambda sm: abs(sm[2] - int(fms)))
                    payloads.append(bytearray(b[off:off + size]))
                else:  # no sample table: proportional byte slice
                    chunk = max(len(b) // max_frames, 1)
                    start = int(idx) * chunk
                    payloads.append(bytearray(b[start:start + chunk]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_idx": pdf["frame_idx"],
                "frame_ms": pdf["frame_ms"],
                "payload": payloads,
            })

    return grid.mapInPandas(_kernel, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# MP4 container demux (pure stdlib; ISO-BMFF box parsing — the codec
# itself, i.e. pixel/sample decoding, remains the documented stub)
# ---------------------------------------------------------------------------


def mp4_probe(data: bytes):
    """Parse ISO-BMFF boxes and return (duration_ms, width, height,
    n_boxes). Handles v0 AND v1 full-box layouts (v1 mvhd/tkhd carry
    64-bit creation/modification/duration fields, common in real-world
    files), 64-bit `largesize` boxes (size==1 + 8-byte size at offset
    8), and size==0 ("box extends to end of enclosing container").
    mvhd carries timescale+duration; tkhd the track dimensions as
    16.16 fixed point. Raises ValueError on non-BMFF input."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    duration_ms = width = height = None
    n_boxes = 0

    def walk(buf, depth=0):
        nonlocal duration_ms, width, height, n_boxes
        pos = 0
        while pos + 8 <= len(buf):
            (size,) = struct.unpack(">I", buf[pos:pos + 4])
            btype = buf[pos + 4:pos + 8]
            hdr = 8
            if size == 1:  # largesize: 64-bit size follows the type
                if pos + 16 > len(buf):
                    break
                (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
                hdr = 16
            elif size == 0:  # box runs to the end of this container
                size = len(buf) - pos
            if size < hdr:
                break
            body = buf[pos + hdr:pos + size]
            n_boxes += 1
            if btype in (b"moov", b"trak"):
                walk(body, depth + 1)
            elif btype == b"mvhd" and len(body) >= 20:
                if body[0] == 1 and len(body) >= 32:
                    # v1: 8B creation + 8B modification, then
                    # timescale:4 at offset 20, duration:8 at 24
                    (timescale,) = struct.unpack(">I", body[20:24])
                    (dur,) = struct.unpack(">Q", body[24:32])
                elif body[0] == 0:
                    timescale, dur = struct.unpack(">II", body[12:20])
                else:
                    timescale = dur = 0
                if timescale:
                    duration_ms = int(dur * 1000 / timescale)
            elif btype == b"tkhd":
                if body[:1] == b"\x01" and len(body) >= 96:
                    # v1: +12 bytes vs v0 → width/height at 88:96
                    w16, h16 = struct.unpack(">II", body[88:96])
                    width, height = w16 >> 16, h16 >> 16
                elif body[:1] == b"\x00" and len(body) >= 84:
                    w16, h16 = struct.unpack(">II", body[76:84])
                    width, height = w16 >> 16, h16 >> 16
            pos += size

    walk(data)
    return duration_ms, width, height, n_boxes


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _visual_sample_entry(fourcc: bytes, width: int, height: int,
                         depth: int = 24) -> bytes:
    """ISO 14496-12 VisualSampleEntry box (size+format header + the
    78-byte fixed field layout): the codec declaration inside stsd."""
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)        # reserved, data_ref_idx
        + struct.pack(">HH", 0, 0) + b"\x00" * 12  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi h/v
        + struct.pack(">I", 0)                     # reserved
        + struct.pack(">H", 1)                     # frame_count
        + b"\x00" * 32                             # compressorname
        + struct.pack(">H", depth)
        + struct.pack(">h", -1)                    # pre_defined
    )
    return struct.pack(">I", len(body) + 8) + fourcc + body


def mp4_encode_stub(duration_ms: int, width: int, height: int,
                    payload: bytes, frames: list | None = None,
                    codec: bytes = b"raw ") -> bytes:
    """VALID ISO-BMFF skeleton (ftyp + moov{mvhd, trak{tkhd, mdia{
    mdhd, minf{stbl{stsd,stts,stsc,stsz,stco}}}}} + mdat) so the demux
    path runs on real boxes. With `frames` (list of per-frame byte
    blobs) a REAL sample table is written: uniform stts durations,
    one-chunk stsc, per-sample stsz, absolute stco offset into mdat —
    and stsd carries a real VisualSampleEntry declaring `codec`
    (default 'raw ': uncompressed interleaved RGB24, the sample format
    _decode_raw_frame reads back; pass e.g. b'avc1' to model a
    compressed stream this container has no decoder for)."""
    timescale = 1000
    mvhd = (b"\x00\x00\x00\x00" + b"\x00" * 8
            + struct.pack(">II", timescale, duration_ms)
            + b"\x00" * 80)
    tkhd = (b"\x00\x00\x00\x07" + b"\x00" * 72
            + struct.pack(">II", width << 16, height << 16))
    trak_body = _box(b"tkhd", tkhd)
    mdat_body = payload
    stco_fixup = None
    if frames:
        mdat_body = b"".join(frames)
        n = len(frames)
        dur_per = max(duration_ms // n, 1)
        mdhd = (b"\x00\x00\x00\x00" + b"\x00" * 8
                + struct.pack(">II", timescale, duration_ms)
                + b"\x00" * 4)
        stsd = (b"\x00" * 4 + struct.pack(">I", 1)
                + _visual_sample_entry(codec, width, height))
        stts = (b"\x00" * 4 + struct.pack(">I", 1)
                + struct.pack(">II", n, dur_per))
        stsc = (b"\x00" * 4 + struct.pack(">I", 1)
                + struct.pack(">III", 1, n, 1))
        stsz = (b"\x00" * 4 + struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(f)) for f in frames))
        # stco offset is absolute within the file; patched below once
        # the moov size is known
        stco = (b"\x00" * 4 + struct.pack(">I", 1)
                + struct.pack(">I", 0))
        stbl = (_box(b"stsd", stsd) + _box(b"stts", stts)
                + _box(b"stsc", stsc) + _box(b"stsz", stsz)
                + _box(b"stco", stco))
        minf = _box(b"minf", _box(b"stbl", stbl))
        trak_body += _box(b"mdia", _box(b"mdhd", mdhd) + minf)
        stco_fixup = True
    moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", trak_body))
    head = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov
    if stco_fixup:
        # first sample starts right after the 8-byte mdat header
        off = struct.pack(">I", len(head) + 8)
        idx = head.rindex(b"stco")
        head = head[:idx + 12] + off + head[idx + 16:]
    return head + _box(b"mdat", mdat_body)


def _collect_traks(data: bytes) -> list:
    """Walk the box tree and return one {box_type: body} dict PER
    trak (sample-table boxes scoped to their own track — a multi-trak
    file must not mix, say, the video stts with the audio stsz).
    Raises ValueError on non-BMFF input."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")
    traks: list = []

    def walk(buf, boxes):
        pos = 0
        while pos + 8 <= len(buf):
            (size,) = struct.unpack(">I", buf[pos:pos + 4])
            btype = buf[pos + 4:pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > len(buf):
                    break
                (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
                hdr = 16
            elif size == 0:
                size = len(buf) - pos
            if size < hdr:
                break
            body = buf[pos + hdr:pos + size]
            if btype == b"trak":
                tb: dict = {}
                walk(body, tb)
                traks.append(tb)
            elif btype in (b"moov", b"mdia", b"minf", b"stbl"):
                walk(body, boxes)
            elif btype in (b"stts", b"stsz", b"stsc", b"stco", b"co64",
                           b"mdhd", b"stsd"):
                # first box of each type WITHIN this trak wins
                boxes.setdefault(btype, body)
            pos += size

    walk(data, {})
    return traks


def _select_trak(data: bytes):
    """THE trak-selection rule, shared by mp4_samples and
    mp4_video_stream so every demux API agrees on which trak a
    multi-trak file means: the first trak with BOTH a well-formed
    visual entry and a complete, parseable, non-empty sample table
    (the video stream), else the first trak with just a usable table
    (audio-only files still demux; entry is None there). Returns
    (entry_or_None, samples) — always from ONE trak — or (None, [])."""
    fallback = None
    for boxes in _collect_traks(data):
        if not (b"stts" in boxes and b"stsz" in boxes
                and (b"stco" in boxes or b"co64" in boxes)):
            continue
        try:
            samples = _parse_sample_table(boxes, len(data))
        except (struct.error, IndexError, ValueError):
            # corrupt/truncated table: tolerated (same per-row policy
            # as every other media decode path), try the next trak
            continue
        if not samples:
            continue
        entry = _parse_visual_entry(boxes.get(b"stsd"))
        if entry is not None:
            return entry, samples
        if fallback is None:
            fallback = samples
    return None, fallback or []


def mp4_samples(data: bytes) -> list:
    """REAL sample-table demux: returns [(offset, size, time_ms)] per
    sample by walking moov/trak/mdia/minf/stbl and combining stts
    (durations), stsz (sizes), stsc (sample->chunk), stco/co64 (chunk
    offsets). Box collection is scoped PER TRAK (never mixes
    sample-table boxes across tracks) and the trak choice is shared
    with mp4_video_stream (_select_trak: visual trak preferred, any
    complete table as fallback). Offsets are absolute file offsets,
    so callers can slice actual sample bytes out of the payload.
    Raises ValueError on non-BMFF; returns [] when no trak carries a
    usable sample table."""
    return _select_trak(data)[1]


def _parse_visual_entry(sd):
    """First VisualSampleEntry of one stsd body -> (fourcc, width,
    height, depth), or None when malformed/absent."""
    if sd is None or len(sd) < 16:
        return None
    (n_entries,) = struct.unpack(">I", sd[4:8])
    if n_entries < 1:
        return None
    (esize,) = struct.unpack(">I", sd[8:12])
    fourcc = sd[12:16].decode("latin-1")
    ebody = sd[16:8 + min(esize, len(sd) - 8)]
    if len(ebody) < 78:  # fixed VisualSampleEntry field block
        return None
    width, height = struct.unpack(">HH", ebody[24:28])
    (depth,) = struct.unpack(">H", ebody[74:76])
    return fourcc, width, height, depth


def mp4_sample_entry(data: bytes):
    """Codec declaration of the first trak that has one: parse stsd's
    first VisualSampleEntry and return (fourcc, width, height, depth),
    or None when no trak carries a well-formed visual entry. Raises
    ValueError on non-BMFF input. NOTE: standalone convenience — when
    pairing an entry WITH sample ranges use mp4_video_stream, which
    guarantees both come from the same trak."""
    for boxes in _collect_traks(data):
        entry = _parse_visual_entry(boxes.get(b"stsd"))
        if entry is not None:
            return entry
    return None


def mp4_video_stream(data: bytes):
    """(sample_entry, samples) taken from the SAME trak via
    _select_trak: the first trak with BOTH a visual entry and a
    usable table wins (so an audio trak listed before the video trak
    never shadows it), with any-complete-table as the audio-only
    fallback (entry None there — those samples are NOT
    pixel-decodable and are never paired with another trak's codec
    declaration). Raises ValueError on non-BMFF input."""
    return _select_trak(data)


def _parse_sample_table(boxes: dict, file_len: int) -> list:
    """The trusting part of mp4_samples, isolated so the caller can
    catch struct/index errors from truncated boxes. Every count field
    is corruption-controlled 32-bit data: bound it by what the BOX
    BODY can actually hold before materializing any list (a crafted
    ~100-byte payload must not allocate gigabytes)."""
    # timescale from mdhd (v0)
    timescale = 1000
    mdhd = boxes.get(b"mdhd")
    if mdhd is not None and len(mdhd) >= 20 and mdhd[0] == 0:
        (timescale,) = struct.unpack(">I", mdhd[12:16])
        timescale = timescale or 1000
    # sizes
    b = boxes[b"stsz"]
    uniform, count = struct.unpack(">II", b[4:12])
    if uniform:
        # a file cannot hold more uniform-size samples than bytes
        count = min(count, file_len // max(uniform, 1) + 1)
        sizes = [uniform] * count
    else:
        if 12 + 4 * count > len(b):
            raise ValueError("stsz count exceeds box body")
        sizes = list(struct.unpack(f">{count}I", b[12:12 + 4 * count]))
    max_samples = len(sizes)
    # durations -> per-sample start times
    b = boxes[b"stts"]
    (n_ent,) = struct.unpack(">I", b[4:8])
    if 8 + 8 * n_ent > len(b):
        raise ValueError("stts entries exceed box body")
    times = []
    t = 0
    for e in range(n_ent):
        cnt, dur = struct.unpack(">II", b[8 + 8 * e:16 + 8 * e])
        cnt = min(cnt, max_samples - len(times))  # bounded by stsz
        for _ in range(cnt):
            times.append(int(t * 1000 / timescale))
            t += dur
        if len(times) >= max_samples:
            break
    # chunk offsets: stco (32-bit) or co64 (64-bit)
    if b"stco" in boxes:
        b = boxes[b"stco"]
        (n_chunks,) = struct.unpack(">I", b[4:8])
        if 8 + 4 * n_chunks > len(b):
            raise ValueError("stco entries exceed box body")
        chunk_offs = list(struct.unpack(
            f">{n_chunks}I", b[8:8 + 4 * n_chunks]))
    else:
        b = boxes[b"co64"]
        (n_chunks,) = struct.unpack(">I", b[4:8])
        if 8 + 8 * n_chunks > len(b):
            raise ValueError("co64 entries exceed box body")
        chunk_offs = list(struct.unpack(
            f">{n_chunks}Q", b[8:8 + 8 * n_chunks]))
    # sample->chunk map (default: all samples in chunk 1)
    spc = [(1, len(sizes))]
    if b"stsc" in boxes:
        sb = boxes[b"stsc"]
        (n_stsc,) = struct.unpack(">I", sb[4:8])
        if 8 + 12 * n_stsc > len(sb):
            raise ValueError("stsc entries exceed box body")
        spc = []
        for e in range(n_stsc):
            first, per, _desc = struct.unpack(
                ">III", sb[8 + 12 * e:20 + 12 * e])
            spc.append((first, min(per, max_samples)))
    samples = []
    si = 0
    spc_i = 0  # advancing index: stsc first_chunk is monotonic, so the
    # per-chunk rescan a crafted huge stsc could turn quadratic is
    # unnecessary — one pass over chunks + one over entries
    per = spc[0][1] if spc else len(sizes)
    for ci, coff in enumerate(chunk_offs, start=1):
        while spc_i + 1 < len(spc) and spc[spc_i + 1][0] <= ci:
            spc_i += 1
        per = spc[spc_i][1]
        off = coff
        for _ in range(per):
            if si >= len(sizes):
                return samples
            samples.append(
                (off, sizes[si], times[si] if si < len(times) else 0))
            off += sizes[si]
            si += 1
        if si >= len(sizes):
            break
    return samples
