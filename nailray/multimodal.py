"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool map_batches stages.

Real in-container kernels (pure numpy / stdlib — no PIL/soundfile
needed): 24-bit uncompressed BMP and binary PPM (P6) decode+encode,
RIFF/WAVE PCM decode+encode via the stdlib ``wave`` module, a
nearest-neighbor resize, and real pixel/PCM feature stages
(:class:`ImageStats`, :class:`AudioStats`). Formats beyond those
(PNG/JPEG/FLAC/…) fall back to PIL/soundfile when importable and raise
``NotImplementedError`` otherwise; the deterministic Fake* stand-ins
remain for plumbing tests with arbitrary payload bytes.

At 100 TB: binary payloads are large → small batch_size, pyarrow batch
format (binary columns don't survive pandas object dtype cleanly), and
per-stage `num_cpus`/`concurrency` sized so decode doesn't starve IO.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),           # image | audio | video
    pa.field("mime", pa.string()),
    pa.field("payload", pa.large_binary()),  # opaque encoded bytes
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
])


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(128, 4096, n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n),
        "mime": pa.array(["image/png"] * n),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(rng.integers(16, 512, n, dtype=np.int32)),
        "height": pa.array(rng.integers(16, 512, n, dtype=np.int32)),
    })


# --------------------------------------------------------------------------
# real pure-numpy / stdlib codecs
# --------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → 24-bit uncompressed bottom-up BMP bytes."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects an HxWx3 uint8 array")
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP → H×W×3 uint8 RGB array.
    Handles bottom-up (positive height) and top-down (negative) rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"decode_bmp supports 24-bit BI_RGB only (got bpp={bpp}, "
            f"compression={compression})")
    h = abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=row_size * h, offset=data_off)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def encode_ppm(img: np.ndarray) -> bytes:
    """H×W×3 uint8 RGB → binary PPM (P6, maxval 255)."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → H×W×3 uint8 RGB array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment delimited
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("decode_ppm supports maxval <= 255 only")
    pos += 1  # single whitespace after maxval
    return np.frombuffer(payload, np.uint8, count=w * h * 3,
                         offset=pos).reshape(h, w, 3).copy()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """H×W×3 uint8 RGB → PNG bytes (stdlib zlib only: color type 2,
    bit depth 8, filter 0 per scanline, non-interlaced, one IDAT)."""
    import zlib

    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects an HxWx3 uint8 array")
    h, w = img.shape[:2]
    scan = np.zeros((h, 1 + w * 3), np.uint8)  # leading 0 = filter None
    scan[:, 1:] = img.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), level))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 pixel array via stdlib ``zlib`` alone (no PIL):
    deflate-decompress the IDAT stream, undo the per-scanline filters
    (None/Sub/Up/Average/Paeth), resolve PLTE palettes. Supports bit
    depth 8, non-interlaced — the dominant real-image case; grayscale /
    gray+alpha / RGB / palette / RGBA color types all decode (shape
    H×W×channels; use :func:`to_rgb` to canonicalize). Up and Sub
    unfilter vectorized (Sub is a mod-256 prefix sum over pixel
    lanes); Average/Paeth sweep pixels with per-lane vector math."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (ln,), typ = struct.unpack_from(">I", payload, pos), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"decode_png supports bit depth 8, non-interlaced only "
            f"(got depth={depth}, interlace={interlace})")
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(f"unknown PNG color type {ctype}")
    bpp = _PNG_CHANNELS[ctype]
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].copy()
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp] — a
            # mod-256 prefix sum down each of the bpp byte lanes
            cur = np.cumsum(line.reshape(w, bpp).astype(np.int64),
                            axis=0).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            cur = line + prev
        elif f == 3:  # Average: sequential in x, vector over lanes
            cur = np.zeros(stride, np.uint8)
            up = prev.reshape(w, bpp).astype(np.int64)
            ln2 = line.reshape(w, bpp).astype(np.int64)
            left = np.zeros(bpp, np.int64)
            cr = cur.reshape(w, bpp)
            for x in range(w):
                left = (ln2[x] + (left + up[x]) // 2) & 0xFF
                cr[x] = left
        elif f == 4:  # Paeth: sequential in x, vector over lanes
            cur = np.zeros(stride, np.uint8)
            up = prev.reshape(w, bpp).astype(np.int64)
            ln2 = line.reshape(w, bpp).astype(np.int64)
            left = np.zeros(bpp, np.int64)
            ul = np.zeros(bpp, np.int64)
            cr = cur.reshape(w, bpp)
            for x in range(w):
                p = left + up[x] - ul
                pa_, pb_, pc_ = (np.abs(p - left), np.abs(p - up[x]),
                                 np.abs(p - ul))
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                                np.where(pb_ <= pc_, up[x], ul))
                left = (ln2[x] + pred) & 0xFF
                cr[x] = left
                ul = up[x]
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, bpp)
    if ctype == 3:  # palette lookup
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return np.ascontiguousarray(img)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 PCM samples (n,) or (n, channels) → RIFF/WAVE bytes
    (stdlib ``wave``)."""
    import io as _io
    import wave

    samples = np.asarray(samples, np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (samples int16 array (n,) or (n, ch), rate)."""
    import io as _io
    import wave

    with wave.open(_io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("decode_wav supports 16-bit PCM only")
        ch = f.getnchannels()
        data = np.frombuffer(f.readframes(f.getnframes()), np.int16)
        if ch > 1:
            data = data.reshape(-1, ch)
        return data.copy(), f.getframerate()


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling) — pure index
    math, no interpolation library."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(target_h) + 0.5) * h / target_h).astype(int), h - 1)
    xs = np.minimum(((np.arange(target_w) + 0.5) * w / target_w).astype(int), w - 1)
    return img[ys[:, None], xs[None, :]]


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Coerce a decoded array to H×W×3 uint8 RGB: grayscale (H,W) or
    (H,W,1) channels replicate, RGBA drops alpha — PIL-decoded
    grayscale/palette/RGBA payloads must survive the BMP re-encode
    path, not just the 3-channel numpy decoders."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] <= 2:  # grayscale or LA (gray+alpha): replicate luma
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif img.shape[2] > 3:
        img = img[:, :, :3]
    return np.ascontiguousarray(img[:, :, :3], np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an H×W×3 uint8 RGB array. BMP (24-bit
    BI_RGB), PPM (P6) and PNG (8-bit, stdlib zlib inflate + unfilter)
    decode in-process with pure numpy; other formats fall back to PIL
    when importable."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_MAGIC:
        return to_rgb(decode_png(payload))
    try:
        from PIL import Image  # noqa: F401
        import io as _io

        # convert at the decode layer: palette images decode to INDEX
        # arrays and 16-bit grayscale to uint16 — both silently wrong
        # if replicated into RGB downstream; PIL's RGB conversion
        # resolves palette lookups and depth at once
        return np.asarray(Image.open(_io.BytesIO(payload)).convert("RGB"))
    except ImportError as e:
        raise NotImplementedError(
            "non-BMP/PPM image decoding requires PIL/opencv, not available "
            "in this environment; use BMP/PPM payloads or FakeImageDecoder"
        ) from e


class FakeImageDecoder:
    """Deterministic decode stand-in: payload bytes → fixed-size feature
    vector (hash-seeded). The actor-pool signature matches what a real
    decoder stage would use: state in __init__, vectorized __call__,
    pyarrow in/out, feature column as list<float>."""

    def __init__(self, feature_dim: int = 64, payload_col: str = "payload"):
        self.dim = feature_dim
        self.payload_col = payload_col

    def _features(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch.column(self.payload_col).to_pylist()]
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def extract_features(ds: rd.Dataset, feature_dim: int = 64,
                     batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Feature-extraction stage: small batches (large payloads), actor
    pool, zero-copy Arrow in/out."""
    return ds.map_batches(
        FakeImageDecoder,
        fn_constructor_args=(feature_dim,),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResizer:
    """Actor-pool resize stage. With ``real_decode=True`` the pixel
    kernel is REAL in-container for BMP/PPM payloads: numpy decode →
    nearest-neighbor resize → BMP re-encode (PIL handles other formats
    when importable). The default deterministic stand-in replaces the
    payload with resolution-tagged bytes so the Ray-side plumbing —
    schema, metadata (width/height) updates, batch sizing, arrow
    in/out — is testable with arbitrary payload bytes."""

    def __init__(self, target_w: int, target_h: int,
                 payload_col: str = "payload", real_decode: bool = False):
        self.w = int(target_w)
        self.h = int(target_h)
        self.payload_col = payload_col
        self.real_decode = real_decode

    def _resize_payload(self, payload: bytes) -> bytes:
        if self.real_decode:
            img = to_rgb(decode_image(payload))
            return encode_bmp(resize_nearest(img, self.w, self.h))
        tag = b"resized:%dx%d:" % (self.w, self.h)
        return tag + hashlib.blake2b(payload, digest_size=16).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        new = [self._resize_payload(p)
               for p in batch.column(self.payload_col).to_pylist()]
        n = batch.num_rows
        batch = batch.set_column(
            batch.column_names.index(self.payload_col), self.payload_col,
            pa.array(new, pa.large_binary()))
        batch = batch.set_column(batch.column_names.index("width"), "width",
                                 pa.array(np.full(n, self.w, np.int32)))
        return batch.set_column(batch.column_names.index("height"), "height",
                                pa.array(np.full(n, self.h, np.int32)))


def resize_images(ds: rd.Dataset, target_w: int, target_h: int,
                  batch_size: int = 64, concurrency=(1, 4),
                  real_decode: bool = False) -> rd.Dataset:
    """Resize stage: small batches (large payloads), actor pool.
    ``real_decode=True`` runs the real BMP/PPM pixel kernel."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_args=(target_w, target_h, "payload", real_decode),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageStats:
    """REAL pixel feature stage (no stand-in): decode (BMP/PPM pure
    numpy) → 8-float feature vector [w, h, mean_r, mean_g, mean_b,
    std_r, std_g, std_b]. Actor-pool signature: state-free decode but
    the same per-actor shape a model-based featurizer uses."""

    def __init__(self, payload_col: str = "payload",
                 out_col: str = "features"):
        self.payload_col = payload_col
        self.out_col = out_col

    def _features(self, payload: bytes) -> list[float]:
        img = decode_image(payload).astype(np.float64)
        h, w = img.shape[:2]
        flat = img.reshape(-1, img.shape[2]) if img.ndim == 3 \
            else img.reshape(-1, 1).repeat(3, axis=1)
        return ([float(w), float(h)] + flat.mean(axis=0)[:3].tolist()
                + flat.std(axis=0)[:3].tolist())

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p)
                 for p in batch.column(self.payload_col).to_pylist()]
        return batch.append_column(
            self.out_col, pa.array(feats, pa.list_(pa.float32())))


def image_stats(ds: rd.Dataset, batch_size: int = 64,
                concurrency=(1, 4)) -> rd.Dataset:
    """Real decode → per-channel stats features (BMP/PPM in-container)."""
    return ds.map_batches(ImageStats, batch_size=batch_size,
                          batch_format="pyarrow", concurrency=concurrency,
                          num_cpus=1)


class AudioStats:
    """REAL PCM feature stage: WAV decode (stdlib) → 6-float vector
    [sample_rate, n_samples, n_channels, mean, std, rms] over the
    normalized [-1, 1] samples."""

    def __init__(self, payload_col: str = "payload",
                 out_col: str = "audio_features"):
        self.payload_col = payload_col
        self.out_col = out_col

    def _features(self, payload: bytes) -> list[float]:
        samples, rate = decode_wav(payload)
        ch = 1 if samples.ndim == 1 else samples.shape[1]
        x = samples.astype(np.float64).reshape(-1) / 32768.0
        n = max(len(x), 1)
        return [float(rate), float(samples.shape[0]), float(ch),
                float(x.sum() / n), float(x.std()) if len(x) else 0.0,
                float(np.sqrt((x * x).sum() / n))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p)
                 for p in batch.column(self.payload_col).to_pylist()]
        return batch.append_column(
            self.out_col, pa.array(feats, pa.list_(pa.float32())))


def audio_stats(ds: rd.Dataset, batch_size: int = 64,
                concurrency=(1, 4)) -> rd.Dataset:
    """Real WAV decode → PCM stats features (stdlib wave, in-container)."""
    return ds.map_batches(AudioStats, batch_size=batch_size,
                          batch_format="pyarrow", concurrency=concurrency,
                          num_cpus=1)


def synthesize_bmp_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic REAL-BMP media rows (decodable in-container) for
    the real-kernel pipelines and tests."""
    rng = np.random.default_rng(seed)
    payloads, ws, hs = [], [], []
    for _ in range(n):
        w, h = int(rng.integers(4, 40)), int(rng.integers(4, 40))
        payloads.append(encode_bmp(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n),
        "mime": pa.array(["image/bmp"] * n),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
    })


def synthesize_bmp_table_pattern(n: int) -> pa.Table:
    """Closed-form REAL-BMP media rows: ``w = 4 + id % 29``,
    ``h = 4 + (7·id) % 31``, pixel ``(y, x, c) = (x + 7y + 11·id +
    97·c) % 256``. Unlike :func:`synthesize_bmp_table` (PRNG pixels),
    every decoded statistic here is a closed form of ``media_id`` —
    so the real binary decode → resize → stats pipeline can carry an
    EXACT SQL oracle (the oracle recomputes the pattern, the
    nearest-resize index math and the channel means symbolically)."""
    payloads, ws, hs = [], [], []
    for mid in range(n):
        w, h = 4 + mid % 29, 4 + (7 * mid) % 31
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        img = ((x + 7 * y + 11 * mid + 97 * c) % 256).astype(np.uint8)
        payloads.append(encode_bmp(img))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n),
        "mime": pa.array(["image/bmp"] * n),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
    })


def synthesize_png_table_pattern(n: int) -> pa.Table:
    """The :func:`synthesize_bmp_table_pattern` closed-form pixels,
    PNG-encoded — same symbolic oracle applies, so the stdlib-zlib PNG
    decode path gets the identical end-to-end exactness check."""
    payloads, ws, hs = [], [], []
    for mid in range(n):
        w, h = 4 + mid % 29, 4 + (7 * mid) % 31
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        img = ((x + 7 * y + 11 * mid + 97 * c) % 256).astype(np.uint8)
        payloads.append(encode_png(img))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n),
        "mime": pa.array(["image/png"] * n),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
    })


def frame_sample(ds: rd.Dataset, every_n: int = 10) -> rd.Dataset:
    """Video frame sampling stand-in: keeps every n-th media row
    deterministically (by media_id)."""
    def fn(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("media_id"), dtype=np.int64)
        return b.filter(pa.array(ids % every_n == 0))

    return ds.map_batches(fn, batch_format="pyarrow")


def decode_audio(payload: bytes):
    """Decode an audio payload to a sample array. RIFF/WAVE PCM16
    decodes in-process (stdlib ``wave``); other formats fall back to
    soundfile when importable."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)[0]
    try:
        import soundfile  # noqa: F401
        import io as _io

        return soundfile.read(_io.BytesIO(payload))[0]
    except ImportError as e:
        raise NotImplementedError(
            "non-WAV audio decoding requires soundfile/librosa, not "
            "available in this environment; use WAV payloads or "
            "FakeAudioFeaturizer"
        ) from e


class FakeAudioFeaturizer:
    """Deterministic audio-feature stand-in: payload bytes → (n_frames ×
    n_mels) fake mel-spectrogram summarized to a fixed-size vector.
    Plumbing is the real shape a decode stage needs: state (filterbank)
    built once per actor, small batches (payloads are large), Arrow
    in/out, features as list<float>."""

    def __init__(self, n_mels: int = 32, payload_col: str = "payload"):
        self.n_mels = n_mels
        self.payload_col = payload_col
        # "filterbank": deterministic per-actor constant state
        self.bank = np.random.default_rng(7).standard_normal((256, n_mels)) \
            .astype(np.float32)

    def _features(self, payload: bytes) -> np.ndarray:
        # frame the raw bytes, histogram each frame over byte values,
        # project through the bank, mean-pool frames → n_mels vector
        b = np.frombuffer(payload, np.uint8)
        n_frames = max(1, len(b) // 256)
        frames = b[: n_frames * 256].reshape(n_frames, -1) if len(b) >= 256 \
            else b.reshape(1, -1)
        hist = np.stack([np.bincount(f, minlength=256)[:256] for f in frames])
        return (hist.astype(np.float32) @ self.bank).mean(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p or b"\0")
                 for p in batch.column(self.payload_col).to_pylist()]
        return batch.append_column(
            "audio_features",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32())))


def extract_audio_features(ds: rd.Dataset, n_mels: int = 32,
                           batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Audio feature stage: small batches (large payloads), actor pool,
    zero-copy Arrow in/out."""
    return ds.map_batches(
        FakeAudioFeaturizer,
        fn_constructor_args=(n_mels,),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
