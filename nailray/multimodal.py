"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by actor-pool map_batches stages.

The decode kernels are STUBBED (no image/audio libraries in this
container): `decode_image` raises NotImplementedError unless a library
is importable; `FakeImageDecoder` is a deterministic stand-in used to
test the Ray-side plumbing (schema, batch sizing, actor signature,
output layout), which is real and tested.

At 100 TB: binary payloads are large → small batch_size, pyarrow batch
format (binary columns don't survive pandas object dtype cleanly), and
per-stage `num_cpus`/`concurrency` sized so decode doesn't starve IO.
"""

from __future__ import annotations

import hashlib

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


def decode_image(payload: bytes):
    """Real decode — requires an imaging library (not in this container)."""
    try:
        from PIL import Image  # noqa: F401
        import io as _io

        return np.asarray(Image.open(_io.BytesIO(payload)))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not available in this "
            "environment; use FakeImageDecoder for plumbing tests"
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
    """Actor-pool resize stage. The real pixel kernel is gated on PIL
    (absent in this container); the default deterministic stand-in
    replaces the payload with resolution-tagged bytes so the Ray-side
    plumbing — schema, metadata (width/height) updates, batch sizing,
    arrow in/out — is fully real and testable."""

    def __init__(self, target_w: int, target_h: int,
                 payload_col: str = "payload", real_decode: bool = False):
        self.w = int(target_w)
        self.h = int(target_h)
        self.payload_col = payload_col
        self.real_decode = real_decode
        if real_decode:
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real resize requires PIL, not available in this "
                    "environment; use the deterministic stand-in"
                ) from e

    def _resize_payload(self, payload: bytes) -> bytes:
        if self.real_decode:  # pragma: no cover - PIL absent here
            import io as _io

            from PIL import Image

            img = Image.open(_io.BytesIO(payload)).resize((self.w, self.h))
            out = _io.BytesIO()
            img.save(out, format="PNG")
            return out.getvalue()
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
                  batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Resize stage: small batches (large payloads), actor pool."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_args=(target_w, target_h),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample(ds: rd.Dataset, every_n: int = 10) -> rd.Dataset:
    """Video frame sampling stand-in: keeps every n-th media row
    deterministically (by media_id)."""
    def fn(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("media_id"), dtype=np.int64)
        return b.filter(pa.array(ids % every_n == 0))

    return ds.map_batches(fn, batch_format="pyarrow")


def decode_audio(payload: bytes):
    """Real decode — requires an audio library (not in this container)."""
    try:
        import soundfile  # noqa: F401
        import io as _io

        return soundfile.read(_io.BytesIO(payload))[0]
    except ImportError as e:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa, not available in "
            "this environment; use FakeAudioFeaturizer for plumbing tests"
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
