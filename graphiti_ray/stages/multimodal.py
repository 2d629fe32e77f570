"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns with sidecar
metadata (mime, width/height, duration…). The Ray-side plumbing — schema,
actor-pool signature, small-batch sizing, output layout — is real and
tested; the *codec* step is stubbed (no image/audio libs in this
container): ``decode_stub=True`` produces a deterministic fake feature
vector from the payload bytes, ``decode_stub=False`` raises
NotImplementedError where a real decoder (PIL/torchaudio/ffmpeg) plugs in.

Batch sizing: payloads are wide — callers should pass a small
``batch_size`` (default 32) so batch × concurrency fits worker heaps
(ray_guide "Memory-aware").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

# same SQL-reproducible rolling-hash multiplier as stages/dedup.py
_POLY = 1099511628211
_M64 = 1 << 64


def payload_chunk_hashes(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic per-chunk hash of a binary payload: split into ``dim``
    equal chunks (floor division; tail beyond dim*n dropped, short payloads
    yield empty chunks hashing to 0), polynomial Horner hash mod 2^64 per
    chunk, reduced mod 1000. Plain-int arithmetic so the DuckDB oracle can
    replicate it (hugeint)."""
    n = max(1, len(payload) // dim)
    out = np.zeros(dim, dtype=np.int64)
    for i in range(dim):
        h = 0
        for b in payload[i * n : (i + 1) * n]:
            h = (h * _POLY + b) % _M64
        out[i] = h % 1000
    return out

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON metadata bag
    ]
)

FEATURE_DIM = 32


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → feature vector + basic props.

    Real deployments replace ``_decode`` with an image/audio decoder loaded
    once in ``__init__`` (the actor-pool contract); the stub derives a
    deterministic pseudo-feature from payload bytes so the full pipeline
    (schema, batching, downstream ANN) is exercised end-to-end.
    """

    def __init__(self, decode_stub: bool = True, dim: int = FEATURE_DIM):
        self.decode_stub = decode_stub
        self.dim = dim

    def _raw_vals(self, payload: bytes) -> np.ndarray:
        if not self.decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg (not in this container); "
                "construct with decode_stub=True or plug a decoder in here"
            )
        # deterministic fake: polynomial hash of equal chunks (integer —
        # exactly replicable by the DuckDB oracle)
        return payload_chunk_hashes(payload, self.dim)

    def _decode(self, payload: bytes) -> np.ndarray:
        vals = self._raw_vals(payload).astype(np.float32)
        norm = float(np.linalg.norm(vals)) or 1.0
        return vals / norm

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        raw = np.stack([self._raw_vals(p) for p in payloads])
        norms = np.linalg.norm(raw.astype(np.float32), axis=1)
        norms[norms == 0] = 1.0
        feats = raw.astype(np.float32) / norms[:, None]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim
        )
        # passthrough columns (media_id, mime, frame_idx, …) ride along so
        # the stage composes with frame_sample/resize upstream
        keep = [c for c in batch.column_names if c not in ("payload", "meta")]
        out = batch.select(keep)
        out = out.append_column(
            "n_bytes", pa.array([len(p) for p in payloads], pa.int64())
        )
        # integer feature digests: exact (no float) → oracle-comparable
        out = out.append_column(
            "feat_sum", pa.array(raw.sum(axis=1).astype("int64"), pa.int64())
        )
        out = out.append_column(
            "feat_max", pa.array(raw.max(axis=1).astype("int64"), pa.int64())
        )
        return out.append_column("feature", arr)


def media_features(
    media: rd.Dataset, batch_size: int = 32, concurrency=(1, 4), decode_stub=True
) -> rd.Dataset:
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_stub": decode_stub},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,  # wide binary rows → small batches
        concurrency=concurrency,
    )


class MediaResize:
    """Actor-pool resize stage (images): payload → resized payload + updated
    meta. Real deployments load the codec once in ``__init__``; the stub
    deterministically re-chunks the payload to the target byte budget
    (w*h bytes) so schema/meta/batching plumbing is exercised."""

    def __init__(self, width: int, height: int, decode_stub: bool = True):
        self.width = width
        self.height = height
        self.decode_stub = decode_stub

    def _resize(self, payload: bytes) -> bytes:
        if not self.decode_stub:
            raise NotImplementedError(
                "real resize requires PIL (not in this container); "
                "construct with decode_stub=True or plug a codec in here"
            )
        budget = self.width * self.height
        reps = budget // max(1, len(payload)) + 1
        return (payload * reps)[:budget]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        payloads = [self._resize(p) for p in batch.column("payload").to_pylist()]
        metas = [
            json.dumps(
                dict(json.loads(m or "{}"), w=self.width, h=self.height),
                sort_keys=True,
            )
            for m in batch.column("meta").to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mime": batch.column("mime"),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(metas, pa.string()),
            }
        )


def media_resize(
    media: rd.Dataset,
    width: int = 64,
    height: int = 64,
    batch_size: int = 32,
    concurrency=(1, 4),
    decode_stub=True,
) -> rd.Dataset:
    return media.map_batches(
        MediaResize,
        fn_constructor_kwargs={
            "width": width,
            "height": height,
            "decode_stub": decode_stub,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(
    media: rd.Dataset, n_frames: int = 4, batch_size: int = 16
) -> rd.Dataset:
    """Video frame sampling: one media row fans out into ``n_frames`` frame
    rows (media_id, frame_idx, payload) — the flat-map shape. The stub
    splits the payload into n equal byte slices standing in for decoded
    frames; a real decoder (ffmpeg) replaces the slicing, the fan-out
    plumbing stays."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, frames, payloads, mimes = [], [], [], []
        for mid, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            step = max(1, len(payload) // n_frames)
            for f in range(n_frames):
                ids.append(mid)
                frames.append(f)
                mimes.append(mime)
                payloads.append(payload[f * step : (f + 1) * step] or b"\x00")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frames, pa.int64()),
                "mime": pa.array(mimes, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return media.map_batches(
        explode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,  # fan-out multiplies payload bytes per batch
    )


def synth_media_dataset(n: int = 64, seed: int = 42) -> rd.Dataset:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        payload = rng.bytes(1024 + (i % 7) * 512)
        items.append(
            {
                "media_id": i,
                "mime": ["image/jpeg", "audio/wav", "video/mp4"][i % 3],
                "payload": payload,
                "meta": '{"w": 64, "h": 64}',
            }
        )
    return rd.from_items(items)
