"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns with sidecar
metadata (mime, width/height, duration…). The Ray-side plumbing — schema,
actor-pool signature, small-batch sizing, output layout — is real and
tested. The codec step has THREE modes:

- ``"stub"`` (default): deterministic fake feature vector from the payload
  bytes — integer arithmetic the DuckDB oracle replicates exactly;
- ``"real"``: honest decoders with zero extra deps — WAV audio
  (``wave`` module, 8/16/32-bit PCM), binary PPM/PGM images (P6/P5),
  uncompressed 24-bit BI_RGB BMP (bottom-up or top-down, padded rows)
  and baseline sequential JPEG (``functions/jpeg.py`` — a full
  pure-numpy Annex-K Huffman + DCT codec, 4:4:4/4:2:2/4:2:0, restart
  markers), including a real nearest-neighbor resize. Formats needing
  external codecs (progressive JPEG, MP4 video) raise
  ``NotImplementedError`` at the documented seam where
  PIL/torchaudio/ffmpeg plug in;
- ``"auto"``: sniff the payload magic — decode WAV/PPM/PGM/BMP/JPEG
  for real, fall back to the stub for everything else.

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

# --- real codecs (stdlib/numpy only) ----------------------------------------


def sniff_format(payload: bytes) -> str:
    """Best-effort container sniff: 'wav' | 'ppm' | 'pgm' | 'bmp' |
    'jpeg' | 'unknown'."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


def decode_image(payload: bytes) -> np.ndarray:
    """Unified image decode dispatch over the real zero-dep codecs:
    PPM/PGM (binary), 24-bit BMP, and baseline JPEG
    (functions/jpeg.py — full Annex-K Huffman + DCT decoder). Returns
    uint8 (h, w, 3) or (h, w)."""
    fmt = sniff_format(payload)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "jpeg":
        from graphiti_ray.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(f"not a decodable image payload: {fmt}")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM → (samples float32 [n, channels], sample_rate). Pure
    stdlib (``wave``); 8-bit unsigned, 16/32-bit signed PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width: {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float32)
    if sw == 1:
        x -= 128.0  # 8-bit WAV is unsigned
    return x.reshape(-1, ch), sr


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval ≤ 255 → uint8 array
    (h, w, 3) or (h, w). Pure numpy header parse (whitespace tokens,
    ``#`` comments)."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM payload: {magic!r}")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    depth = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * depth, offset=pos)
    return arr.reshape((h, w, 3) if depth == 3 else (h, w))


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → P6 / (h, w) → P5 binary bytes."""
    if arr.ndim == 3:
        magic, (h, w, _) = b"P6", arr.shape
    else:
        magic, (h, w) = b"P5", arr.shape
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Real zero-dep decoder for the uncompressed 24-bit BI_RGB BMP
    (BITMAPINFOHEADER+): bottom-up (or top-down when biHeight < 0) row
    order, BGR byte order, rows padded to 4 bytes. Returns (h, w, 3)
    uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER (OS/2) BMP not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    buf = np.frombuffer(payload, np.uint8, count=stride * h, offset=data_off)
    img = buf.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[..., ::-1]
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → 24-bit BI_RGB BMP bytes (bottom-up, padded)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    body = raster.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + body


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize by index maps (the classic vectorized
    formula: src_index = floor((dst + 0.5) * src/dst))."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[rows][:, cols]


def _chunk_ints(vals: np.ndarray, dim: int) -> np.ndarray:
    """dim per-chunk mean-magnitude integers from a 1-D value array —
    the real-decode analogue of the stub's per-chunk hashes (same output
    schema/dtype, so downstream stages cannot tell the modes apart)."""
    flat = np.abs(vals.astype(np.float64).ravel())
    if flat.size == 0:
        return np.zeros(dim, dtype=np.int64)
    n = max(1, flat.size // dim)
    out = np.zeros(dim, dtype=np.int64)
    for i in range(dim):
        chunk = flat[i * n : (i + 1) * n]
        out[i] = int(chunk.mean()) if chunk.size else 0
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

    def __init__(
        self,
        decode_stub: bool = True,
        dim: int = FEATURE_DIM,
        decode: str | None = None,
    ):
        # decode mode: "stub" | "real" | "auto" (decode_stub kept as the
        # backward-compatible boolean spelling: True→stub, False→real)
        self.decode = decode or ("stub" if decode_stub else "real")
        assert self.decode in ("stub", "real", "auto")
        self.dim = dim

    def _raw_vals(self, payload: bytes) -> np.ndarray:
        if self.decode == "stub":
            # deterministic fake: polynomial hash of equal chunks (integer —
            # exactly replicable by the DuckDB oracle)
            return payload_chunk_hashes(payload, self.dim)
        fmt = sniff_format(payload)
        try:
            if fmt == "wav":
                samples, _sr = decode_wav(payload)
                return _chunk_ints(samples, self.dim)
            if fmt in ("ppm", "pgm", "bmp", "jpeg"):
                return _chunk_ints(decode_image(payload), self.dim)
        except Exception:
            # magic sniffed but the body is corrupt/truncated (or a text
            # blob that happens to start with 'P6'/RIFF): auto degrades to
            # the stub instead of killing the whole map_batches task;
            # real mode propagates — corrupt media should be loud there
            if self.decode != "auto":
                raise
            return payload_chunk_hashes(payload, self.dim)
        if self.decode == "auto":
            return payload_chunk_hashes(payload, self.dim)
        raise NotImplementedError(
            "real decode for this format needs ffmpeg/PIL (not in this "
            "container); WAV, PPM/PGM, BMP and baseline JPEG decode "
            "natively — or use decode='auto' to stub-fallback other formats"
        )

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
    media: rd.Dataset,
    batch_size: int = 32,
    concurrency=(1, 4),
    decode_stub=True,
    decode: str | None = None,
) -> rd.Dataset:
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_stub": decode_stub, "decode": decode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,  # wide binary rows → small batches
        concurrency=concurrency,
    )


class MediaResize:
    """Actor-pool resize stage (images): payload → resized payload + updated
    meta. ``"real"`` mode decodes binary PPM/PGM, nearest-neighbor
    resizes and re-encodes — an actual image resize with zero extra
    deps; other formats hit the PIL seam. The stub deterministically
    re-chunks the payload to the target byte budget (w*h bytes) so
    schema/meta/batching plumbing is exercised regardless of codec."""

    def __init__(
        self,
        width: int,
        height: int,
        decode_stub: bool = True,
        decode: str | None = None,
    ):
        self.width = width
        self.height = height
        self.decode = decode or ("stub" if decode_stub else "real")
        assert self.decode in ("stub", "real", "auto")

    def _stub_resize(self, payload: bytes) -> bytes:
        budget = self.width * self.height
        reps = budget // max(1, len(payload)) + 1
        return (payload * reps)[:budget]

    def _resize(self, payload: bytes) -> bytes:
        if self.decode == "stub":
            return self._stub_resize(payload)
        fmt = sniff_format(payload)
        if fmt in ("ppm", "pgm", "bmp", "jpeg"):
            try:
                resized = resize_nearest(
                    decode_image(payload), self.width, self.height
                )
                if fmt == "bmp":
                    return encode_bmp(resized)
                if fmt == "jpeg":
                    from graphiti_ray.functions.jpeg import encode_jpeg

                    return encode_jpeg(resized)
                return encode_ppm(resized)
            except Exception:
                # sniffed-but-corrupt body: auto degrades, real is loud
                if self.decode != "auto":
                    raise
                return self._stub_resize(payload)
        if self.decode == "auto":
            return self._stub_resize(payload)
        raise NotImplementedError(
            "real resize for this format needs ffmpeg/PIL (not in this "
            "container); PPM/PGM/BMP/JPEG resize natively — or use "
            "decode='auto'"
        )

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
    decode: str | None = None,
) -> rd.Dataset:
    return media.map_batches(
        MediaResize,
        fn_constructor_kwargs={
            "width": width,
            "height": height,
            "decode_stub": decode_stub,
            "decode": decode,
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


# --- image perceptual-hash near-dup (dHash over REAL decoded pixels) --------

_BIT_IDX64 = np.arange(64, dtype=np.uint64)


def luma_gray(rgb: np.ndarray) -> np.ndarray:
    """Integer ITU-R 601 luma: (299R + 587G + 114B) // 1000 — exact, so
    the DuckDB oracle replicates it; a grayscale input passes through."""
    if rgb.ndim == 2:
        return rgb.astype(np.int64)
    r, g, b = (rgb[..., i].astype(np.int64) for i in range(3))
    return (299 * r + 587 * g + 114 * b) // 1000


def _nn_index(src: int, dst: int) -> np.ndarray:
    """Integer-exact nearest-neighbor sample coords: floor((2i+1)*src /
    (2*dst)), clamped — pure int arithmetic (no float rounding to chase
    in the SQL twin)."""
    return np.minimum((2 * np.arange(dst) + 1) * src // (2 * dst), src - 1)


def dhash64(gray: np.ndarray) -> int:
    """64-bit difference hash: sample a 9×8 grid (nearest-neighbor), bit
    (r*8 + c) = 1 iff sample[r, c] > sample[r, c+1]. Integer comparisons
    end to end — the standard perceptual near-dup hash, SQL-replicable."""
    h, w = gray.shape
    g = gray[np.ix_(_nn_index(h, 8), _nn_index(w, 9))].astype(np.int64)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64).ravel()
    return int((bits << _BIT_IDX64).sum())


class ImageDHashStage:
    """Actor-pool stage: PPM/PGM/BMP payload → (doc_id, simhash, band0..3)
    — the canonical 64-bit-signature schema banded_hamming_pairs consumes
    (stages/dedup.py). The decode is the REAL codec path (decode_image:
    PPM/PGM, BMP, or the functions/jpeg.py baseline JPEG decoder + integer
    luma + integer nearest-neighbor sampling), not a stub. The oracle row
    runs on PPM (bit-exact pixels → SQL-replicable); JPEG near-dup is
    pytest-covered (DCT is float-lossy, so no value-exact SQL twin)."""

    def __init__(self, id_col: str = "media_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        hashes = np.array(
            [
                np.uint64(dhash64(luma_gray(decode_image(p))))
                for p in batch.column("payload").to_pylist()
            ],
            dtype=np.uint64,
        )
        out = {
            "doc_id": ids,
            "simhash": pa.array(hashes.astype("int64"), pa.int64()),
        }
        for b in range(4):
            out[f"band{b}"] = pa.array(
                ((hashes >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype("int64"),
                pa.int64(),
            )
        return pa.table(out)


def image_phash_near_dup(
    media: rd.Dataset,
    max_hamming: int = 2,
    id_col: str = "media_id",
    batch_size: int = 32,
    concurrency=(1, 4),
) -> rd.Dataset:
    """Perceptual-hash image near-dup: REAL PPM/PGM decode → integer luma
    → 9×8 nearest-neighbor grid → dHash64 → 16-bit band blocking →
    Hamming-verified pairs (a, b, hamming) — the image member of the
    dedup family, on the exact machinery text SimHash uses (banded
    blocking, hot-bucket prefilter, MAX_BUCKET cap + truncation
    telemetry, first-colliding-band distinct emission). Feed the pairs to
    dedup.connected_components for keep-one-per-cluster semantics."""
    from graphiti_ray.stages.dedup import banded_hamming_pairs

    sigs = media.map_batches(
        ImageDHashStage,
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,  # wide binary rows → small batches
        concurrency=concurrency,
    )
    return banded_hamming_pairs(sigs, max_hamming, op_name="image_phash")


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
