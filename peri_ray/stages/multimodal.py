"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/feature kernels are STUBBED (image/audio libraries are
not in this container): ``decoder="fake"`` produces deterministic
decoded shapes/features so the Ray-side plumbing — schema, batch size,
actor-pool signature, output layout — is real and tested;
``decoder="real"`` raises ``NotImplementedError`` at the exact seam
where PIL/ffmpeg would slot in.

Scale notes: binary payloads dominate memory, so these stages default to
small ``batch_size`` and actor pools (model state loads once per actor),
and metadata-only projections never carry the payload column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def media_table_from_binary(ids, payloads, kind: str = "image",
                            mime: str = "application/octet-stream") -> pa.Table:
    n = len(ids)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mime] * n, pa.string()),
            "width": pa.array([-1] * n, pa.int32()),
            "height": pa.array([-1] * n, pa.int32()),
            "duration_ms": pa.array([-1] * n, pa.int32()),
        }
    )


class ImageDecoder:
    """Actor-pool stage: payload → decoded dims + a small feature vector.

    ``decoder="fake"`` derives deterministic pseudo-dimensions and a
    16-dim byte-histogram feature from the payload bytes (real Arrow
    plumbing, fake pixels).  ``decoder="real"`` is the seam for PIL."""

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _decode_real(self, payload: bytes):
        raise NotImplementedError(
            "real image decode requires PIL/imageio (not in this container); "
            "wire PIL.Image.open(io.BytesIO(payload)) here"
        )

    def __call__(self, table: pa.Table) -> pa.Table:
        payloads = table.column("payload").combine_chunks()
        n = table.num_rows
        widths = np.empty(n, np.int32)
        heights = np.empty(n, np.int32)
        feats = np.zeros((n, self.feature_dim), np.float32)
        for i, p in enumerate(payloads.to_pylist()):
            if p is None:
                widths[i] = heights[i] = -1
                continue
            if self.decoder == "real":
                self._decode_real(p)
            buf = np.frombuffer(p, np.uint8)
            widths[i] = 16 + int(buf[:4].sum()) % 1024 if len(buf) >= 4 else 16
            heights[i] = 16 + int(buf[4:8].sum()) % 1024 if len(buf) >= 8 else 16
            hist, _ = np.histogram(buf, bins=self.feature_dim, range=(0, 256))
            s = hist.sum()
            feats[i] = hist / s if s else 0
        out = table.drop_columns(["width", "height"]) if "width" in table.column_names else table
        out = out.append_column("width", pa.array(widths))
        out = out.append_column("height", pa.array(heights))
        return out.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float32(), self.feature_dim))
        )


def decode_images(ds, decoder: str = "fake", concurrency: int = 4,
                  batch_size: int = 256, feature_dim: int = 16):
    """Small batches (payload-heavy rows), actor pool (decoder state once
    per actor)."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs=dict(decoder=decoder, feature_dim=feature_dim),
        concurrency=concurrency, batch_format="pyarrow", batch_size=batch_size,
    )


def _drop_blank_payloads(t: pa.Table) -> pa.Table:
    """Shared null/empty-payload filter for the perceptual-hash
    family: blanks carry no dedup signal and would all collide into
    one hash, flooding the banded exchange with spurious pairs."""
    import pyarrow.compute as pc

    p = t.column("payload").combine_chunks()
    ok = pc.and_(pc.is_valid(p),
                 pc.greater(pc.binary_length(pc.fill_null(p, b"")), 0))
    return t.filter(ok)


class ImageAHasher:
    """Actor-pool stage: payload → 64-bit aHash.  Real aHash is the
    MEAN OVER AN 8×8 PIXEL GRID binarized at the image median — a
    positional statistic, NOT a global histogram (a histogram of a
    small-alphabet payload collapses the whole corpus onto ~2 hashes:
    measured on the synthetic docs, 500 texts → 2 histogram-hashes at
    Hamming 1).  ``decoder="fake"`` therefore takes 64 positional
    byte-window means over the payload as the stand-in for the
    downscaled pixel grid; ``decoder="real"`` raises at the PIL seam
    (downscale to 8×8 grayscale, then the same binarization)."""

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError(
                "real aHash requires PIL (not in this container); wire "
                "PIL.Image.open(...).convert('L').resize((8, 8)) here")
        payloads = t.column("payload").combine_chunks().to_pylist()
        bufs = [np.frombuffer(p, np.uint8) for p in payloads]
        lens = np.array([len(b) for b in bufs], np.int64)
        feats = np.zeros((len(bufs), 64), np.float64)
        if len(bufs):
            big = np.concatenate(bufs).astype(np.float64) if lens.sum() \
                else np.zeros(0, np.float64)
            cs = np.concatenate([[0.0], np.cumsum(big)])
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            base, rem = lens // 64, lens % 64
            sizes = base[:, None] + (np.arange(64)[None, :] < rem[:, None])
            fr_end = starts[:, None] + np.cumsum(sizes, axis=1)
            fr_start = fr_end - sizes
            sums = cs[fr_end] - cs[fr_start]
            feats = np.where(sizes > 0, sums / np.maximum(sizes, 1), 0.0)
        return _pack_feature_rows(t.column("media_id"), feats)


def perceptual_hash_images(ds, decoder: str = "fake", concurrency: int = 4,
                           batch_size: int = 256):
    """64-bit aHash per image through an actor pool (see
    :class:`ImageAHasher` for why the fingerprint is positional window
    means, not a histogram).  Null/empty payloads and constant-valued
    payloads are dropped — neither carries dedup signal, and both
    classes would collide whole groups onto one hash.  Output:
    (media_id, phash int64) for
    :func:`peri_ray.stages.dedup.hamming_near_dups_on_hashes`."""
    return ds.map_batches(_drop_blank_payloads, batch_format="pyarrow") \
        .map_batches(ImageAHasher, fn_constructor_kwargs=dict(decoder=decoder),
                     concurrency=concurrency, batch_format="pyarrow",
                     batch_size=batch_size)


def _pack_feature_rows(media_id, feats: np.ndarray) -> pa.Table:
    """(n × 64) feature matrix → 64-bit fingerprint per row: bit i set
    iff feature[i] exceeds the per-row median — the shared binarization
    behind the image and audio perceptual hashes.  Constant-feature
    rows (all 64 values equal — uniform payloads: all-zero bytes, one
    repeated byte) binarize to all-zero bits regardless of the value,
    so DIFFERENT uniform payloads would collide at Hamming 0; they are
    dropped here, the same no-signal argument as blanks."""
    n = len(feats)
    if n == 0:
        return pa.table({"media_id": pa.array([], pa.int64()),
                         "phash": pa.array([], pa.int64())})
    f = np.asarray(feats, np.float64).reshape(n, 64)
    keep = f.max(axis=1) > f.min(axis=1)
    f = f[keep]
    ids = pa.array(np.asarray(media_id.to_numpy(zero_copy_only=False),
                              np.int64)[keep], pa.int64())
    med = np.median(f, axis=1, keepdims=True)
    bits = (f > med).astype(np.uint8)
    ph = np.packbits(bits, axis=1, bitorder="little") \
        .view(np.uint64).reshape(-1)
    return pa.table({"media_id": ids,
                     "phash": pa.array(ph.view(np.int64))})


def _pack_feature_hash(feature_col: str):
    """Feature-column form of :func:`_pack_feature_rows` (the audio
    path, where the 64 features already exist as a column)."""
    def _pack(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"media_id": pa.array([], pa.int64()),
                             "phash": pa.array([], pa.int64())})
        f = t.column(feature_col).combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(n, 64)
        return _pack_feature_rows(t.column("media_id"), f)

    return _pack


def perceptual_hash_audio(ds, featurizer: str = "fake",
                          concurrency: int = 4, batch_size: int = 256):
    """64-bit audio fingerprint per track: frame-energy features over
    64 windows (actor pool; the librosa seam with
    ``featurizer="real"``) → per-track median-binarized bits — the
    audio member of the perceptual-hash family; near-identical tracks
    flip few bits, so the shared banded-Hamming exchange finds them.
    Null/empty and constant-valued payloads are dropped (same
    no-signal collision argument as :func:`perceptual_hash_images`)."""
    feats = extract_audio_features(
        ds.map_batches(_drop_blank_payloads, batch_format="pyarrow"),
        n_frames=64, concurrency=concurrency, batch_size=batch_size,
        featurizer=featurizer)
    return feats.map_batches(_pack_feature_hash("audio_features"),
                             batch_format="pyarrow",
                             batch_size=batch_size)


class FrameSampler:
    """Video frame-sampling plumbing: emits (media_id, frame_idx) rows at
    a fixed stride over the (fake-)declared duration — flat_map-shaped via
    map_batches returning more rows than input."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, table: pa.Table) -> pa.Table:
        ids, frames = [], []
        for r in table.select(["media_id", "duration_ms", "payload"]).to_pylist():
            dur = r["duration_ms"]
            if dur is None or dur < 0:
                dur = (len(r["payload"]) if r["payload"] else 0) % 10_000
            for f in range(0, max(1, dur), self.every_ms):
                ids.append(r["media_id"])
                frames.append(f)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_ms": pa.array(frames, pa.int32())})


def sample_frames(ds, every_ms: int = 1000, batch_size: int = 64):
    return ds.map_batches(FrameSampler(every_ms), batch_format="pyarrow",
                          batch_size=batch_size)


class ImageResizer:
    """Resize plumbing: computes target dims (aspect-preserving fit into
    ``max_side``) from decoded width/height — the metadata math is real;
    the pixel resample is the PIL seam (same stub pattern as decode)."""

    def __init__(self, max_side: int = 256, resample: str = "fake"):
        if resample not in ("fake", "real"):
            raise ValueError(resample)
        self.max_side = max_side
        self.resample = resample

    def _resample_real(self, payload: bytes, w: int, h: int):
        raise NotImplementedError(
            "real resample requires PIL (not in this container); wire "
            "PIL.Image.resize here"
        )

    def __call__(self, table: pa.Table) -> pa.Table:
        if self.resample == "real":
            self._resample_real(b"", 0, 0)  # PIL seam — raises like decode
        w = table.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = table.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(np.maximum(w, h), 1.0))
        valid = (w > 0) & (h > 0)
        out_w = np.where(valid, np.maximum(1, np.round(w * scale)), -1).astype(np.int32)
        out_h = np.where(valid, np.maximum(1, np.round(h * scale)), -1).astype(np.int32)
        out = table.append_column("resized_w", pa.array(out_w))
        return out.append_column("resized_h", pa.array(out_h))


def resize_images(ds, max_side: int = 256, resample: str = "fake",
                  concurrency: int = 4, batch_size: int = 256):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(max_side=max_side, resample=resample),
        concurrency=concurrency, batch_format="pyarrow", batch_size=batch_size,
    )


class AudioFeaturizer:
    """Audio feature-extract plumbing: deterministic fake features
    (frame-energy over byte windows standing in for RMS/MFCC; real
    decode is the soundfile/librosa seam)."""

    def __init__(self, n_frames: int = 8, featurizer: str = "fake"):
        if featurizer not in ("fake", "real"):
            raise ValueError(featurizer)
        self.n_frames = n_frames
        self.featurizer = featurizer

    def _features_real(self, payload: bytes):
        raise NotImplementedError(
            "real audio features require librosa/soundfile (not in this "
            "container); wire librosa.feature.rms / mfcc here"
        )

    def __call__(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        F = self.n_frames
        feats = np.zeros((n, F), np.float32)
        dur = np.full(n, -1, np.int32)
        payloads = table.column("payload").combine_chunks().to_pylist()
        if self.featurizer == "real":
            for p in payloads:
                if p is not None:
                    self._features_real(p)
        # fake path: frame RMS for the WHOLE batch in one vectorized
        # pass — cumulative sum of squares + per-frame boundary diffs
        # (array_split boundaries reproduced exactly: the first
        # len % F frames get one extra byte; empty frames stay 0)
        bufs = [None if p is None else np.frombuffer(p, np.uint8)
                for p in payloads]
        idx = [i for i, b in enumerate(bufs) if b is not None and len(b)]
        if idx:
            lens = np.array([len(bufs[i]) for i in idx], np.int64)
            big = np.concatenate([bufs[i] for i in idx]).astype(np.float64)
            csq = np.concatenate([[0.0], np.cumsum(big * big)])
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            base, rem = lens // F, lens % F
            sizes = base[:, None] + (np.arange(F)[None, :] < rem[:, None])
            ends_rel = np.cumsum(sizes, axis=1)
            fr_end = starts[:, None] + ends_rel
            fr_start = fr_end - sizes
            sums = csq[fr_end] - csq[fr_start]
            with np.errstate(invalid="ignore"):
                rms = np.sqrt(np.where(sizes > 0, sums / np.maximum(sizes, 1),
                                       0.0))
            feats[idx] = rms.astype(np.float32)
            dur[idx] = lens.astype(np.int32)  # fake: 1 byte ≈ 1 ms
        out = table.append_column(
            "audio_features",
            pa.array(list(feats), pa.list_(pa.float32(), self.n_frames)),
        )
        return out.append_column("audio_ms", pa.array(dur))


def extract_audio_features(ds, n_frames: int = 8, concurrency: int = 4,
                           batch_size: int = 256, featurizer: str = "fake"):
    return ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs=dict(n_frames=n_frames, featurizer=featurizer),
        concurrency=concurrency, batch_format="pyarrow", batch_size=batch_size,
    )
