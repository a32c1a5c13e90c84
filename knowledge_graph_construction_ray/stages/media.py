"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode kernels themselves are STUBS in this container (no
PIL/ffmpeg/torchvision installed — each decode raises
``NotImplementedError`` unless a decoder is injected), but the Ray-side
plumbing is real and tested: schemas, actor-pool signatures, batch sizing
for large binary payloads, and the output layout.  A deterministic fake
decoder exercises the full path in tests.

Batch-size note: binary payloads dominate block size — these stages use
small ``batch_size`` (default 32) and ``batch_format='pyarrow'`` so the
payload bytes stay zero-copy in the object store instead of being copied
into pandas object cells.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON: {width,height,...} typed metadata
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)

FRAME_SAMPLE_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("payload", pa.binary()),
    ]
)


def fake_image_decoder(payload: bytes) -> tuple[np.ndarray, dict[str, Any]]:
    """Deterministic stand-in decoder: payload bytes → tiled 8×8 'pixels'.
    Lets the full actor/batch/schema path run without image libs."""
    arr = np.frombuffer((payload * ((64 // max(len(payload), 1)) + 1))[:64], dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32), {"width": 8, "height": 8}


class ImageFeatureExtractor:
    """Actor-pool stage: decode → resize → feature-extract.

    ``decoder``: payload → (HxW float array, meta dict).  Default None →
    raises NotImplementedError at construction (clearly-marked stub: PIL /
    torchvision are not available in this container).  The actor signature,
    batch handling and output schema are the real production plumbing.
    """

    def __init__(self, decoder: Callable | None = None, feature_dim: int = 16):
        if decoder is None:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "container; inject decoder=fake_image_decoder (tests) or a "
                "PIL-based callable (production)"
            )
        self.decoder = decoder
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, widths, heights, feats = [], [], [], []
        payloads = batch.column("payload").to_pylist()
        for ref, payload in zip(batch.column("media_ref").to_pylist(), payloads):
            pixels, meta = self.decoder(payload)
            # toy pooled feature: row means resized to feature_dim
            flat = pixels.mean(axis=1)
            feat = np.resize(flat, self.feature_dim).astype(np.float32)
            refs.append(ref)
            widths.append(meta["width"])
            heights.append(meta["height"])
            feats.append(feat.tolist())
        return pa.Table.from_pydict(
            {"media_ref": refs, "width": widths, "height": heights, "feature": feats},
            schema=IMAGE_FEATURES_SCHEMA,
        )


class FrameSampler:
    """Actor-pool stage: video payload → every-nth-frame rows.  The frame
    split is a stub (fixed-size byte chunks stand in for decoded frames);
    the 1→N row fan-out and binary batch handling are real."""

    def __init__(self, every_n: int = 2, frame_bytes: int = 16):
        self.every_n = every_n
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, payloads = [], [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(), batch.column("payload").to_pylist()
        ):
            frames = [
                payload[i : i + self.frame_bytes]
                for i in range(0, len(payload), self.frame_bytes)
            ]
            for fi in range(0, len(frames), self.every_n):
                refs.append(ref)
                idxs.append(fi)
                payloads.append(frames[fi])
        return pa.Table.from_pydict(
            {"media_ref": refs, "frame_idx": idxs, "payload": payloads},
            schema=FRAME_SAMPLE_SCHEMA,
        )


RESIZED_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),
    ]
)


class ImageResizer:
    """Actor-pool stage: decode → resize to (out_w, out_h) → re-encode.

    Same contract as :class:`ImageFeatureExtractor`: ``decoder`` is the
    injected extension point (None raises — PIL is not in this
    container), ``encoder`` turns the resized array back into bytes
    (default: raw row-major uint8 — a real deployment injects JPEG/PNG).
    The resize itself is a real vectorized nearest-neighbor index_select
    on the decoded array — only the codec is stubbed; actor lifecycle,
    batch fan-through and the typed output schema are production
    plumbing."""

    def __init__(self, decoder: Callable | None = None, *, out_w: int = 4,
                 out_h: int = 4, encoder: Callable | None = None):
        if decoder is None:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "container; inject decoder=fake_image_decoder (tests) or a "
                "PIL-based callable (production)"
            )
        self.decoder = decoder
        self.out_w, self.out_h = out_w, out_h
        self.encoder = encoder or (
            lambda arr: arr.astype(np.uint8).tobytes()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, payloads = [], []
        for ref, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            pixels, meta = self.decoder(payload)
            h, w = pixels.shape
            # nearest-neighbor: index arithmetic, no image lib needed
            ri = (np.arange(self.out_h) * h) // self.out_h
            ci = (np.arange(self.out_w) * w) // self.out_w
            resized = pixels[np.ix_(ri, ci)]
            refs.append(ref)
            payloads.append(self.encoder(resized))
        n = len(refs)
        return pa.Table.from_pydict(
            {
                "media_ref": refs,
                "width": [self.out_w] * n,
                "height": [self.out_h] * n,
                "payload": payloads,
            },
            schema=RESIZED_SCHEMA,
        )


def resize_images(media_ds, decoder=None, *, out_w: int = 4, out_h: int = 4,
                  encoder=None, concurrency: int = 2, batch_size: int = 32):
    """media table → resized payloads via actor pool (small batches:
    binary payloads dominate memory).  ``encoder`` is the codec
    injection point (JPEG/PNG in production; raw uint8 bytes default)."""
    return media_ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"decoder": decoder, "out_w": out_w,
                               "out_h": out_h, "encoder": encoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_image_features(media_ds, decoder=None, *, concurrency: int = 2,
                           batch_size: int = 32):
    """media table → image features via actor pool (small batches: binary
    payloads dominate memory)."""
    return media_ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media_ds, *, every_n: int = 2, concurrency: int = 2,
                  batch_size: int = 32):
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_table_from_docs(docs_table: pa.Table) -> pa.Table:
    """Derive a media table from the span-doc corpus's media spans
    (media_ref-bearing spans → one media row each, deterministic payload)."""
    import json

    refs = []
    for doc in docs_table.to_pylist():
        for s in doc["spans"]:
            if s["media_ref"]:
                refs.append(s["media_ref"])
    return pa.Table.from_pydict(
        {
            "media_ref": refs,
            "media_type": ["image"] * len(refs),
            "payload": [r.encode("utf-8") for r in refs],
            "meta": [json.dumps({"source": "span"})] * len(refs),
        },
        schema=MEDIA_SCHEMA,
    )
