"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* kernels are
deterministic fakes behind a narrow interface (clearly marked), while the
Ray-side plumbing — binary schema, actor-signature, small batches for wide
rows, early payload projection — is real and tested.

Fake payload format ("IMG1"): 4-byte magic | u16 width | u16 height |
u8 fill-value, then ``width*height`` bytes of ``fill``.  A real deployment
replaces :func:`decode_image` with a PIL/libvips call in the same stage.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

MAGIC = b"IMG1"
_HEADER = struct.Struct(">4sHHB")


def synth_image(doc_id: int) -> bytes:
    """Deterministic fake payload for doc_id (arithmetic — SQL-reproducible
    metadata: width = 8 + doc_id%32, height = 8 + doc_id%16,
    fill = doc_id%251)."""
    w = 8 + doc_id % 32
    h = 8 + doc_id % 16
    fill = doc_id % 251
    return _HEADER.pack(MAGIC, w, h, fill) + bytes([fill]) * (w * h)


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB DECODER for the deterministic fake format.  Real image decoding
    (PIL/turbojpeg) is not available in this container; the interface and
    failure contract are what production code plugs into."""
    if len(payload) < _HEADER.size or payload[:4] != MAGIC:
        raise ValueError("not an IMG1 payload")
    _, w, h, _ = _HEADER.unpack(payload[:_HEADER.size])
    pix = np.frombuffer(payload[_HEADER.size:_HEADER.size + w * h],
                        dtype=np.uint8)
    if len(pix) != w * h:
        raise ValueError("truncated payload")
    return w, h, pix.reshape(h, w)


class ImageFeatures:
    """Actor-pool stage: binary image column → typed feature columns.

    Small batches on purpose: payload rows are wide; batch × concurrency
    must fit the worker heap.  Rows that fail to decode degrade to nulls
    (per-row failure parity with the text pipeline).
    """

    def __init__(self) -> None:
        decode_image(synth_image(0))     # surface decoder faults at start

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means = [], [], []
        for payload in batch["image"].to_pylist():
            try:
                w, h, pix = decode_image(payload)
                widths.append(w)
                heights.append(h)
                means.append(int(pix.mean()))     # uniform fill → exact int
            except Exception:
                widths.append(None)
                heights.append(None)
                means.append(None)
        out = batch.drop_columns(["image"])      # early payload projection
        out = out.append_column("width", pa.array(widths, type=pa.int64()))
        out = out.append_column("height", pa.array(heights, type=pa.int64()))
        out = out.append_column("mean_pixel", pa.array(means, type=pa.int64()))
        return out


def images_dataset(sf_dir: str):
    """documents → (doc_id, image binary) synthetic multimodal table."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "image": pa.array([synth_image(i) for i in ids],
                              type=pa.binary()),
        })

    return ds.map_batches(gen, batch_format="pyarrow")


def image_features(sf_dir: str, batch_size: int = 256):
    """Full multimodal pipeline: synth payloads → decode/feature actor pool."""
    imgs = images_dataset(sf_dir)
    feats = imgs.map_batches(ImageFeatures, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=(1, 4),
                             num_cpus=1)
    return feats


def frame_sample(sf_dir: str, every: int = 4):
    """'Video' frame-sampling plumbing demo: treat each doc's payload as a
    frame sequence and keep every ``every``-th frame index (pure plumbing —
    indexes only, no codec)."""
    import ray.data  # noqa: F401

    imgs = images_dataset(sf_dir)

    def sample(t: pa.Table) -> pa.Table:
        ids, frames = [], []
        for doc_id in t["doc_id"].to_pylist():
            n_frames = 8 + doc_id % 8
            for f in range(0, n_frames, every):
                ids.append(doc_id)
                frames.append(f)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "frame_idx": pa.array(frames, type=pa.int64())})

    return imgs.map_batches(sample, batch_format="pyarrow")
