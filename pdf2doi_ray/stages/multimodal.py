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


def resize_nearest(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """REAL nearest-neighbor resize kernel (vectorized index gather) — this
    math is what production uses; only the codec around it is stubbed."""
    h, w = pix.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pix[ys[:, None], xs[None, :]]


class ImageResize:
    """Actor-pool stage: binary image column → resized binary image column.

    Same shape as a production thumbnailing stage: decode (stubbed codec),
    resize (real vectorized kernel), re-encode, with per-row failure
    degradation and early projection of the input payload."""

    def __init__(self, out_w: int = 16, out_h: int = 16) -> None:
        self._w, self._h = out_w, out_h
        decode_image(synth_image(0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, widths, heights, means = [], [], [], []
        for payload in batch["image"].to_pylist():
            try:
                _, _, pix = decode_image(payload)
                small = resize_nearest(pix, self._w, self._h)
                body = small.astype(np.uint8).tobytes()
                # re-encode only uniform images losslessly in IMG1 (fill
                # byte); non-uniform thumbnails keep raw bytes after header
                payloads.append(_HEADER.pack(MAGIC, self._w, self._h,
                                             int(small.flat[0])) + body)
                widths.append(self._w)
                heights.append(self._h)
                means.append(int(small.mean()))
            except Exception:
                payloads.append(None)
                widths.append(None)
                heights.append(None)
                means.append(None)
        out = batch.drop_columns(["image"])
        out = out.append_column("thumb", pa.array(payloads, type=pa.binary()))
        out = out.append_column("width", pa.array(widths, type=pa.int64()))
        out = out.append_column("height", pa.array(heights, type=pa.int64()))
        out = out.append_column("mean_pixel", pa.array(means, type=pa.int64()))
        return out


def image_resize(sf_dir: str, out_w: int = 16, out_h: int = 16,
                 batch_size: int = 256):
    """Thumbnail pipeline: synth payloads → resize actor pool → metadata
    columns (payload dropped for the metadata query; thumbnails would
    normally stream to a sink)."""
    imgs = images_dataset(sf_dir)
    feats = imgs.map_batches(
        ImageResize, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 4),
        num_cpus=1)
    return feats.map_batches(lambda t: t.drop_columns(["thumb"]),
                             batch_format="pyarrow")


# --- audio column plumbing -------------------------------------------------

AUDIO_MAGIC = b"AUD1"
_AHEADER = struct.Struct(">4sI")


def synth_audio(doc_id: int) -> bytes:
    """Deterministic fake waveform (arithmetic — SQL-reproducible):
    n = 1000 + doc_id%500 samples of x[i] = (doc_id*31 + i*7) % 997 - 498."""
    n = 1000 + doc_id % 500
    i = np.arange(n, dtype=np.int64)
    x = ((doc_id * 31 + i * 7) % 997 - 498).astype(np.int16)
    return _AHEADER.pack(AUDIO_MAGIC, n) + x.tobytes()


def decode_audio(payload: bytes) -> np.ndarray:
    """STUB DECODER for the fake format (production: soundfile/ffmpeg)."""
    if len(payload) < _AHEADER.size or payload[:4] != AUDIO_MAGIC:
        raise ValueError("not an AUD1 payload")
    _, n = _AHEADER.unpack(payload[:_AHEADER.size])
    x = np.frombuffer(payload[_AHEADER.size:_AHEADER.size + 2 * n],
                      dtype=np.int16)
    if len(x) != n:
        raise ValueError("truncated payload")
    return x


class AudioFeatures:
    """Actor-pool stage: binary audio column → integer feature columns
    (n_samples, peak = max |x|, energy_mean = Σx² // n — integer-exact so
    the SQL oracle matches bit-for-bit)."""

    def __init__(self) -> None:
        decode_audio(synth_audio(0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, peaks, energies = [], [], []
        for payload in batch["audio"].to_pylist():
            try:
                x = decode_audio(payload).astype(np.int64)
                ns.append(len(x))
                peaks.append(int(np.abs(x).max()) if len(x) else 0)
                energies.append(int((x * x).sum() // len(x)) if len(x) else 0)
            except Exception:
                ns.append(None)
                peaks.append(None)
                energies.append(None)
        out = batch.drop_columns(["audio"])
        out = out.append_column("n_samples", pa.array(ns, type=pa.int64()))
        out = out.append_column("peak", pa.array(peaks, type=pa.int64()))
        out = out.append_column("energy_mean",
                                pa.array(energies, type=pa.int64()))
        return out


def audio_dataset(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "audio": pa.array([synth_audio(i) for i in ids],
                              type=pa.binary()),
        })

    return ds.map_batches(gen, batch_format="pyarrow")


def audio_features(sf_dir: str, batch_size: int = 256):
    """Audio pipeline: synth payloads → decode/feature actor pool."""
    return audio_dataset(sf_dir).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, 4), num_cpus=1)


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


class ImageSignature:
    """Actor-pool stage: binary image → 64-bit content signature of its
    4×4 nearest-neighbor thumbnail — the cross-image exact-dup key (the
    pHash-family slot; with real codecs the decode call changes, the
    signature plumbing does not)."""

    def __init__(self, side: int = 4) -> None:
        self._side = side
        decode_image(synth_image(0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        ids, sigs = [], []
        for doc_id, payload in zip(batch["doc_id"].to_pylist(),
                                   batch["image"].to_pylist()):
            try:
                _, _, pix = decode_image(payload)
                small = resize_nearest(pix, self._side, self._side)
                h = hashlib.md5(small.astype(np.uint8).tobytes()).digest()
                sigs.append(int.from_bytes(h[:8], "big") >> 1)
                ids.append(doc_id)
            except Exception:
                continue        # undecodable rows drop from dedup
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "sig": pa.array(sigs, type=pa.int64())})


def image_signature_dedup(sf_dir: str, batch_size: int = 256):
    """Cross-image exact dedup by thumbnail signature: decode+resize+hash
    in an actor pool (small batches — payload rows are wide), then the
    standard combiner-first dedup: per-batch ``(sig, min doc_id, n)``
    partials into ONE ``groupby(sig)`` — images never cross the
    exchange, only 16 B/duplicate-group combiner rows do.

    Returns a Dataset of ``(rep_doc_id, n_images)`` — the canonical
    (min-id) survivor of every signature group and its group size.
    """
    from ray.data.aggregate import Min, Sum

    sigs = images_dataset(sf_dir).map_batches(
        ImageSignature, batch_format="pyarrow",
        batch_size=batch_size, concurrency=(1, 4), num_cpus=1)

    def partial(t: pa.Table) -> pa.Table:
        s = np.asarray(t["sig"].combine_chunks()
                       if isinstance(t["sig"], pa.ChunkedArray)
                       else t["sig"], dtype=np.int64)
        d = np.asarray(t["doc_id"].combine_chunks()
                       if isinstance(t["doc_id"], pa.ChunkedArray)
                       else t["doc_id"], dtype=np.int64)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        new = np.ones(len(s), dtype=bool)
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(s)))
        return pa.table({"sig": pa.array(s[starts]),
                         "rep": pa.array(d[starts]),
                         "n": pa.array(n.astype(np.int64))})

    agg = (sigs.map_batches(partial, batch_format="pyarrow")
           .groupby("sig").aggregate(Min("rep", alias_name="rep_doc_id"),
                                     Sum("n", alias_name="n_images")))
    return agg.map_batches(
        lambda t: t.select(["rep_doc_id", "n_images"]),
        batch_format="pyarrow")


def synth_frame_luma(doc_id: int, n_frames: int) -> np.ndarray:
    """Deterministic fake per-frame mean luma for the IMG1 'video'
    family (SQL-reproducible arithmetic, the :func:`synth_image`
    convention): luma(f) = (doc_id * 37 + f * f * 11) % 251."""
    f = np.arange(n_frames, dtype=np.int64)
    return (doc_id * 37 + f * f * 11) % 251


def video_scene_cuts(sf_dir: str, threshold: int = 60,
                     batch_size: int = 256):
    """Scene-cut detection plumbing over the fake frame sequences —
    a cut lands at frame f (≥1) when |luma(f) − luma(f−1)| > threshold
    (the classic mean-intensity-delta detector; a real decoder slots in
    behind :func:`decode_image` exactly as the other stubbed stages
    document).  Returns (doc_id, frame_idx) per cut.

    Actor-pool stage like :class:`ImageFeatures`: frame count and lumas
    derive per doc, diffs vectorize per batch — the Ray-side plumbing
    (batching, schema, fan-out of variable-length frame sequences) is
    the real deliverable; the luma arithmetic is the sandbox stand-in.
    """
    import ray.data  # noqa: F401

    imgs = images_dataset(sf_dir)

    def cuts(t: pa.Table) -> pa.Table:
        ids_out, frames_out = [], []
        for doc_id in t["doc_id"].to_pylist():
            n_frames = 8 + doc_id % 8
            luma = synth_frame_luma(doc_id, n_frames)
            d = np.abs(np.diff(luma))
            hits = np.nonzero(d > threshold)[0] + 1
            ids_out.extend([doc_id] * len(hits))
            frames_out.extend(hits.tolist())
        return pa.table({"doc_id": pa.array(ids_out, type=pa.int64()),
                         "frame_idx": pa.array(frames_out,
                                               type=pa.int64())})

    return imgs.map_batches(cuts, batch_format="pyarrow",
                            batch_size=batch_size)


#: aspect-ratio bucket boundaries (permille of width/height): midpoints
#: between the standard training buckets 1:2, 3:4, 1:1, 4:3, 2:1
ASPECT_BUCKETS = ((625, 500), (875, 750), (1167, 1000), (1667, 1333))


def aspect_bucket(ratio_permille: np.ndarray) -> np.ndarray:
    """Vectorized bucket assignment: nearest standard aspect bucket by
    threshold (SDXL-style aspect-ratio bucketing for batch collation)."""
    out = np.full(len(ratio_permille), 2000, dtype=np.int64)
    for cut, bucket in reversed(ASPECT_BUCKETS):
        out = np.where(ratio_permille <= cut, bucket, out)
    return out


def aspect_bucket_plan(sf_dir: str, batch_size: int = 256):
    """Aspect-ratio bucketing plan over the image corpus: decode each
    payload's (width, height) in the actor-pool stage, assign the nearest
    standard aspect bucket (images in one bucket batch together with
    minimal crop/pad), and report bucket populations — the collation
    plan an image-training loader consumes.

    Same scale shape as :func:`image_features` (small batches, early
    payload projection) plus one combiner groupby over ≤ |buckets|
    rows per block.  Returns (bucket_permille, n_images).
    """
    from ray.data.aggregate import Sum

    feats = images_dataset(sf_dir).map_batches(
        ImageFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=(1, 4), num_cpus=1)

    def partial(t: pa.Table) -> pa.Table:
        w = np.asarray(t["width"].combine_chunks()
                       if isinstance(t["width"], pa.ChunkedArray)
                       else t["width"]).astype(np.int64)
        h = np.asarray(t["height"].combine_chunks()
                       if isinstance(t["height"], pa.ChunkedArray)
                       else t["height"]).astype(np.int64)
        b = aspect_bucket(1000 * w // h)
        g = pa.table({"bucket_permille": pa.array(b)}) \
            .group_by("bucket_permille").aggregate([([], "count_all")])
        return pa.table({
            "bucket_permille": g["bucket_permille"],
            "n_p": g["count_all"].cast(pa.int64())})

    return (feats.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket_permille")
            .aggregate(Sum("n_p", alias_name="n_images")))
