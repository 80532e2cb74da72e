"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride through the pipeline as Arrow ``binary``
columns plus typed metadata columns; decode / feature-extract stages
are actor-pool ``map_batches`` (decoder state built once per actor in
``__init__``). The actual codec libraries (PIL/ffmpeg) are absent in
this container, so the *decode* step is stubbed behind an import-try —
the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested.

Payload format used by the deterministic fake codec ("FAKEIMG"):
  bytes 0..3   magic  b"FIMG"
  bytes 4..5   width  uint16 LE
  bytes 6..7   height uint16 LE
  bytes 8..    pixel payload (1 byte/px, truncated/padded)

The reference's closest analogue is the binary passthrough parser
(parser/BinaryParser.java:86-92: digest-only handling of non-text
bodies); this module extends it to typed media metadata.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FIMG"
HEADER_LEN = 8

try:  # real decoder path — absent in this container by design
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def fake_width(doc_id: int | np.ndarray):
    return (doc_id * 37) % 1024 + 16


def fake_height(doc_id: int | np.ndarray):
    return (doc_id * 53) % 768 + 16


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> + payload: binary (deterministic fake image).

    Payload pixels are the utf-8 bytes of the text clipped to w*h —
    pure function of the row, so any shard regenerates independently.
    """
    doc = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    w = fake_width(doc)
    h = fake_height(doc)
    payloads = []
    for i, t in enumerate(texts):
        px = (t or "").encode("utf-8")[: int(w[i]) * int(h[i])]
        payloads.append(
            MAGIC + struct.pack("<HH", int(w[i]), int(h[i])) + px
        )
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class DecodeImageMeta:
    """Actor-pool decode stage: parse headers, emit typed metadata.

    Use as ``ds.map_batches(DecodeImageMeta, concurrency=N,
    batch_size=SMALL)`` — binary payloads are large, so the batch size
    must be sized by bytes, not rows. Real pixel decoding requires PIL
    and raises NotImplementedError here (stub per the build spec).
    """

    def __init__(self, decode_pixels: bool = False):
        # per-actor init: in a real deployment, codec contexts / model
        # weights load here, once per actor, never per batch
        self.decode_pixels = decode_pixels
        if decode_pixels and not HAVE_PIL:
            raise NotImplementedError(
                "pixel decoding requires PIL, which is not available in "
                "this environment; metadata-only decode (decode_pixels="
                "False) is the supported path"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload").combine_chunks()
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + len(col) + 1
        ]
        starts = offs[:-1]
        lens = np.diff(offs)
        ok = lens >= HEADER_LEN
        # vectorized header parse: gather the 8 header bytes per row
        idx = starts[:, None] + np.arange(HEADER_LEN)[None, :]
        hdr = buf[np.clip(idx, 0, len(buf) - 1)]
        magic_ok = ok & (hdr[:, :4] == np.frombuffer(MAGIC, np.uint8)).all(axis=1)
        width = (hdr[:, 4].astype(np.int64) | (hdr[:, 5].astype(np.int64) << 8))
        height = (hdr[:, 6].astype(np.int64) | (hdr[:, 7].astype(np.int64) << 8))
        width = np.where(magic_ok, width, 0)
        height = np.where(magic_ok, height, 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(width),
                "height": pa.array(height),
                "n_bytes": pa.array(lens.astype(np.int64) - HEADER_LEN),
                "valid": pa.array(magic_ok),
            }
        )


class ExtractImageFeatures:
    """Actor-pool feature stage over decoded payload bytes: byte
    histogram moments as a stand-in feature vector (deterministic fake
    for the model-inference stage; same plumbing as a real encoder)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            body = np.frombuffer((p or b"")[HEADER_LEN:], dtype=np.uint8)
            if len(body):
                hist = np.bincount(body % self.dim, minlength=self.dim)
                feats[i] = hist / len(body)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.dim
                ),
            }
        )


def attach_payload(ds):
    return ds.map_batches(attach_payload_batch, batch_format="pyarrow")


def decode_meta(ds, concurrency: int = 2, batch_size: int = 256):
    """Payload table -> typed metadata via the actor-pool decode stage."""
    return ds.map_batches(
        DecodeImageMeta,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
