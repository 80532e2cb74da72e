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
        from ..html_parser import binary_buffer_offsets

        buf, offs = binary_buffer_offsets(batch.column("payload"))
        if len(buf) == 0:
            # all rows empty/null: a zero pad keeps the clipped header
            # gather in-bounds; the magic check masks every row invalid
            buf = np.zeros(1, dtype=np.uint8)
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
                # a byte count never goes below 0, even for payloads
                # shorter than the header (valid=False rows)
                "n_bytes": pa.array(
                    np.maximum(lens.astype(np.int64) - HEADER_LEN, 0)),
                "valid": pa.array(magic_ok),
            }
        )


class ExtractImageFeatures:
    """Actor-pool feature stage over decoded payload bytes: byte
    histogram moments as a stand-in feature vector (deterministic fake
    for the model-inference stage; same plumbing as a real encoder).

    ``exact_bp=True`` emits the histogram as basis points in exact
    integer arithmetic — one int64 column per bin (f0..f{dim-1}),
    ``(10000 * count) // n_bytes`` — so the stage output is
    value-comparable against a SQL oracle (float division is not
    bit-stable across engines; integer division is)."""

    def __init__(self, dim: int = 8, exact_bp: bool = False):
        self.dim = dim
        self.exact_bp = exact_bp

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        hists = np.zeros((n, self.dim), dtype=np.int64)
        sizes = np.zeros(n, dtype=np.int64)
        for i, p in enumerate(payloads):
            body = np.frombuffer((p or b"")[HEADER_LEN:], dtype=np.uint8)
            sizes[i] = len(body)
            if len(body):
                hists[i] = np.bincount(body % self.dim, minlength=self.dim)
        if self.exact_bp:
            bp = (10000 * hists) // np.maximum(sizes, 1)[:, None]
            cols = {"doc_id": batch.column("doc_id")}
            for k in range(self.dim):
                cols[f"f{k}"] = pa.array(bp[:, k])
            return pa.table(cols)
        feats = (hists / np.maximum(sizes, 1)[:, None]).astype(np.float32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.dim
                ),
            }
        )


class ResizeImage:
    """Actor-pool resize stage: nearest-neighbor resampling of the
    1-byte/px fake pixel grid (REAL index arithmetic on the payload
    bytes — no codec needed; swap the kernel for PIL in production,
    the actor/batch plumbing is identical).

    Output payloads always carry exactly ``out_w*out_h`` pixel bytes
    (source grids shorter than w*h read as zero-padded), so downstream
    metadata is a pure function of the input dimensions.
    """

    def __init__(self, scale: float = 0.5):
        self.scale = scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out = []
        for p in payloads:
            p = p or b""
            if len(p) < HEADER_LEN or p[:4] != MAGIC:
                out.append(b"")
                continue
            w, h = struct.unpack("<HH", p[4:8])
            if w == 0 or h == 0:
                # degenerate declared dims: treat like the invalid-magic
                # branch (emit empty) instead of IndexError-ing the task
                out.append(b"")
                continue
            body = np.frombuffer(p, dtype=np.uint8, offset=HEADER_LEN)
            grid = np.zeros(w * h, dtype=np.uint8)
            grid[: len(body)] = body[: w * h]
            ow = max(1, int(w * self.scale))
            oh = max(1, int(h * self.scale))
            ix = (np.arange(ow) * w // ow).astype(np.int64)
            iy = (np.arange(oh) * h // oh).astype(np.int64)
            px = grid.reshape(h, w)[np.ix_(iy, ix)]
            out.append(MAGIC + struct.pack("<HH", ow, oh) + px.tobytes())
        res = batch.drop_columns(["payload"]).append_column(
            "payload", pa.array(out, pa.binary())
        )
        return res


VIDEO_MAGIC = b"FVID"
VIDEO_HEADER_LEN = 10


def fake_n_frames(doc_id: int | np.ndarray):
    return (doc_id % 7) + 1


def fake_frame_w(doc_id: int | np.ndarray):
    return (doc_id % 13) + 4


def fake_frame_h(doc_id: int | np.ndarray):
    return (doc_id % 11) + 4


def attach_video_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> + payload: deterministic fake video —
    ``FVID | n_frames:u16 | w:u16 | h:u16 | frames`` with w*h bytes per
    frame cycled from the utf-8 text (zero-padded)."""
    doc = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    payloads = []
    for i, t in enumerate(texts):
        n = int(fake_n_frames(doc[i]))
        w = int(fake_frame_w(doc[i]))
        h = int(fake_frame_h(doc[i]))
        need = n * w * h
        src = np.frombuffer((t or " ").encode("utf-8"), dtype=np.uint8)
        frames = np.resize(src, need) if len(src) else np.zeros(need, np.uint8)
        payloads.append(
            VIDEO_MAGIC + struct.pack("<HHH", n, w, h) + frames.tobytes()
        )
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class SampleFrames:
    """Actor-pool frame-sampling stage: explode every ``stride``-th
    frame of a fake-video payload into its own row (doc_id, frame_idx,
    frame: binary) — the batch shape a real ffmpeg-backed sampler
    produces, with the decode swapped for byte slicing."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        doc = batch.column("doc_id").to_numpy()
        out_doc, out_idx, out_frame = [], [], []
        for i, p in enumerate(payloads):
            p = p or b""
            if len(p) < VIDEO_HEADER_LEN or p[:4] != VIDEO_MAGIC:
                continue
            n, w, h = struct.unpack("<HHH", p[4:10])
            sz = w * h
            body = p[VIDEO_HEADER_LEN:]
            for fi in range(0, n, self.stride):
                fr = body[fi * sz: (fi + 1) * sz]
                out_doc.append(int(doc[i]))
                out_idx.append(fi)
                out_frame.append(fr.ljust(sz, b"\x00"))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )


def attach_payload(ds):
    return ds.map_batches(attach_payload_batch, batch_format="pyarrow")


def attach_video(ds):
    return ds.map_batches(attach_video_batch, batch_format="pyarrow")


def resize_images(ds, scale: float = 0.5, concurrency: int = 2,
                  batch_size: int = 256):
    return ds.map_batches(
        ResizeImage, fn_constructor_kwargs={"scale": scale},
        batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size,
    )


def sample_frames(ds, stride: int = 2, concurrency: int = 2,
                  batch_size: int = 256):
    return ds.map_batches(
        SampleFrames, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size,
    )


def decode_meta(ds, concurrency: int = 2, batch_size: int = 256):
    """Payload table -> typed metadata via the actor-pool decode stage."""
    return ds.map_batches(
        DecodeImageMeta,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
