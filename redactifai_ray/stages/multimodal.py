"""Multimodal binary-column stages: decode / feature-extract plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata —
the same schema discipline as the ``html`` column. The actual codec
libraries (Pillow, ffmpeg, torchaudio…) are NOT in this container, so the
decode kernels are stubbed: ``DecodeImage`` raises ``NotImplementedError``
unless constructed with ``fake=True``, in which case a deterministic fake
decoder (header-parsed dims + byte-histogram features) exercises the full
Ray-side plumbing — schema, batch size, actor signature, output layout —
for real. Swapping in a real codec is a one-method change.

Fake "image" byte format (for tests/fixtures):
    b"FAKEIMG!" + width:uint16 LE + height:uint16 LE + payload bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG!"

FEATURE_DIM = 16  # byte-histogram buckets


def encode_fake_image(width: int, height: int, payload: bytes) -> bytes:
    return MAGIC + struct.pack("<HH", width, height) + payload


class DecodeImage:
    """Actor-pool stage: binary column → (width, height, features).

    Real deployments load the codec once per actor here (``__init__`` —
    the model-load analog of the reference's per-worker cloud clients,
    ST1-ST3); per-batch work decodes and featurizes vectorized.
    """

    def __init__(self, bytes_col: str = "image", fake: bool = False):
        self.bytes_col = bytes_col
        self.fake = fake
        if not fake:
            # real decoder would be constructed here (PIL/cv2); neither is
            # available in this environment by design
            raise NotImplementedError(
                "no image codec in this environment — construct with fake=True "
                "to exercise the pipeline plumbing with the deterministic stub"
            )

    def decode_one(self, raw: bytes) -> tuple[int, int, np.ndarray]:
        if not raw or not raw.startswith(MAGIC):
            return 0, 0, np.zeros(FEATURE_DIM, dtype=np.float32)
        w, h = struct.unpack_from("<HH", raw, len(MAGIC))
        payload = np.frombuffer(raw, dtype=np.uint8, offset=len(MAGIC) + 4)
        if payload.size == 0:
            feats = np.zeros(FEATURE_DIM, dtype=np.float32)
        else:
            hist, _ = np.histogram(payload, bins=FEATURE_DIM, range=(0, 256))
            feats = (hist / payload.size).astype(np.float32)
        return int(w), int(h), feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, feats, ok = [], [], [], []
        for raw in batch[self.bytes_col].to_pylist():
            w, h, f = self.decode_one(raw or b"")
            ws.append(w)
            hs.append(h)
            feats.append(f.tolist())
            ok.append(w > 0 and h > 0)
        out = batch.drop_columns([self.bytes_col])  # decoded → drop the blob
        out = out.append_column("width", pa.array(ws, pa.int32()))
        out = out.append_column("height", pa.array(hs, pa.int32()))
        out = out.append_column(
            "features", pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM))
        )
        out = out.append_column("decode_ok", pa.array(ok, pa.bool_()))
        return out


class ResizeStub:
    """Resize stage signature (actor pool). Stub: recomputes metadata only;
    a real kernel would transform pixels. Keeps the contract that binary
    payload stages declare output schema up front."""

    def __init__(self, target: int = 224, bytes_col: str = "image", fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "no image codec in this environment — construct with fake=True"
            )
        self.target = target
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        resized = []
        for raw in batch[self.bytes_col].to_pylist():
            raw = raw or b""
            if raw.startswith(MAGIC):
                payload = raw[len(MAGIC) + 4 :]
                resized.append(encode_fake_image(self.target, self.target, payload))
            else:
                resized.append(raw)
        return batch.set_column(
            batch.column_names.index(self.bytes_col),
            self.bytes_col,
            pa.array(resized, pa.binary()),
        )
