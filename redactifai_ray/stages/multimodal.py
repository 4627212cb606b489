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


# ------------------------------------------------------------- video --

VIDEO_MAGIC = b"FAKEVID!"


def encode_fake_video(frames: list[bytes], fps: int = 30) -> bytes:
    """Fake "video" byte format: magic + fps:uint16 + n:uint16 + per-frame
    (len:uint32 + payload). Each frame payload is a fake-image byte blob."""
    out = [VIDEO_MAGIC, struct.pack("<HH", fps, len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


class FrameSample:
    """Actor-pool stage: video blob → one row per sampled frame.

    The 1→N explode pattern for heavy binary payloads (the brief's
    "frame-sample" op): input rows carry a whole video; output rows carry
    single frames ready for the image stages. Run with a SMALL
    ``batch_size`` (videos are large — batch × concurrency must fit the
    worker heap) and drop the video blob in-stage so only sampled frames
    ride downstream. Real deployments construct the demuxer (ffmpeg) once
    per actor here; the fake parser exercises identical plumbing.
    """

    def __init__(
        self,
        every_n: int = 10,
        bytes_col: str = "video",
        id_col: str = "doc_id",
        fake: bool = False,
    ):
        if not fake:
            raise NotImplementedError(
                "no video codec in this environment — construct with fake=True"
            )
        self.every_n = every_n
        self.bytes_col = bytes_col
        self.id_col = id_col

    def frames_of(self, raw: bytes) -> list[bytes]:
        if not raw or not raw.startswith(VIDEO_MAGIC):
            return []
        fps, n = struct.unpack_from("<HH", raw, len(VIDEO_MAGIC))
        pos = len(VIDEO_MAGIC) + 4
        frames = []
        for _ in range(n):
            if pos + 4 > len(raw):
                break
            (sz,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            frames.append(raw[pos : pos + sz])
            pos += sz
        return frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, blobs = [], [], []
        for doc_id, raw in zip(
            batch[self.id_col].to_pylist(), batch[self.bytes_col].to_pylist()
        ):
            frames = self.frames_of(raw or b"")
            for i in range(0, len(frames), self.every_n):
                ids.append(doc_id)
                idxs.append(i)
                blobs.append(frames[i])
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_idx": pa.array(idxs, pa.int32()),
                "image": pa.array(blobs, pa.binary()),
            }
        )


# ------------------------------------------------------------- audio --

AUDIO_MAGIC = b"FAKEAUD!"


def encode_fake_audio(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Fake "audio" byte format: magic + rate:uint32 + int16 LE samples."""
    return (
        AUDIO_MAGIC
        + struct.pack("<I", sample_rate)
        + np.asarray(samples, dtype="<i2").tobytes()
    )


class AudioFeatures:
    """Actor-pool stage: audio blob → (sample_rate, n_samples, duration_s,
    rms, zero-crossing rate). Vectorized numpy over the sample buffer; the
    blob drops in-stage. Real deployments construct the audio decoder
    once per actor here (torchaudio/soundfile analog)."""

    def __init__(self, bytes_col: str = "audio", fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "no audio codec in this environment — construct with fake=True"
            )
        self.bytes_col = bytes_col

    def features_of(self, raw: bytes) -> tuple[int, int, float, float, float]:
        if not raw or not raw.startswith(AUDIO_MAGIC):
            return 0, 0, 0.0, 0.0, 0.0
        (rate,) = struct.unpack_from("<I", raw, len(AUDIO_MAGIC))
        samples = np.frombuffer(raw, dtype="<i2", offset=len(AUDIO_MAGIC) + 4)
        if samples.size == 0 or rate == 0:
            return int(rate), 0, 0.0, 0.0, 0.0
        x = samples.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        return int(rate), int(samples.size), samples.size / rate, rms, zcr

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, ns, durs, rmss, zcrs = [], [], [], [], []
        for raw in batch[self.bytes_col].to_pylist():
            r, n, d, rms, z = self.features_of(raw or b"")
            rates.append(r)
            ns.append(n)
            durs.append(d)
            rmss.append(rms)
            zcrs.append(z)
        out = batch.drop_columns([self.bytes_col])
        out = out.append_column("sample_rate", pa.array(rates, pa.int32()))
        out = out.append_column("n_samples", pa.array(ns, pa.int64()))
        out = out.append_column("duration_s", pa.array(durs, pa.float64()))
        out = out.append_column("rms", pa.array(rmss, pa.float64()))
        out = out.append_column("zcr", pa.array(zcrs, pa.float64()))
        return out
