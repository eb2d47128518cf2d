"""Multimodal column plumbing — opaque binary payloads with typed
metadata, processed by actor-pool stages.

The image/audio decode libraries are NOT in this environment, so the
decode kernel is stubbed (clearly marked); everything Ray-side —
schema, batch sizing for large binary rows, actor signature, output
layout — is real and tested.  Swap :class:`StubDecoder` for a real
decoder (PIL/torchaudio/ffmpeg) without touching the pipeline shape.

Payload rows are ``(item_id, kind, payload:binary, meta:string)``;
``payload_table_from_documents`` manufactures a deterministic corpus
from any text table for tests/benches.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

KINDS = ("image", "audio", "video")


class StubDecoder:
    """STUB: deterministic fake decode.

    A real deployment replaces ``_decode`` with e.g. PIL.Image.open /
    soundfile.read.  The fake derives "decoded" dimensions from a
    blake2b digest of the payload — stable, content-dependent, and
    cheap — and raises on empty payloads the way a real decoder raises
    on truncated files.
    """

    def __init__(self, target_size: int = 224):
        self.target_size = target_size  # resize target (plumbed, unused)

    def _decode(self, payload: bytes, kind: str) -> dict:
        if not payload:
            raise ValueError("empty payload")  # real decoders raise too
        d = hashlib.blake2b(payload, digest_size=8).digest()
        if kind == "image":
            return {"width": 64 + d[0] * 4, "height": 64 + d[1] * 4,
                    "channels": 3, "frames": 1, "sample_rate": 0}
        if kind == "audio":
            return {"width": 0, "height": 0, "channels": 1 + d[0] % 2,
                    "frames": 1000 + int.from_bytes(d[1:3], "big"),
                    "sample_rate": 16000}
        return {"width": 320 + d[0] * 2, "height": 240 + d[1] * 2,
                "channels": 3, "frames": 1 + d[2], "sample_rate": 0}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in ("width", "height", "channels", "frames",
                                "sample_rate", "payload_bytes", "status")}
        for p, kd in zip(payloads, kinds):
            try:
                meta = self._decode(p or b"", kd)
                rows["status"].append("ok")
            except ValueError as e:
                # per-row status instead of the reference's silent
                # bare-except swallow (train_recognition.py:364-367)
                meta = dict.fromkeys(
                    ("width", "height", "channels", "frames",
                     "sample_rate"), 0)
                rows["status"].append(f"error: {e}")
            for k in ("width", "height", "channels", "frames",
                      "sample_rate"):
                rows[k].append(meta[k])
            rows["payload_bytes"].append(len(p or b""))
        cols = {"item_id": batch.column("item_id"),
                "kind": batch.column("kind")}
        for k in ("width", "height", "channels", "frames", "sample_rate",
                  "payload_bytes"):
            cols[k] = pa.array(rows[k], pa.int64())
        cols["status"] = pa.array(rows["status"], pa.string())
        return pa.table(cols)


def decode_metadata(ds, concurrency: int = 4, batch_size: int = 16):
    """The multimodal stage: actor pool, SMALL batch size (large binary
    rows × batch_size bounds worker heap), Arrow end to end."""
    return ds.map_batches(
        StubDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def payload_table_from_documents(docs: pa.Table) -> pa.Table:
    """Deterministic fake payload corpus from a documents table: the
    utf-8 text bytes become the opaque payload; kind round-robins."""
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "kind": pa.array([KINDS[i % len(KINDS)] for i in ids], pa.string()),
        "payload": pa.array([(t or "").encode() for t in texts],
                            pa.binary()),
        "meta": pa.array([json.dumps({"src": "documents"})] * len(ids),
                         pa.string()),
    })


def frame_sample_indices(n_frames: int, every: int = 10) -> np.ndarray:
    """Deterministic frame-sampling plan (video path plumbing)."""
    if n_frames <= 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(0, n_frames, every, dtype=np.int64)
