"""Multimodal-column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed by actor-pool
map_batches stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
the decode kernel is STUBBED: ``DecodeStub`` produces a deterministic
fake feature vector derived from the payload bytes (flagged
``decoded_fake=True``), and raises ``NotImplementedError`` when
``require_real=True``. Everything around the kernel — schema, batch
sizing for large binary payloads, actor signature, output layout — is
real and tested, so a real decoder drops in by replacing one method.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),  # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: payload = seeded pseudo-random
    bytes sized like a thumbnail/clip; metadata consistent per kind."""
    kinds = ["image", "audio", "video"]
    ids, kind_l, payloads, w, h, d = [], [], [], [], [], []
    for i in range(n):
        k = kinds[i % 3]
        rng = np.random.RandomState(seed * 1_000_003 + i)
        size = {"image": 4096, "audio": 8192, "video": 16384}[k]
        ids.append(i)
        kind_l.append(k)
        payloads.append(rng.bytes(size))
        w.append(64 if k != "audio" else -1)
        h.append(64 if k != "audio" else -1)
        d.append(-1 if k == "image" else 5000)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind_l, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "duration_ms": pa.array(d, pa.int32()),
        }
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage. __init__ is where a real
    model/codec would load (once per actor); __call__ is per batch.

    Use small batch_size (large binary payloads!) — e.g.
    ``map_batches(DecodeStub, batch_size=32, concurrency=4, num_cpus=1)``.
    """

    def __init__(self, require_real: bool = False):
        if require_real:
            raise NotImplementedError(
                "no image/audio codecs in this environment — plug a real "
                "decoder here (PIL / torchaudio / ffmpeg)"
            )
        self.require_real = require_real

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic payload-derived feature vector (blake2b caps at 64
        # bytes per digest → concat two salted digests for 128 bytes)
        h = (
            hashlib.blake2b(payload, digest_size=64, salt=b"a").digest()
            + hashlib.blake2b(payload, digest_size=64, salt=b"b").digest()
        )
        arr = np.frombuffer(h, dtype=np.uint32).astype(np.float32)
        arr = arr / np.float32(2**32)
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._fake_features(p) for p in batch["payload"].to_pylist()]
        out = batch.drop_columns(["payload"])  # drop the wide column early
        out = out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), FEATURE_DIM))
        )
        return out.append_column(
            "decoded_fake", pa.array([True] * batch.num_rows, pa.bool_())
        )


def decode_media(ds, concurrency=(2, 4), batch_size: int = 32):
    return ds.map_batches(
        DecodeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_stub(ds, target: int = 32):
    """Resize plumbing: rewrites metadata, keeps features (a real impl
    would transform pixels; the Ray-side shape is identical)."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = pc.if_else(pc.equal(t["width"], -1), t["width"], pa.scalar(target, pa.int32()))
        h = pc.if_else(pc.equal(t["height"], -1), t["height"], pa.scalar(target, pa.int32()))
        t = t.set_column(t.schema.get_field_index("width"), "width", w)
        return t.set_column(t.schema.get_field_index("height"), "height", h)

    return ds.map_batches(f, batch_format="pyarrow")


def frame_sample_stub(ds, every_ms: int = 1000):
    """Frame-sampling plumbing for video rows: explodes each video into
    one row per sampled frame offset (flat_map semantics via map_batches)."""

    def f(t: pa.Table) -> pa.Table:
        ids, kinds, offs = [], [], []
        for mid, kind, dur in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(), t["duration_ms"].to_pylist()
        ):
            if kind == "video" and dur > 0:
                for off in range(0, dur, every_ms):
                    ids.append(mid)
                    kinds.append(kind)
                    offs.append(off)
            else:
                ids.append(mid)
                kinds.append(kind)
                offs.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_ms": pa.array(offs, pa.int32()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
