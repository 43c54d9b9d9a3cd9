"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL/ffmpeg/etc.) are NOT in this container, so the
actual media decoding is stubbed behind a clearly-marked seam
(``decoder=`` injection; the default raises NotImplementedError, tests
inject a deterministic fake). Everything Ray-side — schema, batch
sizing for large payloads, actor signature, output layout — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data


def binary_metadata(ds: ray.data.Dataset, id_col: str, payload_col: str) -> ray.data.Dataset:
    """id, payload_bytes — vectorized byte-length over a binary column."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "payload_bytes": pc.cast(pc.binary_length(batch.column(payload_col)), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _default_decoder(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media decode libraries are not available in this environment; "
        "inject decoder= (see tests/test_multimodal.py for the deterministic fake)"
    )


class MediaFeatureStage:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    __init__ loads the (injected) decoder once per actor; __call__ decodes
    per batch. batch_size should be small for large payloads (the caller
    sizes it; see pipelines docstring re target_max_block_size).
    """

    def __init__(
        self,
        payload_col: str,
        id_col: str,
        decoder: Callable[[bytes], np.ndarray] | None = None,
        feature_dim: int = 8,
    ) -> None:
        self.payload_col = payload_col
        self.id_col = id_col
        self.decoder = decoder or _default_decoder
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats = [], []
        for i, payload in zip(
            batch.column(self.id_col).to_pylist(), batch.column(self.payload_col).to_pylist()
        ):
            if payload is None:
                continue
            decoded = self.decoder(payload)
            v = np.asarray(decoded, dtype=np.float32).ravel()
            out = np.zeros(self.feature_dim, dtype=np.float32)
            out[: min(v.size, self.feature_dim)] = v[: self.feature_dim]
            ids.append(i)
            feats.append(out.tolist())
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def _default_mm_concurrency() -> int:
    from ..util import default_concurrency

    return default_concurrency()


def extract_media_features(
    ds: ray.data.Dataset,
    payload_col: str,
    id_col: str,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    batch_size: int = 64,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are large binaries
        concurrency=concurrency or _default_mm_concurrency(),
    )


def sample_frames(
    ds: ray.data.Dataset,
    payload_col: str,
    id_col: str,
    n_frames: int = 4,
    frame_extractor: Callable[[bytes, int, int], bytes] | None = None,
    batch_size: int = 64,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """One-to-many media stage: each (video) payload fans out to
    ``n_frames`` rows (id, frame_idx, frame_payload). The actual frame
    extraction is an injected seam like the feature decoder (ffmpeg is
    not in this container); the default deterministic stub slices the
    payload evenly so the fan-out shape, batch sizing and output layout
    are real and testable."""

    def default_extractor(payload: bytes, idx: int, n: int) -> bytes:
        step = max(1, len(payload) // n)
        return payload[idx * step : idx * step + step]

    extract = frame_extractor or default_extractor

    class FrameSampler:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, idxs, frames = [], [], []
            for i, payload in zip(
                batch.column(id_col).to_pylist(), batch.column(payload_col).to_pylist()
            ):
                if payload is None:
                    continue
                for f in range(n_frames):
                    ids.append(i)
                    idxs.append(f)
                    frames.append(extract(payload, f, n_frames))
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "frame_idx": pa.array(idxs, pa.int32()),
                    "frame_payload": pa.array(frames, pa.binary()),
                }
            )

    return ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are large binaries
        concurrency=concurrency or _default_mm_concurrency(),
    )
