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


def probe_media(
    ds: ray.data.Dataset, payload_col: str, id_col: str, jpeg_scan_bytes: int = 4096
) -> ray.data.Dataset:
    """REAL (dependency-free) container-header probing over a binary
    column: detects PNG / GIF / WAV / JPEG by magic bytes and extracts
    (width, height) or (channels, sample_rate) straight from the headers
    — no PIL/ffmpeg needed, unlike the pixel-decode seam below which
    stays injected. PNG/GIF/WAV fields sit at fixed offsets and are read
    with vectorized gathers over the flat prefix buffer; JPEG needs a
    marker walk, done per JPEG row over a bounded ``jpeg_scan_bytes``
    prefix (a few comparisons per marker — the payload itself is never
    decoded)."""
    import pyarrow.compute as pc

    from ..stripe import _binary_parts

    def u(data: np.ndarray, idx: np.ndarray, k: int) -> np.ndarray:
        return data[idx + k].astype(np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        pay = batch.column(payload_col)
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        if pa.types.is_string(pay.type) or pa.types.is_large_string(pay.type):
            pay = pay.cast(pa.large_binary())
        n = len(pay)
        valid = pay.is_valid().to_numpy(zero_copy_only=False)
        prefix = pc.binary_slice(pay, 0, 32)
        data, offs = _binary_parts(prefix)
        data = np.concatenate([data, np.zeros(32, np.uint8)])  # pad gathers
        s = offs[:-1]
        lens = np.diff(offs)
        n_valid = s.size

        fmt = np.zeros(n_valid, dtype=np.int8)  # 0 unknown 1 png 2 gif 3 wav 4 jpeg
        width = np.full(n_valid, -1, np.int64)
        height = np.full(n_valid, -1, np.int64)
        channels = np.full(n_valid, -1, np.int64)
        rate = np.full(n_valid, -1, np.int64)

        png = (
            (lens >= 24)
            & (u(data, s, 0) == 0x89) & (u(data, s, 1) == 0x50)
            & (u(data, s, 2) == 0x4E) & (u(data, s, 3) == 0x47)
            & (u(data, s, 4) == 0x0D) & (u(data, s, 5) == 0x0A)
        )
        fmt[png] = 1
        sp = s[png]
        width[png] = (u(data, sp, 16) << 24) | (u(data, sp, 17) << 16) | (u(data, sp, 18) << 8) | u(data, sp, 19)
        height[png] = (u(data, sp, 20) << 24) | (u(data, sp, 21) << 16) | (u(data, sp, 22) << 8) | u(data, sp, 23)

        gif = (
            (lens >= 10)
            & (u(data, s, 0) == 0x47) & (u(data, s, 1) == 0x49)
            & (u(data, s, 2) == 0x46) & (u(data, s, 3) == 0x38)
        )
        fmt[gif] = 2
        sg = s[gif]
        width[gif] = u(data, sg, 6) | (u(data, sg, 7) << 8)
        height[gif] = u(data, sg, 8) | (u(data, sg, 9) << 8)

        wav = (
            (lens >= 28)
            & (u(data, s, 0) == 0x52) & (u(data, s, 1) == 0x49)
            & (u(data, s, 2) == 0x46) & (u(data, s, 3) == 0x46)
            & (u(data, s, 8) == 0x57) & (u(data, s, 9) == 0x41)
            & (u(data, s, 10) == 0x56) & (u(data, s, 11) == 0x45)
            # fmt chunk first (the overwhelmingly common layout)
            & (u(data, s, 12) == 0x66) & (u(data, s, 13) == 0x6D)
        )
        fmt[wav] = 3
        sw = s[wav]
        channels[wav] = u(data, sw, 22) | (u(data, sw, 23) << 8)
        rate[wav] = (
            u(data, sw, 24) | (u(data, sw, 25) << 8) | (u(data, sw, 26) << 16) | (u(data, sw, 27) << 24)
        )

        jpg = (lens >= 4) & (u(data, s, 0) == 0xFF) & (u(data, s, 1) == 0xD8) & (u(data, s, 2) == 0xFF)
        fmt[jpg] = 4
        if jpg.any():
            # marker walk per JPEG row over a bounded prefix (SOF0/1/2
            # carries height@+5, width@+7 big-endian)
            jpos = np.flatnonzero(jpg)
            # slice heads for the JPEG rows only — slicing every valid
            # row materializes ~jpeg_scan_bytes per row of copies for a
            # handful of marker walks
            heads = pc.binary_slice(
                pay.drop_null().take(pa.array(jpos, pa.int64())), 0, jpeg_scan_bytes
            )
            for hi, j in enumerate(jpos):
                b = heads[hi].as_py()
                pos, m = 2, memoryview(b)
                while pos + 9 < len(m):
                    if m[pos] != 0xFF:
                        break
                    marker = m[pos + 1]
                    if marker in (0xC0, 0xC1, 0xC2):
                        height[j] = (m[pos + 5] << 8) | m[pos + 6]
                        width[j] = (m[pos + 7] << 8) | m[pos + 8]
                        break
                    if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                        pos += 2
                        continue
                    pos += 2 + ((m[pos + 2] << 8) | m[pos + 3])

        names = np.array(["unknown", "png", "gif", "wav", "jpeg"], dtype=object)
        from ..stripe import _scatter

        mask = valid if int(valid.sum()) != n else None
        fmt_full = _scatter(fmt, mask, n, 0)

        def col(v: np.ndarray) -> pa.Array:
            full = _scatter(v, mask, n, -1)
            return pa.array(full, pa.int64(), mask=(full < 0) | ~valid)

        return pa.table(
            {
                id_col: batch.column(id_col),
                "format": pa.array(names[fmt_full], pa.string(), mask=~valid),
                "width": col(width),
                "height": col(height),
                "channels": col(channels),
                "sample_rate": col(rate),
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
