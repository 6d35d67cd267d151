"""Video / audio payload operators (multimodal plumbing).

Same discipline as :mod:`fiona_spark.operators.images` (the brief's
multimodal contract): treat the payload as an opaque ``binary`` column
with typed metadata, make the SPARK side — schema, column pruning,
mapInPandas batch shape, deterministic sampling — fully real, and gate
only the external-codec decode behind NotImplementedError.  The
engine-native formats decode for real:

  * ``rawv``: video as n_frames concatenated raw RGB frames
    (h*w*3 bytes each) — the uncompressed interchange layout;
  * ``pcm16``: audio as little-endian int16 mono samples.

External formats (h264/vp9/mp3/opus/...) need codec libraries this
sandbox doesn't ship; they raise, per the declared-stub contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

VIDEO_FORMATS = ("rawv",)
AUDIO_FORMATS = ("pcm16",)

FRAME_SCHEMA = ("video_id string, frame_idx int, w int, h int, "
                "bytes binary, mean_lum double")


def frame_sample(videos: DataFrame, k: int = 4) -> DataFrame:
    """Deterministically sample ``k`` frames per video (uniform index
    spacing over n_frames, always including frame 0): one output row
    per sampled frame with the raw frame payload and its mean
    luminance.

    Input columns: (video_id, bytes, fmt, n_frames, w, h).  Frame
    extraction for ``rawv`` is a numpy slice of the flat payload — no
    copy until the sampled frame is materialized; the full payload
    crosses Arrow once (the same ~50 MB/s-per-worker floor as image
    decode, measured r1).
    """
    def run(batches):
        for pdf in batches:
            vids, idxs, ws, hs, bs, lums = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.fmt not in VIDEO_FORMATS:
                    raise NotImplementedError(
                        f"decoder for fmt={row.fmt!r} requires a video "
                        "codec library not present in this environment")
                w, h, nf = int(row.w), int(row.h), int(row.n_frames)
                frame_bytes = w * h * 3
                buf = np.frombuffer(bytes(row.bytes), dtype=np.uint8)
                if len(buf) < nf * frame_bytes:
                    raise ValueError(
                        f"video {row.video_id!r}: payload {len(buf)} B "
                        f"< n_frames*w*h*3 = {nf * frame_bytes} B "
                        "(truncated or mis-declared rawv)")
                kk = min(k, nf)
                sel = (np.arange(kk) * nf) // kk        # includes 0
                # all frames equal-sized: one reshape view + one
                # fancy-index gather, mean along the frame axis (no
                # per-frame Python loop for the arithmetic)
                picked = buf[:nf * frame_bytes].reshape(nf, frame_bytes)[sel]
                fr_lums = picked.mean(axis=1) if frame_bytes else \
                    np.zeros(kk)
                for fi, fr, lu in zip(sel, picked, fr_lums):
                    vids.append(row.video_id)
                    idxs.append(int(fi)); ws.append(w); hs.append(h)
                    bs.append(fr.tobytes())
                    lums.append(float(lu))
            yield pd.DataFrame({
                "video_id": pd.Series(vids, dtype=object),
                "frame_idx": pd.Series(idxs, dtype=np.int32),
                "w": pd.Series(ws, dtype=np.int32),
                "h": pd.Series(hs, dtype=np.int32),
                "bytes": pd.Series(bs, dtype=object),
                "mean_lum": pd.Series(lums, dtype=np.float64)})

    cols = ["video_id", "bytes", "fmt", "n_frames", "w", "h"]
    return videos.select(*cols).mapInPandas(run, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = ("audio_id string, win_idx int, n_samples int, "
                       "rms double, peak int")


def audio_windows(audio: DataFrame, window_samples: int = 16000) -> DataFrame:
    """Fixed-length analysis windows over PCM payloads: one row per
    window with RMS energy and peak amplitude — the audio analogue of
    block_tiles (payload -> per-window features keyed for downstream
    joins).  Input columns: (audio_id, bytes, fmt, sample_rate)."""
    def run(batches):
        for pdf in batches:
            ids, wi, ns, rms, peak = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                if row.fmt not in AUDIO_FORMATS:
                    raise NotImplementedError(
                        f"decoder for fmt={row.fmt!r} requires an audio "
                        "codec library not present in this environment")
                x = np.frombuffer(bytes(row.bytes), dtype="<i2")
                n_win = len(x) // window_samples
                if n_win == 0:
                    continue
                m = (x[:n_win * window_samples].astype(np.float64)
                     .reshape(n_win, window_samples))
                ids.append(np.repeat(row.audio_id, n_win))
                wi.append(np.arange(n_win, dtype=np.int32))
                ns.append(np.full(n_win, window_samples, dtype=np.int32))
                rms.append(np.sqrt((m * m).mean(axis=1)))
                peak.append(np.abs(m).max(axis=1).astype(np.int64))
            if not ids:
                yield pd.DataFrame({
                    "audio_id": pd.Series([], dtype=object),
                    "win_idx": pd.Series([], dtype=np.int32),
                    "n_samples": pd.Series([], dtype=np.int32),
                    "rms": pd.Series([], dtype=np.float64),
                    "peak": pd.Series([], dtype=np.int64)})
                continue
            yield pd.DataFrame({
                "audio_id": np.concatenate(ids),
                "win_idx": np.concatenate(wi),
                "n_samples": np.concatenate(ns),
                "rms": np.concatenate(rms),
                "peak": np.concatenate(peak)})

    cols = ["audio_id", "bytes", "fmt", "sample_rate"]
    return audio.select(*cols).mapInPandas(run, AUDIO_WINDOW_SCHEMA)
