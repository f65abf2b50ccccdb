"""Streaming replay: chunked real-time decode -> correct -> render.

The reference slurps whole log files (SURVEY.md section 5.7); deployment
streams are unbounded, so this module processes byte chunks incrementally
with exact offline-parity semantics:

  * decode carry: a frame can straddle a chunk boundary.  By the >=11-byte
    spacing theorem, positions with a full 11-byte window are accepted or
    rejected definitively, so the carry is exactly the last
    ``min(10, bytes after the last emitted frame)`` bytes — the only
    positions whose verdict can change with more data.
  * correction granularity: a row's correction depends on every baseline in
    its sweep group, so rows are buffered until the group closes (UE
    decrease), then corrected and folded into the running intensity
    accumulators.  Per-cell means are sum/count, hence order-independent
    and equal to the offline pivot.

The device-side ingest counterpart (double-buffered HBM->VMEM DMA decode)
lives in ops/pallas_decode.py; this class is the session-state machine
around it.  tests/test_streaming.py proves chunked == offline byte-for-byte
on real logs at multiple chunk sizes.
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

import numpy as np

from slam_process_tpu.config import PipelineConfig, SceneConfig
from slam_process_tpu.ops.correct import correct_frames_np
from slam_process_tpu.ops.decode import extract_fields, frame_start_mask
from slam_process_tpu.ops.scene import IntensityGrid


class StreamingSession:
    def __init__(self, config: Optional[PipelineConfig] = None,
                 n_beams: int = 64):
        self.config = config or PipelineConfig()
        self._carry = np.zeros(0, dtype=np.uint8)
        self._group_rows: list[np.ndarray] = []   # frames of the open sweep
        self._last_ue: Optional[int] = None
        self.n_frames = 0
        self.n_kept = 0
        self.n_groups = 0
        self.filtered_parts: list[np.ndarray] = []
        nb = n_beams
        self._sums = np.zeros((nb, nb))
        self._counts = np.zeros((nb, nb), dtype=np.int64)
        self._finalized = False

    # -- ingest --------------------------------------------------------------

    def feed(self, chunk: Union[bytes, np.ndarray]) -> int:
        """Consume one chunk of tokenized bytes; returns frames decoded."""
        if self._finalized:
            raise RuntimeError(
                "session already finalized: the flush closed the open "
                "sweep group, so feeding more bytes would mis-segment "
                "sweeps; start (or restore) a non-finalized session")
        if isinstance(chunk, (bytes, bytearray)):
            chunk = np.frombuffer(chunk, dtype=np.uint8)
        buf = np.concatenate([self._carry, np.asarray(chunk, dtype=np.uint8)])
        n = len(buf)
        ok = frame_start_mask(buf, self.config.decode)
        starts = np.nonzero(ok)[0]
        frames = (extract_fields(buf, starts) if starts.size
                  else np.zeros((0, 5), np.int64))

        # Carry: suffix that may still become a frame with more data.
        last_end = int(starts[-1]) + self.config.decode.frame_len if starts.size else 0
        carry_start = max(n - (self.config.decode.frame_len - 1), last_end)
        self._carry = buf[carry_start:].copy()

        self.n_frames += len(frames)
        self._push_frames(frames)
        return len(frames)

    def _push_frames(self, frames: np.ndarray) -> None:
        """Vectorized sweep segmentation: split the chunk's frames at UE
        decreases, close every completed group, buffer the open tail."""
        if not len(frames):
            return
        ue = frames[:, 1]
        boundary = np.zeros(len(frames), dtype=bool)
        boundary[0] = self._last_ue is not None and ue[0] < self._last_ue
        boundary[1:] = ue[:-1] > ue[1:]
        cuts = np.nonzero(boundary)[0]
        start = 0
        for cut in cuts:
            if cut > start:
                self._group_rows.append(frames[start:cut])
            self._correct_and_fold_open()
            start = int(cut)
        self._group_rows.append(frames[start:])
        self._last_ue = int(ue[-1])

    def _correct_and_fold_open(self) -> None:
        if not self._group_rows:
            return
        group = np.concatenate(self._group_rows)
        self._group_rows = []
        if not len(group):
            return
        self.n_groups += 1
        res = correct_frames_np(group, self.config.correct)
        if len(res.filtered):
            self.filtered_parts.append(res.filtered)
            self.n_kept += len(res.filtered)
            ue = res.filtered[:, 0]
            bs = res.filtered[:, 1]
            rss = res.filtered[:, 2].astype(np.float64)
            if self.config.scene.log_transform:
                # v1-7 pre-log semantics: drop RSS<=0, fold ln(RSS), so the
                # streaming accumulators equal the offline pivot's mean(ln).
                pos = rss > 0
                ue, bs, rss = ue[pos], bs[pos], np.log(rss[pos])
            np.add.at(self._sums, (ue, bs), rss)
            np.add.at(self._counts, (ue, bs), 1)

    def finalize(self) -> None:
        """Flush the open sweep group (end of stream)."""
        if self._finalized:
            return
        self._correct_and_fold_open()
        self._last_ue = None
        self._finalized = True

    # -- checkpoint / resume ---------------------------------------------

    def save_checkpoint(self, path, extra: Optional[dict] = None) -> None:
        """Write the full host streaming state to ``path`` (one npz file).

        The host-engine counterpart of ``DeviceStreamingSession.
        save_checkpoint`` (same atomic-replace file discipline, same
        ``extra`` side-channel for the caller's cursor); resume equals an
        uninterrupted run exactly (tests/test_checkpoint.py).
        """
        import os
        import pickle

        group = (np.concatenate(self._group_rows) if self._group_rows
                 else np.zeros((0, 5), np.int64))
        meta = {
            "version": 1,
            "kind": "host_stream",
            "config": self.config,
            "last_ue": self._last_ue,
            "n_frames": self.n_frames,
            "n_kept": self.n_kept,
            "n_groups": self.n_groups,
            "finalized": self._finalized,
            "extra": extra,
        }
        blob = np.frombuffer(pickle.dumps(meta, protocol=4), np.uint8)
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, meta=blob, carry=self._carry, sums=self._sums,
                     counts=self._counts, group=group,
                     filtered=self.filtered)
        os.replace(tmp, path)

    @classmethod
    def restore(cls, path) -> "StreamingSession":
        """Rebuild a session from :meth:`save_checkpoint` output."""
        import pickle

        with np.load(path, allow_pickle=False) as z:
            meta = pickle.loads(z["meta"].tobytes())
            if meta.get("kind") != "host_stream":
                raise ValueError(
                    f"not a StreamingSession checkpoint: kind="
                    f"{meta.get('kind')!r} (device-engine checkpoints "
                    "restore via DeviceStreamingSession.restore)")
            if meta.get("version") != 1:
                raise ValueError(
                    f"unsupported checkpoint version {meta.get('version')!r}")
            carry, sums, counts, group, filtered = (
                z["carry"], z["sums"], z["counts"], z["group"],
                z["filtered"])
        sess = cls(config=meta["config"], n_beams=sums.shape[0])
        sess._carry = np.asarray(carry, np.uint8)
        sess._sums = np.asarray(sums, np.float64)
        sess._counts = np.asarray(counts, np.int64)
        sess._group_rows = [np.asarray(group, np.int64)] if len(group) else []
        sess._last_ue = meta["last_ue"]
        sess.n_frames = int(meta["n_frames"])
        sess.n_kept = int(meta["n_kept"])
        sess.n_groups = int(meta["n_groups"])
        sess.filtered_parts = ([np.asarray(filtered, np.int64)]
                               if len(filtered) else [])
        sess._finalized = bool(meta["finalized"])
        sess.checkpoint_extra = meta.get("extra")
        return sess

    # -- results -------------------------------------------------------------

    @property
    def filtered(self) -> np.ndarray:
        if not self.filtered_parts:
            return np.zeros((0, 4), dtype=np.int64)
        return np.concatenate(self.filtered_parts)

    def intensity(self) -> IntensityGrid:
        from slam_process_tpu.ops.scene import grid_from_sums_np

        return grid_from_sums_np(self._sums, self._counts)

    def render(self, angle_lut: np.ndarray, render_cfg=None):
        from slam_process_tpu.config import RenderConfig
        from slam_process_tpu.render.heatmap import render_intensity

        return render_intensity(
            self.intensity(), angle_lut,
            SceneConfig(keep_nan=True, fill_with_min=False),
            render_cfg or RenderConfig(),
        )


def replay_log(raw: np.ndarray, chunk_bytes: int = 1 << 16,
               config: Optional[PipelineConfig] = None,
               render_every: int = 0, angle_lut: Optional[np.ndarray] = None,
               ) -> StreamingSession:
    """Replay one tokenized log through the streaming pipeline."""
    s = StreamingSession(config)
    n_chunks = 0
    for off in range(0, len(raw), chunk_bytes):
        s.feed(raw[off : off + chunk_bytes])
        n_chunks += 1
        if render_every and angle_lut is not None and n_chunks % render_every == 0:
            s.render(angle_lut)
    s.finalize()
    return s


def iter_chunks(raw: np.ndarray, chunk_bytes: int) -> Iterator[np.ndarray]:
    for off in range(0, len(raw), chunk_bytes):
        yield raw[off : off + chunk_bytes]
