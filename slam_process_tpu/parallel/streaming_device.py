"""Device-resident streaming replay: chunked ingest with on-device state.

SURVEY.md §5.7 defines streaming as the sequence-scaling axis: chunked,
double-buffered HBM ingest with no host round-trips.  This module keeps the
WHOLE streaming state machine on device — decode, sweep segmentation,
correction, and the (sums, counts) intensity accumulators — as one jitted
step with donated state, so an unbounded byte stream is processed at device
speed with only the raw chunks crossing PCIe/ICI.

Exact-parity semantics (same invariants as the host ``StreamingSession``):

  * byte carry — by the >=11-byte start-spacing theorem (ops/decode.py),
    positions with a full 11-byte window are accepted or rejected
    definitively and interior positions of an accepted frame can never
    validate, so overlapping consecutive chunk windows by exactly 10 bytes
    loses no frame and double-counts none;
  * frame carry — a row's correction depends on every baseline in its sweep
    group, so the open (last) group's frames stay in a device carry buffer
    until a UE-decrease boundary closes them; closed groups run through
    ``correct_rows_jax`` and fold into the accumulators.  Per-cell means
    are sum/count, hence order-independent and equal to the offline pivot.
  * ``SceneConfig.log_transform`` is honored on this path (drop RSS<=0,
    fold ln RSS), matching pivot_data's pre-log (heatmap_gemini_v1-7.py:
    108-132).

The decode stage is selectable: the XLA formulation (default; HBM-bandwidth
bound and fastest at these shapes) or the Pallas double-buffered DMA kernel
(``decoder='pallas'``), wiring ops/pallas_decode.py into a production path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import numpy as np

from slam_process_tpu.config import PipelineConfig
from slam_process_tpu.ops.decode import decode_rows_jax, frame_capacity
from slam_process_tpu.ops.scene import IntensityGrid, intensity_sums_jax
from slam_process_tpu.utils import get_logger

_LOGGER = get_logger("slam_process_tpu.streaming_device")

CARRY_BYTES = 10   # frame_len - 1: the only positions without a verdict


class DeviceStreamState(NamedTuple):
    carry_frames: "np.ndarray"   # [Gcap, 5] i32 — open sweep group
    carry_count: "np.ndarray"    # scalar i32
    sums: "np.ndarray"           # [64, 64] f32 running intensity sums
    counts: "np.ndarray"         # [64, 64] f32 running cell counts
    n_frames: "np.ndarray"       # scalar i32
    n_kept: "np.ndarray"         # scalar i32
    n_groups: "np.ndarray"       # scalar i32 (closed groups)
    overflow: "np.ndarray"       # scalar bool (any static bound exceeded)
    emit_buf: "np.ndarray"       # [Ecap, 4] i32 device emit ring (ue,
    #                              corrected_bs, rss, clk); Ecap=0 when
    #                              collect_filtered is off
    emit_count: "np.ndarray"     # scalar i32 rows written to emit_buf
    emit_overflow: "np.ndarray"  # scalar bool: kept rows were dropped
    #                              because the emit ring filled — exported
    #                              `filtered` would be silently truncated,
    #                              so reading it raises instead


def _emit_kept_rows(state, combined, corrected, keep, ecap: int):
    """Append this step's kept rows to the device emit ring.

    Kept rows sort-compact to a dense prefix (the sort key is the row
    index where kept — unique and ascending, so stream order is exact),
    then ONE dynamic_update_slice block write lands them at emit_count: a
    data-dependent scatter of [t] rows measured ~45 ms across a dataset
    replay becomes an in-place contiguous write.  The ring is allocated
    with one block of slack (see DeviceStreamingSession), so the t-row
    block never clamps: junk rows past this step's kept count are
    overwritten by the next step's block (offsets advance by exactly
    kept), and the final `[:emit_count]` read never sees them.  Keeps the
    feed loop read-free: the ring drains ONCE when ``filtered`` is
    consumed (the relay transport's first-read degraded mode made
    per-chunk reads ~30x slower).

    Rows past the LOGICAL capacity ``ecap`` are dropped and flagged via
    overflow; ``emit_count`` saturates at ecap so later block writes land
    in the slack region only.
    """
    import jax
    import jax.numpy as jnp

    t = keep.shape[0]
    # Trace-time guard: the ring must hold one full t-row block past the
    # logical capacity, or dynamic_update_slice would clamp the start
    # backward near the end and silently corrupt previously-emitted rows
    # (the constructor sizes the slack from the decoder row count; this
    # assert turns any future drift into a loud error).
    assert state.emit_buf.shape[0] >= ecap + t, (
        state.emit_buf.shape, ecap, t)
    key = jnp.where(keep, jnp.arange(t, dtype=jnp.int32),
                    jnp.int32(1 << 30))
    _, s_ue, s_bs, s_rss, s_clk = jax.lax.sort(
        (key, combined[:, 1], corrected, combined[:, 3], combined[:, 4]),
        num_keys=1)
    block = jnp.stack([s_ue, s_bs, s_rss, s_clk], axis=1)
    total_kept = jnp.sum(keep.astype(jnp.int32))
    ring_overflow = state.emit_count + total_kept > ecap
    new_buf = jax.lax.dynamic_update_slice(
        state.emit_buf, block, (state.emit_count, jnp.int32(0)))
    new_count = jnp.minimum(state.emit_count + total_kept, ecap)
    return new_buf, new_count, ring_overflow


def _step_body(
    state: DeviceStreamState,
    chunk,                     # jnp [C] u8 (zero-padded past n_bytes)
    n_bytes,                   # jnp scalar i32
    *,
    cap: int,
    group_capacity: int,
    max_groups: int,
    max_baselines_per_group: int,
    cfg: PipelineConfig,
    decoder: str,
    emit_capacity: int,
):
    import jax
    import jax.numpy as jnp

    if decoder == "pallas":
        from slam_process_tpu.ops.pallas_decode import decode_frames_pallas

        # The Pallas kernel emits the densely packed layout; scatter it back
        # to a masked-row table so both decoders feed the same downstream.
        # Zero the padded tail first (the kernel has no n_valid mask);
        # zeroed bytes are provably un-decodable: a frame window touching
        # them fails its tag checks (every non-flag offset requires top
        # bits 1/2/3; zero has top bits 0) and a zero flag byte is neither
        # 0xCC nor 0x33 — but we do not rely on the caller's padding.
        chunk = jnp.where(jnp.arange(chunk.shape[0]) < n_bytes, chunk, 0)
        packed, n_new = decode_frames_pallas(
            chunk, capacity=cap, interpret=jax.default_backend() != "tpu"
        )
        r = -(-chunk.shape[0] // 11)
        dst = jnp.where(jnp.arange(cap) < n_new, jnp.arange(cap), r)
        new_rows = jnp.zeros((r, 5), jnp.int32).at[dst].set(packed, mode="drop")
        new_valid = jnp.zeros((r,), bool).at[dst].set(True, mode="drop")
        # NOTE: packs frames to the FIRST rows rather than their true block
        # positions — positional invariants still hold (stream order, one
        # frame per row), which is all the downstream uses.
    else:
        # Gather-free masked-row decode (ops/decode.decode_rows_jax); mask
        # to frames fully inside chunk[:n_bytes] so correctness on short/
        # padded pieces is explicit, not a property of the pad bytes.
        new_rows, new_valid, n_new = decode_rows_jax(chunk, cfg=cfg.decode,
                                                     n_valid=n_bytes)

    cc = state.carry_count
    gcap = group_capacity
    t = gcap + new_rows.shape[0]

    # Masked-row combine: dense carry prefix + the chunk's masked rows.
    # Static concatenation — no per-row gather.
    rows = jnp.arange(t, dtype=jnp.int32)
    combined = jnp.concatenate([state.carry_frames, new_rows])
    valid = jnp.concatenate(
        [jnp.arange(gcap, dtype=jnp.int32) < cc, new_valid]
    )

    # Sweep boundaries: a UE decrease vs the previous VALID row starts a
    # new group; the first valid row continues the carried-over open group
    # (has_prev is False there exactly when the carry is empty, i.e. start
    # of stream, where the reference also opens the first group).
    ue = combined[:, 1]

    def _kl(a, b):
        au, av = a
        bu, bv = b
        return jnp.where(bv, bu, au), av | bv

    s_ue, s_v = jax.lax.associative_scan(_kl, (ue, valid))
    prev_ue = jnp.concatenate([s_ue[:1] * 0, s_ue[:-1]])
    has_prev = jnp.concatenate([jnp.zeros((1,), bool), s_v[:-1]])
    boundary = valid & has_prev & (prev_ue > ue)
    closed = jnp.max(jnp.where(boundary, rows, 0))   # 0 when no boundary

    from slam_process_tpu.ops.correct import correct_rows_jax

    corrected, keep, c_overflow = correct_rows_jax(
        combined, valid & (rows < closed), max_groups=max_groups,
        max_baselines_per_group=max_baselines_per_group, cfg=cfg.correct,
    )

    d_sums, d_counts = intensity_sums_jax(
        combined[:, 1], corrected, combined[:, 3].astype(jnp.float32), keep,
        combined[:, 0], cfg.scene,
    )

    # New carry: the open group's valid rows in [closed, t), compacted into
    # the dense [gcap] buffer — the ONE gather left in the step, bounded by
    # gcap rows (not the chunk's frame capacity).
    open_mask = valid & (rows >= closed)
    n_carry = jnp.sum(open_mask.astype(jnp.int32))
    src = jnp.nonzero(open_mask, size=gcap, fill_value=t)[0]
    combined_pad = jnp.concatenate([combined, jnp.zeros((1, 5), jnp.int32)])
    new_carry = combined_pad[src]

    if emit_capacity:
        emit_buf, emit_count, ring_overflow = _emit_kept_rows(
            state, combined, corrected, keep, emit_capacity)
    else:
        emit_buf, emit_count, ring_overflow = (
            state.emit_buf, state.emit_count, False)

    return DeviceStreamState(
        carry_frames=new_carry.astype(jnp.int32),
        carry_count=jnp.minimum(n_carry, gcap),
        sums=state.sums + d_sums,
        counts=state.counts + d_counts,
        n_frames=state.n_frames + n_new,
        n_kept=state.n_kept + jnp.sum(keep.astype(jnp.int32)),
        n_groups=state.n_groups + jnp.sum(boundary.astype(jnp.int32)),
        overflow=state.overflow | c_overflow | (n_carry > gcap),
        emit_buf=emit_buf,
        emit_count=emit_count,
        emit_overflow=state.emit_overflow | ring_overflow,
    )


def _flush_body(
    state: DeviceStreamState,
    *,
    max_groups: int,
    max_baselines_per_group: int,
    cfg: PipelineConfig,
    emit_capacity: int,
):
    """Close the final open group at end of stream."""
    import jax.numpy as jnp

    from slam_process_tpu.ops.correct import correct_frames_jax

    corrected, keep, c_overflow = correct_frames_jax(
        state.carry_frames, state.carry_count, max_groups=max_groups,
        max_baselines_per_group=max_baselines_per_group, cfg=cfg.correct,
    )
    d_sums, d_counts = intensity_sums_jax(
        state.carry_frames[:, 1], corrected,
        state.carry_frames[:, 3].astype(jnp.float32), keep,
        state.carry_frames[:, 0], cfg.scene,
    )
    if emit_capacity:
        emit_buf, emit_count, ring_overflow = _emit_kept_rows(
            state, state.carry_frames, corrected, keep, emit_capacity)
    else:
        emit_buf, emit_count, ring_overflow = (
            state.emit_buf, state.emit_count, False)
    return DeviceStreamState(
        carry_frames=jnp.zeros_like(state.carry_frames),
        carry_count=jnp.zeros_like(state.carry_count),
        sums=state.sums + d_sums,
        counts=state.counts + d_counts,
        n_frames=state.n_frames,
        n_kept=state.n_kept + jnp.sum(keep.astype(jnp.int32)),
        n_groups=state.n_groups + (state.carry_count > 0).astype(jnp.int32),
        overflow=state.overflow | c_overflow,
        emit_buf=emit_buf,
        emit_count=emit_count,
        emit_overflow=state.emit_overflow | ring_overflow,
    )


@functools.lru_cache(maxsize=16)
def _build_step(cap, gcap, max_groups, max_bpg, cfg, decoder, emit_capacity):
    """Shared jitted step per static configuration (the config dataclasses
    are frozen/hashable), so many sessions reuse one compiled executable."""
    import jax

    from slam_process_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    return jax.jit(
        functools.partial(
            _step_body, cap=cap, group_capacity=gcap, max_groups=max_groups,
            max_baselines_per_group=max_bpg, cfg=cfg, decoder=decoder,
            emit_capacity=emit_capacity,
        ),
        donate_argnums=0,
    )


@functools.lru_cache(maxsize=16)
def _build_init(gcap: int, n_beams: int, emit_capacity: int):
    """One jitted call producing the zero state (vs separate allocs)."""
    import jax
    import jax.numpy as jnp

    def init():
        return DeviceStreamState(
            carry_frames=jnp.zeros((gcap, 5), jnp.int32),
            carry_count=jnp.int32(0),
            sums=jnp.zeros((n_beams, n_beams), jnp.float32),
            counts=jnp.zeros((n_beams, n_beams), jnp.float32),
            n_frames=jnp.int32(0),
            n_kept=jnp.int32(0),
            n_groups=jnp.int32(0),
            overflow=jnp.bool_(False),
            emit_buf=jnp.zeros((emit_capacity, 4), jnp.int32),
            emit_count=jnp.int32(0),
            emit_overflow=jnp.bool_(False),
        )

    from slam_process_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    return jax.jit(init)


@functools.lru_cache(maxsize=16)
def _build_flush(max_groups, max_bpg, cfg, emit_capacity):
    import jax

    return jax.jit(
        functools.partial(
            _flush_body, max_groups=max_groups,
            max_baselines_per_group=max_bpg, cfg=cfg,
            emit_capacity=emit_capacity,
        ),
        donate_argnums=0,
    )


class DeviceStreamingSession:
    """Unbounded-stream session with all state resident on device.

    ``feed`` enqueues one jitted step per ``chunk_bytes`` window with the
    state buffers donated (no reallocation, no host sync); scalars/grids
    transfer only when a result property is read.
    """

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        chunk_bytes: int = 1 << 20,
        group_capacity: int = 4096,
        max_groups: int = 64,
        max_baselines_per_group: int = 96,
        decoder: str = "xla",
        collect_filtered: bool = False,
        n_beams: int = 64,
        emit_capacity: int = 1 << 18,
    ):
        self.config = config or PipelineConfig()
        self.chunk_bytes = int(chunk_bytes)
        if self.chunk_bytes <= CARRY_BYTES:
            raise ValueError("chunk_bytes must exceed the 10-byte carry")
        self.collect_filtered = bool(collect_filtered)
        self._gcap = int(group_capacity)
        # Emit ring: kept rows accumulate on device and drain ONCE when
        # `filtered` is read (a per-chunk device_get would flip the relay
        # transport's degraded mode inside the feed loop).  The capacity
        # bounds the total rows an emit-mode replay can export; overflow is
        # flagged, not silently dropped.
        ecap = int(emit_capacity) if self.collect_filtered else 0
        self._ecap = ecap
        cap = frame_capacity(self.chunk_bytes, self.config.decode)

        # Donated state: accumulators update in place on device; the
        # compiled step is shared across sessions with the same config.
        self._step = _build_step(
            cap, self._gcap, max_groups, max_baselines_per_group,
            self.config, decoder, ecap,
        )
        self._flush = _build_flush(
            max_groups, max_baselines_per_group, self.config, ecap,
        )

        # Ring allocation = logical capacity + one block of slack
        # (gcap + chunk rows): the emit block write is a fixed t-row
        # dynamic_update_slice whose tail may exceed the logical capacity
        # with junk that later blocks overwrite (see _emit_kept_rows).
        ecap_alloc = ecap + self._gcap + (-(-self.chunk_bytes // 11)) if ecap else 0
        self._state = _build_init(self._gcap, n_beams, ecap_alloc)()
        self._byte_carry = np.zeros(0, dtype=np.uint8)
        self._finalized = False
        self._overflow_warned = False

    # -- ingest --------------------------------------------------------------

    def feed(self, chunk: Union[bytes, np.ndarray]) -> None:
        """Consume one chunk of tokenized bytes (any length)."""
        import jax.numpy as jnp

        if isinstance(chunk, (bytes, bytearray)):
            chunk = np.frombuffer(chunk, dtype=np.uint8)
        buf = np.concatenate(
            [self._byte_carry, np.asarray(chunk, dtype=np.uint8)]
        )
        n = len(buf)
        c = self.chunk_bytes
        off = 0
        # Consecutive windows overlap by 10 bytes: a frame straddling a
        # window edge is decoded exactly once in the window that holds its
        # full 11-byte span (see module docstring for why this is lossless).
        while n - off > CARRY_BYTES:
            piece = buf[off : off + c]
            m = len(piece)
            if m < c:
                piece = np.pad(piece, (0, c - m))
            self._state = self._step(self._state, jnp.asarray(piece),
                                     jnp.int32(m))
            off = min(off + c, n) - CARRY_BYTES
        self._byte_carry = buf[off:].copy()

    def finalize(self) -> None:
        """Flush the final open sweep group (end of stream).

        Deliberately performs no device read: the first D2H read of any
        buffer flips the relay transport into a degraded mode
        (docs/STATUS.md), so overflow is checked lazily when a result is
        consumed (``_check_overflow``), not here.
        """
        if self._finalized:
            return
        self._state = self._flush(self._state)
        self._byte_carry = np.zeros(0, dtype=np.uint8)
        self._finalized = True

    # -- results -------------------------------------------------------------

    def _check_overflow(self) -> None:
        """Warn loudly (once) when any static bound was exceeded.

        Called from every result consumer: an overflowed run has silently
        dropped or mis-corrected rows, so counts/grids are lower bounds.
        Unlike the batched Session path there is no host fallback here —
        the bytes are gone — so the fix is to rebuild the session with
        larger group_capacity / max_groups / max_baselines_per_group.
        """
        if self._overflow_warned or not bool(self._state.overflow):
            return
        self._overflow_warned = True
        import warnings

        msg = ("DeviceStreamingSession capacity exceeded (group_capacity/"
               "max_groups/max_baselines_per_group): results are incomplete;"
               " rebuild with larger bounds")
        warnings.warn(msg, RuntimeWarning, stacklevel=3)
        _LOGGER.warning(msg)

    @property
    def n_frames(self) -> int:
        self._check_overflow()
        return int(self._state.n_frames)

    @property
    def n_kept(self) -> int:
        self._check_overflow()
        return int(self._state.n_kept)

    @property
    def n_groups(self) -> int:
        self._check_overflow()
        return int(self._state.n_groups)

    @property
    def overflow(self) -> bool:
        return bool(self._state.overflow)

    @property
    def filtered(self) -> np.ndarray:
        """Corrected rows [N, 4] (ue, corrected_bs, rss, clk), stream order.

        Drains the device emit ring in one transfer; repeat reads of the
        same finalized state are free on the relay transport.
        """
        import jax

        if not self.collect_filtered:
            raise ValueError("built with collect_filtered=False")
        self._check_overflow()
        if bool(self._state.emit_overflow):
            raise RuntimeError(
                f"emit ring overflowed: the stream kept {self.n_kept} rows "
                f"but emit_capacity is {self._ecap}; the "
                "exported table would be silently truncated — rebuild the "
                "session with a larger emit_capacity (counts/grids remain "
                "exact)")
        buf, count = jax.device_get((self._state.emit_buf,
                                     self._state.emit_count))
        return buf[: int(count)].astype(np.int64)

    def intensity(self) -> IntensityGrid:
        import jax

        from slam_process_tpu.ops.scene import grid_from_sums_np

        self._check_overflow()

        sums, counts = jax.device_get((self._state.sums, self._state.counts))
        return grid_from_sums_np(sums.astype(np.float64),
                                 counts.astype(np.int64))

    def render(self, angle_lut: np.ndarray, render_cfg=None):
        from slam_process_tpu.config import RenderConfig, SceneConfig
        from slam_process_tpu.render.heatmap import render_intensity

        return render_intensity(
            self.intensity(), angle_lut,
            SceneConfig(keep_nan=True, fill_with_min=False),
            render_cfg or RenderConfig(),
        )

    def block_until_ready(self):
        import jax

        jax.block_until_ready(self._state.sums)
        return self


def replay_log_device(
    raw: np.ndarray,
    chunk_bytes: int = 1 << 20,
    config: Optional[PipelineConfig] = None,
    **kwargs,
) -> DeviceStreamingSession:
    """Replay one tokenized log through the device streaming pipeline."""
    s = DeviceStreamingSession(config, chunk_bytes=chunk_bytes, **kwargs)
    for off in range(0, len(raw), chunk_bytes):
        s.feed(raw[off : off + chunk_bytes])
    s.finalize()
    return s
