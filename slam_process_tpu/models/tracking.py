"""CLK-anchored multipath tracking across sweeps — the ToA axis.

The reference aggregates the 30-bit CLK counter "for future ToA use" and
never uses it (heatmap_gemini_v2.py:35-38).  This module closes that loop:
``Session.sweep_paths`` gives a time-resolved multipath estimate per UE
sweep and ``Session.sweep_times`` anchors each sweep on the testbed clock;
here the per-sweep paths associate into TRACKS — persistent paths whose
(AoA, AoD) trajectory is a function of CLK time — and each track gets an
angular-velocity estimate (deg per CLK tick) by masked least squares.

Association is greedy global-nearest-neighbour in angle space, one sweep
at a time in CLK order:

  * a track's position is its last observed (AoA, AoD);
  * per sweep, (track, path) pairs assign in ascending squared-distance
    order, gated at ``gate_deg`` (Euclidean angle distance);
  * unassigned valid paths open new tracks while capacity remains;
  * unmatched tracks coast (position held, no observation recorded).

Two equal implementations ship: ``track_paths_np`` (float64-free, f32
cost arithmetic so verdicts match the device path bit-for-bit) and
``track_paths_jax`` (a ``lax.scan`` over sweeps with a fixed-iteration
assignment loop — jittable, vmappable over sessions).  Shapes are tiny
(S<=64 sweeps, K<=20 paths, T<=16 tracks), so either engine is
microseconds; the device path exists so dataset-scale tracking can fuse
into the sweep-estimation program without a host round trip.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

__all__ = [
    "Tracks",
    "track_paths_np",
    "track_sweep_step_np",
    "track_paths_jax",
    "track_velocities",
]


class Tracks(NamedTuple):
    """Associated path tracks over S sweeps (T static track slots).

    ``pos_aoa/pos_aod[t, s]`` hold track t's position AT sweep s (last
    observed position while coasting); ``observed[t, s]`` marks sweeps
    where the track matched a path (only those carry measurements);
    ``power[t, s]`` is the matched path's power (0 while coasting);
    ``created[t]`` marks live track slots.
    """

    pos_aoa: np.ndarray    # [T, S] f32
    pos_aod: np.ndarray    # [T, S] f32
    power: np.ndarray      # [T, S] f32
    observed: np.ndarray   # [T, S] bool
    created: np.ndarray    # [T] bool
    n_tracks: int          # scalar


def track_paths_np(
    aoa: np.ndarray,      # [S, K] per-sweep path AoA (deg)
    aod: np.ndarray,      # [S, K]
    power: np.ndarray,    # [S, K]
    valid: np.ndarray,    # [S, K] bool
    max_tracks: int = 8,
    gate_deg: float = 10.0,
) -> Tracks:
    """Host oracle for the greedy global-NN association (f32 arithmetic)."""
    aoa = np.asarray(aoa, np.float32)
    aod = np.asarray(aod, np.float32)
    power = np.asarray(power, np.float32)
    valid = np.asarray(valid, bool)
    s_n, k_n = aoa.shape
    t_n = int(max_tracks)
    gate2 = np.float32(gate_deg) * np.float32(gate_deg)

    pos = np.zeros((t_n, 2), np.float32)
    created = np.zeros(t_n, bool)
    count = 0
    o_aoa = np.zeros((t_n, s_n), np.float32)
    o_aod = np.zeros((t_n, s_n), np.float32)
    o_pow = np.zeros((t_n, s_n), np.float32)
    o_obs = np.zeros((t_n, s_n), bool)

    for s in range(s_n):
        count, o_aoa[:, s], o_aod[:, s], o_pow[:, s], o_obs[:, s] = \
            track_sweep_step_np(pos, created, count, aoa[s], aod[s],
                                power[s], valid[s], gate2)

    return Tracks(o_aoa, o_aod, o_pow, o_obs, created, count)


def track_sweep_step_np(
    pos: np.ndarray,       # [T, 2] f32 — mutated in place
    created: np.ndarray,   # [T] bool — mutated in place
    count: int,
    aoa_s: np.ndarray,     # [K] f32 — this sweep's path AoA
    aod_s: np.ndarray,     # [K] f32
    power_s: np.ndarray,   # [K] f32
    valid_s: np.ndarray,   # [K] bool
    gate2: np.float32,
) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One sweep of the greedy global-NN association.

    The single shared step behind ``track_paths_np`` AND the live-feed
    incremental tracker (``StreamingSession.track_columns``), so
    streamed track columns equal the batch output by construction.
    Mutates ``pos``/``created`` in place; returns ``(count, col_aoa,
    col_aod, col_pow, col_obs)`` — the updated track count and this
    sweep's [T] output column (positions carry the coasting hold).
    """
    t_n = pos.shape[0]
    k_n = len(aoa_s)
    assigned = np.zeros(t_n, bool)
    used = np.zeros(k_n, bool)
    col_pow = np.zeros(t_n, np.float32)
    col_obs = np.zeros(t_n, bool)
    for _ in range(k_n):
        da = pos[:, 0:1] - aoa_s[None, :]
        dd = pos[:, 1:2] - aod_s[None, :]
        cost = (da * da + dd * dd).astype(np.float32)
        mask = (created & ~assigned)[:, None] & (valid_s & ~used)[None, :]
        cost = np.where(mask, cost, np.float32(np.inf))
        flat = int(np.argmin(cost))
        t, k = divmod(flat, k_n)
        if not (cost[t, k] <= gate2):
            break
        assigned[t] = True
        used[k] = True
        pos[t] = (aoa_s[k], aod_s[k])
        col_obs[t] = True
        col_pow[t] = power_s[k]
    # New tracks for leftover valid paths, in path order.
    for k in range(k_n):
        if valid_s[k] and not used[k] and count < t_n:
            pos[count] = (aoa_s[k], aod_s[k])
            created[count] = True
            col_obs[count] = True
            col_pow[count] = power_s[k]
            count += 1
    return count, pos[:, 0].copy(), pos[:, 1].copy(), col_pow, col_obs


def track_paths_jax(
    aoa,                  # jnp [S, K]
    aod,                  # jnp [S, K]
    power,                # jnp [S, K]
    valid,                # jnp [S, K] bool
    max_tracks: int = 8,
    gate_deg: float = 10.0,
):
    """Jittable association: ``lax.scan`` over sweeps, fixed K-iteration
    greedy assignment per step.  Bit-identical to ``track_paths_np``
    (same f32 cost arithmetic, same argmin tie order)."""
    import jax
    import jax.numpy as jnp

    aoa = jnp.asarray(aoa, jnp.float32)
    aod = jnp.asarray(aod, jnp.float32)
    power = jnp.asarray(power, jnp.float32)
    valid = jnp.asarray(valid, bool)
    s_n, k_n = aoa.shape
    t_n = int(max_tracks)

    sweep_step = make_track_sweep_step(k_n, t_n, gate_deg)
    carry0 = (jnp.zeros((t_n, 2), jnp.float32), jnp.zeros(t_n, bool),
              jnp.int32(0))
    (_, created, count), ys = jax.lax.scan(
        sweep_step, carry0, (aoa, aod, power, valid))
    y_aoa, y_aod, y_pow, y_obs = ys
    return Tracks(y_aoa.T, y_aod.T, y_pow.T, y_obs.T, created, count)


def make_track_sweep_step(k_n: int, t_n: int, gate_deg: float):
    """The one-sweep association step as a ``lax.scan`` body.

    carry = (pos [T, 2] f32, created [T] bool, count i32); input =
    (aoa [K], aod [K], power [K], valid [K]); output per sweep =
    (pos_aoa [T], pos_aod [T], power [T], observed [T]).  Exposed so the
    streaming path can hold the carry in device state and fold closed
    sweeps incrementally — the SAME float ops in the SAME order as the
    offline scan, so incremental == offline exactly.  An all-invalid
    input sweep is a no-op on the carry (gating can never pass, no
    leftover paths), which the streaming step uses to pad its per-step
    sweep block.
    """
    import jax
    import jax.numpy as jnp

    gate2 = jnp.float32(gate_deg) * jnp.float32(gate_deg)

    def sweep_step(carry, inp):
        pos, created, count = carry
        p_aoa, p_aod, p_pow, p_valid = inp

        def assign_body(_, st):
            pos, assigned, used, obs, opow = st
            da = pos[:, 0:1] - p_aoa[None, :]
            dd = pos[:, 1:2] - p_aod[None, :]
            cost = da * da + dd * dd
            mask = ((created & ~assigned)[:, None]
                    & (p_valid & ~used)[None, :])
            cost = jnp.where(mask, cost, jnp.inf)
            flat = jnp.argmin(cost.ravel())
            t, k = flat // k_n, flat % k_n
            ok = cost.ravel()[flat] <= gate2
            assigned = assigned.at[t].set(assigned[t] | ok)
            used = used.at[k].set(used[k] | ok)
            obs = obs.at[t].set(obs[t] | ok)
            new_pt = jnp.stack([p_aoa[k], p_aod[k]])
            pos = pos.at[t].set(jnp.where(ok, new_pt, pos[t]))
            opow = opow.at[t].set(jnp.where(ok, p_pow[k], opow[t]))
            return pos, assigned, used, obs, opow

        st0 = (pos, jnp.zeros(t_n, bool), jnp.zeros(k_n, bool),
               jnp.zeros(t_n, bool), jnp.zeros(t_n, jnp.float32))
        pos, assigned, used, obs, opow = jax.lax.fori_loop(
            0, k_n, assign_body, st0)

        # New tracks for leftover valid paths (path order == rank order).
        leftover = p_valid & ~used
        rank = jnp.cumsum(leftover.astype(jnp.int32)) - 1
        slot = count + rank
        create = leftover & (slot < t_n)
        dst = jnp.where(create, slot, t_n)
        pts = jnp.stack([p_aoa, p_aod], axis=1)
        pos = pos.at[dst].set(pts, mode="drop")
        created = created.at[dst].set(True, mode="drop")
        obs = obs.at[dst].set(True, mode="drop")
        opow = opow.at[dst].set(p_pow, mode="drop")
        count = count + jnp.sum(create.astype(jnp.int32))

        y = (pos[:, 0], pos[:, 1], opow, obs)
        return (pos, created, count), y

    return sweep_step


def track_velocities(
    tracks: Tracks,
    times: np.ndarray,       # [S] CLK per sweep (-1 for missing)
    ticks_per_second: float = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-track angular velocity by masked least squares on the CLK axis.

    Returns (vel_aoa[T], vel_aod[T], ok[T]): slopes in deg per CLK tick
    (or deg/s when ``ticks_per_second`` is given), fit over each track's
    observed sweeps; ``ok`` is False for tracks with <2 observations or a
    degenerate time axis (identical CLK values).
    """
    times = np.asarray(times, np.float64)
    obs = np.asarray(tracks.observed, bool) & (times >= 0)[None, :]
    w = obs.astype(np.float64)
    n = w.sum(axis=1)
    safe_n = np.maximum(n, 1.0)
    tm = (w * times[None, :]).sum(axis=1) / safe_n
    dt = np.where(obs, times[None, :] - tm[:, None], 0.0)
    var_t = (dt * dt).sum(axis=1)
    ok = (n >= 2) & (var_t > 0)
    safe_var = np.where(var_t > 0, var_t, 1.0)

    def slope(y):
        y = np.asarray(y, np.float64)
        ym = (w * y).sum(axis=1) / safe_n
        dy = np.where(obs, y - ym[:, None], 0.0)
        return (dt * dy).sum(axis=1) / safe_var

    scale = float(ticks_per_second) if ticks_per_second else 1.0
    vel_aoa = np.where(ok, slope(tracks.pos_aoa) * scale, 0.0)
    vel_aod = np.where(ok, slope(tracks.pos_aod) * scale, 0.0)
    return vel_aoa, vel_aod, ok
