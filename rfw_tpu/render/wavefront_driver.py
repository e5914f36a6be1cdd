"""Compacted wavefront driver: per-depth whole-frame stages with lane
compaction between depths.

The reference's wavefront loop compacts its ray queues with atomic
counters between bounces (CUDART Kernels.cu:640,747,788 extensionRays /
shadowRays + InitCounters per depth) so later bounces only pay for live
paths. Round 1 ran whole paths per chunk with dead lanes masked: at depth
1 ~45% of lanes are dead, at depth 2 ~72% (STATUS.md) — every intersect /
sort / shade op still paid them. This driver is the TPU-native
re-expression:

* stages run per DEPTH over the whole frame, chunked at the engine chunk
  size (static shapes — one compiled stage per depth);
* between depths the per-lane ``PathState`` packs into one (N, 20) f32
  matrix and sorts by (dead, direction octant, origin Morton): ONE row
  gather instead of nine (TPU gather cost is per-op — see
  render/scene_data.build_tri_pack), live lanes first and coherence-
  ordered for the intersector (whose own per-launch sort is then skipped);
* the live count reads back per depth (4 bytes) and the host runs only
  ``ceil(live / chunk)`` chunks of the next depth;
* after the last depth one sort by pixel id restores row-major order.

Bitwise identity: every random draw is keyed by pixel id (+ sample,
depth), so lane permutation does not change any pixel's arithmetic — with
a deterministic intersector the compacted frame equals the fused
``trace_sample`` frame exactly (tests/test_wavefront_driver.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..ops.compaction import ray_sort_keys
from ..utils import Timer
from .integrator import (Intersector, PathState, _tile_permutation,
                         depth_stage, make_path_state)


def _pack_state(state: PathState):
    """PathState → (N, 18) f32 matrix (ints/bools bitcast/encoded) for a
    single-row-gather permutation. Column order puts the fields a DEAD
    lane still owes the frame (radiance, flags, pid) LAST, so the
    compaction can gather dead tail rows at 5 columns instead of 18
    (_TAIL_COL; live-path fields of dead lanes are never read again)."""
    f = jnp.float32
    flags = (state.alive.astype(f) + 2.0 * state.spec_bounce.astype(f))
    pid_f = jax.lax.bitcast_convert_type(state.pid, f)
    cols = [state.origin, state.direction, state.throughput,
            state.last_n, state.last_pdf[:, None],
            state.radiance, flags[:, None], pid_f[:, None]]
    return jnp.concatenate(cols, axis=1)          # (N, 18) → pad-free


_TAIL_COL = 13   # radiance(13:16), flags(16), pid(17)


def _unpack_state(m) -> PathState:
    flags = m[:, 16]
    return PathState(
        origin=m[:, 0:3], direction=m[:, 3:6], throughput=m[:, 6:9],
        radiance=m[:, 13:16], last_n=m[:, 9:12], last_pdf=m[:, 12],
        spec_bounce=flags >= 2.0,
        alive=jnp.mod(flags, 2.0) >= 1.0,
        pid=jax.lax.bitcast_convert_type(m[:, 17], jnp.uint32))


class WavefrontDriver:
    """Builds and caches the jitted per-depth stages + compaction for one
    (width, height, config, intersector) combination."""

    def __init__(self, width: int, height: int, config: RenderConfig,
                 intersector: Intersector, tex_flags, chunk: int):
        self.width = width
        self.height = height
        self.config = config
        self.chunk = chunk
        n = width * height
        self.n = n
        tp = _tile_permutation(width, n)
        if tp is not None:
            perm_np, inv_np = tp
            self._pid_np = perm_np.astype(np.uint32)
            self._inv_np = inv_np
        else:
            self._pid_np = np.arange(n, dtype=np.uint32)
            self._inv_np = None
        pid = jnp.asarray(self._pid_np)

        @jax.jit
        def init_fn(scene, view, sample_index):
            return make_path_state(scene, view, width, height,
                                   sample_index, config, pid)

        @jax.jit
        def stage0_fn(scene, view, pid_slice, sample_index, probe_lane):
            # ray-gen fused into the depth-0 stage: the whole-frame
            # PathState never materializes in HBM before the first
            # intersect (one init dispatch + a state write+read saved)
            state = make_path_state(scene, view, width, height,
                                    sample_index, config, pid_slice)
            return depth_stage(scene, view, state, width, 0,
                               sample_index, probe_lane, config,
                               intersector, tex_flags=tex_flags,
                               sort_rays=False, height=height)

        @functools.partial(jax.jit, static_argnames=("depth",))
        def stage_fn(scene, view, state, sample_index, probe_lane, depth):
            # closest-hit streams arrive pre-sorted: depth 0 in pixel-tile
            # order, bounces in compaction (dead, octant, Morton) order
            return depth_stage(scene, view, state, width, depth,
                               sample_index, probe_lane, config,
                               intersector, tex_flags=tex_flags,
                               sort_rays=False, height=height)

        @jax.jit
        def compact_keys_fn(scene, state):
            tl = scene["treelets"]
            lo = tl["scene_lo"] if "scene_lo" in tl else \
                tl["bmin"].min(axis=0)
            hi = tl["scene_hi"] if "scene_hi" in tl else \
                tl["bmax"].max(axis=0)
            keys = ray_sort_keys(state.origin, state.direction, lo, hi)
            keys = keys + jnp.where(state.alive, jnp.uint32(0),
                                    jnp.uint32(1) << 28)
            order = jnp.argsort(keys).astype(jnp.int32)
            return order, jnp.sum(state.alive)

        @functools.partial(jax.jit, static_argnames=("m",))
        def compact_apply_fn(state, order, m):
            # live lanes sort first; only rows [:m] enter the next
            # depth's chunks, so the permutation gathers full rows for
            # them and just the radiance/flags/pid tail columns for the
            # dead remainder (gather cost is per-op AND per-byte)
            full = _pack_state(state)
            front = full[order[:m]]
            if m < full.shape[0]:
                tail_cols = full[:, _TAIL_COL:][order[m:]]
                tail = jnp.concatenate(
                    [jnp.zeros((tail_cols.shape[0], _TAIL_COL),
                               jnp.float32), tail_cols], axis=1)
                full = jnp.concatenate([front, tail], axis=0)
            else:
                full = front
            return _unpack_state(full)

        @jax.jit
        def compact_sort_fn(scene, state):
            # sort-carry compaction: ONE stable multi-operand lax.sort
            # permutes the packed state in-sort instead of argsort + row
            # gather (row gathers are per-row-descriptor-bound on TPU;
            # merge sort streams). Stable sort == argsort order, so the
            # two paths are bitwise-identical. Gated by
            # config.compact_via_sort pending the on-chip A/B
            # (tools/compact_ab.py).
            tl = scene["treelets"]
            lo = tl["scene_lo"] if "scene_lo" in tl else \
                tl["bmin"].min(axis=0)
            hi = tl["scene_hi"] if "scene_hi" in tl else \
                tl["bmax"].max(axis=0)
            keys = ray_sort_keys(state.origin, state.direction, lo, hi)
            keys = keys + jnp.where(state.alive, jnp.uint32(0),
                                    jnp.uint32(1) << 28)
            # lane iota as a second key: the sort order is exactly the
            # stable argsort order, so ties permute identically to the
            # gather path (guaranteed bitwise-equal frames)
            lane = jnp.arange(keys.shape[0], dtype=jnp.uint32)
            full = _pack_state(state)
            ops = jax.lax.sort(
                (keys, lane) + tuple(full[:, i]
                                     for i in range(full.shape[1])),
                dimension=0, num_keys=2)
            return (_unpack_state(jnp.stack(ops[2:], axis=1)),
                    jnp.sum(state.alive))

        @jax.jit
        def compact_fn(scene, state):
            order, live = compact_keys_fn(scene, state)
            return compact_apply_fn(state, order, m=int(state.pid.shape[0])
                                    ), live

        @jax.jit
        def finalize_fn(state):
            order = jnp.argsort(state.pid).astype(jnp.int32)
            return state.radiance[order]

        self._m_pred: dict[int, int] = {}
        self._chunks_pred: dict[int, int] = {}
        self._compact_sort = compact_sort_fn
        self._init = init_fn
        self._stage0 = stage0_fn
        self._stage = stage_fn
        self._compact = compact_fn
        self._compact_keys = compact_keys_fn
        self._compact_apply = compact_apply_fn
        self._finalize = finalize_fn
        self.depth_times: list[float] = []

    def _slice(self, state: PathState, c: int) -> PathState:
        s, e = c * self.chunk, (c + 1) * self.chunk
        return jax.tree.map(lambda a: a[s:e], state)

    def step(self, scene, accumulator, view, sample_index, probe_index):
        """One sample for the whole frame. Matches the fused step's
        contract: returns (accumulator, probe, stats, aux)."""
        cfg = self.config
        n, chunk = self.n, self.chunk
        probe_i = int(probe_index)
        probe_lane = (probe_i if self._inv_np is None
                      else int(self._inv_np[probe_i]))
        state = None   # built by the fused ray-gen + depth-0 stage
        pid_dev = jnp.asarray(self._pid_np)
        live = n
        stats: dict = {}
        probe = None
        aux_parts = []
        self.depth_times = []
        timer = Timer()
        for depth in range(cfg.max_path_length + 1):
            parts = []

            def run_chunk(c, depth=depth, parts=parts):
                rel = probe_lane - c * chunk
                in_chunk = depth == 0 and 0 <= rel < chunk
                if depth == 0:
                    out, st, probe_c, aux_c = self._stage0(
                        scene, view, pid_dev[c * chunk:(c + 1) * chunk],
                        sample_index, jnp.int32(rel if in_chunk else 0))
                else:
                    sl = self._slice(state, c)
                    out, st, probe_c, aux_c = self._stage(
                        scene, view, sl, sample_index,
                        jnp.int32(rel if in_chunk else 0), depth)
                parts.append(out)
                for k, v in st.items():
                    key = f"{k}_{depth}"
                    stats[key] = stats.get(key, 0) + v
                if in_chunk:
                    nonlocal probe
                    probe = probe_c
                if depth == 0:
                    aux_parts.append(aux_c)

            if depth == 0 or n <= chunk:
                n_chunks = max(1, -(-live // chunk))
                for c in range(n_chunks):
                    run_chunk(c)
            else:
                # dispatch the PREDICTED chunk count first (live counts
                # are stable across samples), THEN sync the live count
                # the compaction produced — the readback RTT overlaps
                # the stage dispatches instead of stalling them. Extra
                # (over-predicted) chunks only touch dead lanes: every
                # radiance/state update is alive-gated and the final
                # image is keyed by pid, so results are bitwise-equal.
                n_pred = min(self._chunks_pred.get(depth,
                                                   max(1, -(-n // chunk))),
                             max(1, -(-n // chunk)))
                for c in range(n_pred):
                    run_chunk(c)
                live = int(live_dev)
                need = max(1, -(-live // chunk))
                self._chunks_pred[depth] = need
                for c in range(n_pred, need):   # under-predicted: top up
                    run_chunk(c)
                n_chunks = max(n_pred, need)
            if state is None:   # depth 0: chunks cover the whole frame
                state = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs), *parts)
            else:
                tail = jax.tree.map(lambda a: a[n_chunks * chunk:], state)
                state = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs), *parts, tail)
            if depth < cfg.max_path_length and cfg.compact_via_sort:
                state, live_dev = self._compact_sort(scene, state)
            elif depth < cfg.max_path_length:
                order, live_dev = self._compact_keys(scene, state)
                # dispatch the gather IMMEDIATELY with a PREDICTED row
                # count (live counts are stable across samples) — syncing
                # on the live readback first leaves the device idle for a
                # dispatch round trip per depth (measured ~90 ms/sample
                # on the remote tunnel). If the prediction was too small
                # (live grew — rare), redo with the exact count.
                m_pred = self._m_pred.get(depth, n)
                new_state = self._compact_apply(state, order, m=m_pred)
                if n > chunk:
                    # the live count only picks the next depth's chunk
                    # count — single-chunk frames skip the readback (a
                    # device→host sync per depth dominates small
                    # interactive frames)
                    live = int(live_dev)
                m = min(max(1, -(-live // chunk)) * chunk, n)
                self._m_pred[depth] = m
                if m > m_pred:   # under-predicted: live rows were tailed
                    new_state = self._compact_apply(state, order, m=m)
                state = new_state
            self.depth_times.append(timer.elapsed())
            timer = Timer()
            # (no early all-dead break: the live count is now synced
            # AFTER the next depth's predicted chunks dispatch, and a
            # fully-dead depth costs one alive-gated no-op chunk — rarer
            # and cheaper than stalling every sample on the readback)
        radiance = self._finalize(state)
        accumulator = accumulator + radiance
        aux = jax.tree.map(lambda *xs: jnp.concatenate(xs), *aux_parts)
        if self._inv_np is not None:
            inv = jnp.asarray(self._inv_np)
            aux = {k: v[inv] for k, v in aux.items()}
        return accumulator, probe, stats, aux
