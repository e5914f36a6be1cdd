"""Driver benchmark: ray throughput of the flagship engine on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Target (BASELINE.json north star): >100 Mrays/sec/chip, Sponza-class scene
at 1080p. The bundled sponza.obj is absent from the reference checkout (only
.mtl + textures), so the Sponza-class stand-in is the pica scene (76k tris)
instanced 2x2 → ~305k triangles, matching Sponza's geometric complexity.
(fireplace_room — VERDICT r1's suggested alternative — is likewise .mtl +
textures only in this checkout; of the bundled interiors only pica has
geometry. pica's 36 textured materials exercise the atlas/mip path.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

BASELINE_MRAYS = 100.0
PICA = "/root/reference/assets/models/pica/scene.gltf"


def build_scene(rs):
    import rfw_tpu  # noqa: F401
    if os.path.exists(PICA):
        ref = rs.add_object(PICA)
        obj = ref.object
        verts = np.concatenate(
            [m.triangles().vertices.reshape(-1, 3) for m in obj.meshes])
        lo, hi = verts.min(0), verts.max(0)
        ext = hi - lo
        # 2x2 grid of instances → Sponza-class triangle count
        for ix in range(2):
            for iz in range(2):
                rs.add_instance(ref, translation=(
                    ix * ext[0] * 1.05, 0.0, iz * ext[2] * 1.05))
        center = 0.5 * (lo + hi) + np.array(
            [0.5 * ext[0], 0.0, 0.5 * ext[2]])
        eye = center + np.array([0.9, 0.7, 1.4]) * ext
    else:  # fall back to a procedural scene
        m = rs.add_material([0.7, 0.7, 0.7])
        g = rs.add_quad([0, 1, 0], [0, 0, 0], 20, 20, m)
        rs.add_instance(g)
        center, eye = np.zeros(3), np.array([0, 8.0, -12.0])
    lamp = rs.add_material([40.0, 40.0, 40.0])
    gl = rs.add_quad([0, -1, 0], center + np.array([0, 18.0, 0]), 6, 6, lamp)
    rs.add_instance(gl)
    rs.set_skybox(__import__("rfw_tpu.scene", fromlist=["Skybox"])
                  .Skybox.test_sky())
    rs.camera.look_at(eye, center)
    return rs


def _wait_for_chip() -> None:
    """The axon pool claim can be transiently unavailable (claims hang
    ~25 min, then raise UNAVAILABLE — observed during round 2). Probe in
    SUBPROCESSES (a failed in-process init is cached by jax) and only
    proceed once a claim succeeds, so a pool blip doesn't cost the
    round's benchmark. Bounded by RFW_BENCH_CLAIM_RETRIES (default 3)."""
    import subprocess
    retries = int(os.environ.get("RFW_BENCH_CLAIM_RETRIES", "3"))
    probe = ("import jax; assert jax.devices()[0].platform != 'cpu'; "
             "print('ok')")
    for attempt in range(retries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=1900, text=True)
            if out.returncode == 0 and "ok" in out.stdout:
                if attempt:
                    print(f"# TPU claim recovered on probe {attempt + 1}",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"# TPU claim probe {attempt + 1}/{retries} failed; "
              "retrying", file=sys.stderr)
        time.sleep(30)
    # fall through: let the real init raise its own error


def _cache_state() -> dict:
    """Record client-cache state BEFORE jax init so run-to-run throughput
    discrepancies (VERDICT r4: 2.26 vs 2.44 Mrays/s across runs of the
    same code) are attributable in the artifact itself: a cold jax
    persistent cache re-pays XLA compiles; a cold scene cache re-pays
    texture/geometry builds + the full upload."""
    home = os.path.expanduser("~")
    jc = os.path.join(home, ".cache", "rfw_tpu", "jax_cache")
    sc = os.path.join(home, ".cache", "rfw_tpu")
    try:
        n_jax = len(os.listdir(jc)) if os.path.isdir(jc) else 0
    except OSError:
        n_jax = 0
    try:
        # count only files OUTSIDE the jax cache subtree (a recursive
        # walk minus the jax top-level entry count miscounts whenever
        # the jax cache nests directories)
        n_scene = sum(
            len(fs) for root, _, fs in os.walk(sc)
            if not root.startswith(jc))
    except OSError:
        n_scene = 0
    return {"jax_cache": "warm" if n_jax > 0 else "cold",
            "jax_cache_entries": n_jax,
            "scene_cache": "warm" if n_scene > 0 else "cold"}


def main() -> None:
    cache_state = _cache_state()
    t_setup = time.time()
    _wait_for_chip()
    from rfw_tpu.config import RenderConfig
    from rfw_tpu.system import RenderSystem
    from rfw_tpu.render import RenderStatus

    engine = os.environ.get("RFW_BENCH_ENGINE", "wavefront")
    width, height = 1920, 1080
    # per-stage times are diagnostic-only and cost a SECOND compiled
    # program set (each pays a terminal-side compile at first run on the
    # axon transport) — opt in with RFW_BENCH_PROFILE=1
    config = RenderConfig(
        profile_stages=bool(os.environ.get("RFW_BENCH_PROFILE")))
    rs = RenderSystem(engine, config)
    t_scene0 = time.time()
    build_scene(rs)
    rs.camera.resize(width, height)
    rs.camera.fov = 60.0
    rs.synchronize()
    t_scene = time.time() - t_scene0

    # warmup: compile + first samples (samples=2 so the profiled step —
    # when enabled — also compiles here rather than in the timed run)
    rs.render_frame(samples=2)
    setup_s = time.time() - t_setup
    print(f"# setup+compile {setup_s:.1f}s (scene load+build+upload "
          f"{t_scene:.1f}s)", file=sys.stderr)

    # timed region: ≥2 independent CONVERGE windows; the headline is the
    # MEDIAN window (single-window runs could not distinguish a 6%
    # regression from tunnel-RTT/cache noise — VERDICT r4 #3)
    samples = int(os.environ.get("RFW_BENCH_SAMPLES", "4"))
    n_windows = max(2, int(os.environ.get("RFW_BENCH_WINDOWS", "3")))
    window_ms = []
    t_dispatch = 0.0
    for _ in range(n_windows):
        t0 = time.time()
        rs.render_frame_async(status=RenderStatus.CONVERGE, samples=samples)
        t_dispatch = time.time() - t0
        rs.finish_frame()
        window_ms.append((time.time() - t0) * 1000.0)
    window_ms_sample = sorted(w / samples for w in window_ms)
    med = window_ms_sample[len(window_ms_sample) // 2] \
        if n_windows % 2 else 0.5 * (window_ms_sample[n_windows // 2 - 1]
                                     + window_ms_sample[n_windows // 2])
    spread = window_ms_sample[-1] - window_ms_sample[0]
    elapsed = med * samples / 1000.0
    print(f"# dispatch {t_dispatch*1000:.0f} ms, per-sample windows "
          f"{[round(w) for w in window_ms_sample]} ms (median {med:.0f}, "
          f"spread {spread:.0f})", file=sys.stderr)

    stats = rs.get_render_stats()
    rays_per_sample = (stats.primary_count + stats.secondary_count
                       + stats.deep_count + stats.shadow_count)
    total_rays = rays_per_sample * samples
    mrays = total_rays / elapsed / 1e6
    print(f"# {med:.0f} ms/sample | rays/sample: "
          f"primary {stats.primary_count/1e6:.2f}M secondary "
          f"{stats.secondary_count/1e6:.2f}M deep {stats.deep_count/1e6:.2f}M "
          f"shadow {stats.shadow_count/1e6:.2f}M", file=sys.stderr)

    # warm-session TTFP: a SECOND RenderSystem in the same process —
    # what a new scene/session costs once the process + program caches
    # are hot (scene build + synchronize + first 1-spp frame; the
    # compiled 1080p programs are reused, so this isolates the
    # non-compile part of time-to-first-pixel)
    t_warm = time.time()
    rs2 = RenderSystem(engine, config)
    build_scene(rs2)
    rs2.camera.resize(width, height)
    rs2.camera.fov = 60.0
    rs2.synchronize()
    rs2.render_frame(samples=1)
    warm_s = time.time() - t_warm
    print(f"# warm-session TTFP {warm_s:.1f}s", file=sys.stderr)

    # per-stage split (context.h:50-72 parity — measured by the profiled
    # step's inter-depth syncs; imgui_app/main.cpp:270-296 displays the
    # same). The profiled step is a SECOND compiled program set, so it
    # runs AFTER the timed window; RFW_BENCH_SPLIT=0 skips it.
    stage_ms = None
    if (os.environ.get("RFW_BENCH_SPLIT", "1") != "0"
            and getattr(rs.context, "_driver", None) is not None):
        if not config.profile_stages:
            object.__setattr__(rs.context.config, "profile_stages", True)
            # first profiled frame pays the terminal-side first-execution
            # compile of the per-depth stage programs INSIDE the timed
            # depth windows (the axon measurement trap, ARCHITECTURE.md)
            # — warm it, then measure
            rs.render_frame(status=RenderStatus.CONVERGE, samples=2)
        rs.render_frame(status=RenderStatus.CONVERGE, samples=2)
        stats = rs.get_render_stats()
        stage_ms = {"primary": round(stats.primary_time * 1000),
                    "secondary": round(stats.secondary_time * 1000),
                    "deep": round(stats.deep_time * 1000)}
        print(f"# stage ms: {stage_ms}", file=sys.stderr)

    out = {
        "metric": "Mrays/sec/chip (pica-4x ~305k tris, 1080p path trace, "
                  f"{engine})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "ms_per_sample_median": round(med, 1),
        "ms_per_sample_windows": [round(w, 1) for w in window_ms_sample],
        "rays_per_sample": {
            "primary": int(stats.primary_count),
            "secondary": int(stats.secondary_count),
            "deep": int(stats.deep_count),
            "shadow": int(stats.shadow_count),
            "total": int(rays_per_sample)},
        "cache_state": cache_state,
        "setup_compile_s": round(setup_s, 1),
        "scene_build_s": round(t_scene, 1),
        "warm_session_ttfp_s": round(warm_s, 1),
    }
    if stage_ms is not None:
        out["stage_ms"] = stage_ms
    print(json.dumps(out))


if __name__ == "__main__":
    main()
