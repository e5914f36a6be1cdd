"""Texture-fetch optimization prototypes vs current get_shading_data.

Variants on 518k lanes (pica-4x, bounce-hit mix):
  A) current shade.get_shading_data (24 separate row gathers)
  B) batched taps: ONE gather of all 24 tap indices per lane
  C) B + RGBA8-packed u32 atlas (4 B/tap instead of 16)
  D) no-texture baseline (attribute gathers only)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.system import RenderSystem
from rfw_tpu.config import RenderConfig
from rfw_tpu.ops import raygen, pair_intersect as pri
from rfw_tpu.ops.shade import get_shading_data
from rfw_tpu.render.integrator import _tile_permutation
import bench as benchmod

W, ROWS = 1920, 270
cfg = RenderConfig()
rs = RenderSystem("wavefront", cfg)
benchmod.build_scene(rs)
rs.camera.resize(1920, 1080)
rs.camera.fov = 60.0
rs.synchronize()
eng = rs.context
eng.resize(1920, 1080)
eng.update()
scene = eng._scene
n = W * ROWS
view = rs.camera.get_view().as_pytree()
perm, _ = _tile_permutation(W, n)
pid = jnp.asarray(perm.astype(np.uint32)) + np.uint32(W * 405)


def bench(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.flatten(out)[0][0].ravel()[:1])
    print(f"{label}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)
    return out


@jax.jit
def prep(scene):
    O, D = raygen.generate_primary_rays(view, 1920, 1080, 0, pixel_ids=pid)
    t, prim, u, v = pri.closest_hit(scene, O, D, cfg,
                                    t_max=jnp.full(n, 1e30))
    return t, jnp.maximum(prim, 0), u, v, D


t, prim, u, v, D = prep(scene)
np.asarray(t[:1])
cone = view["spread_angle"] * t
tex_flags = {"diffuse": True, "normal": True, "rough": True}

f_a = jax.jit(lambda sc, p, u, v, d, c: get_shading_data(
    sc, p, u, v, d, c, tex_flags=tex_flags))
sd_a = bench("A) current (tex)", f_a, scene, prim, u, v, D, cone)

f_d = jax.jit(lambda sc, p, u, v, d, c: get_shading_data(
    sc, p, u, v, d, c,
    tex_flags={"diffuse": False, "normal": False, "rough": False}))
bench("D) no-tex", f_d, scene, prim, u, v, D, cone)


# ---- B: batched taps ------------------------------------------------------

def taps_for(desc, tex_id, uv, lam):
    """One texture's trilinear tap indices+weights: (R, 8) idx, (R, 8) w."""
    levels = desc.shape[1]
    lam = jnp.clip(lam, 0.0, levels - 1)
    l0 = jnp.floor(lam).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, levels - 1)
    f = lam - l0.astype(jnp.float32)
    idxs = []
    ws = []
    for lvl, lw in ((l0, 1.0 - f), (l1, f)):
        d = desc[tex_id, lvl]                   # (R, 3)
        addr, wid, hei = d[..., 0], d[..., 1], d[..., 2]
        x = uv[..., 0] * wid.astype(jnp.float32) - 0.5
        y = uv[..., 1] * hei.astype(jnp.float32) - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = jnp.mod(x0.astype(jnp.int32), jnp.maximum(wid, 1))
        x1i = jnp.mod(x0.astype(jnp.int32) + 1, jnp.maximum(wid, 1))
        y0i = jnp.mod(y0.astype(jnp.int32), jnp.maximum(hei, 1))
        y1i = jnp.mod(y0.astype(jnp.int32) + 1, jnp.maximum(hei, 1))
        idxs += [addr + y0i * wid + x0i, addr + y0i * wid + x1i,
                 addr + y1i * wid + x0i, addr + y1i * wid + x1i]
        ws += [lw * (1 - fx) * (1 - fy), lw * fx * (1 - fy),
               lw * (1 - fx) * fy, lw * fx * fy]
    return jnp.stack(idxs, -1), jnp.stack(ws, -1)


def fetch_batched(scene, prim, u, v, d, cone_width):
    mats = scene["materials"]
    desc = scene["atlas_desc"]
    atlas = scene["atlas"]
    tri_uv = scene["tri_uv"][prim]
    n_geom = scene["tri_gnormal"][prim]
    mat_id = scene["tri_material"][prim]
    lod_base = scene["tri_lod"][prim]
    w = (1.0 - u - v)[..., None]
    uv_i = (w * tri_uv[:, 0] + u[..., None] * tri_uv[:, 1]
            + v[..., None] * tri_uv[:, 2])
    tex0 = jnp.maximum(mats["tex0_id"][mat_id], 0)
    uvt = mats["tex0_uvtransform"][mat_id]
    uv0 = uvt[..., 0:2] * (uvt[..., 2:4] + uv_i)
    base_w = desc[tex0, 0, 1].astype(jnp.float32)
    lam = (jnp.log2(jnp.maximum(
        base_w * cone_width
        / jnp.maximum(jnp.abs(jnp.sum(-d * n_geom, -1)), 1e-4), 1e-20))
        - lod_base)
    i0, w0 = taps_for(desc, tex0, uv0, lam)
    texn = jnp.maximum(mats["tex1_id"][mat_id], 0)
    i1, w1 = taps_for(desc, texn, uv_i, lam)
    texr = jnp.maximum(mats["tex3_id"][mat_id], 0)
    i2, w2 = taps_for(desc, texr, uv_i, lam)
    idx = jnp.concatenate([i0, i1, i2], -1)       # (R, 24)
    ws = jnp.concatenate([w0, w1, w2], -1)
    texels = atlas[idx]                           # (R, 24, 4) ONE gather
    out = texels * ws[..., None]
    return (out[:, 0:8].sum(1), out[:, 8:16].sum(1), out[:, 16:24].sum(1))


f_b = jax.jit(fetch_batched)
tb = bench("B) batched 24-tap gather", f_b, scene, prim, u, v, D, cone)

# ---- C: u32 RGBA8 atlas ---------------------------------------------------
af = np.asarray(scene["atlas"])
a8 = np.clip(af * 255.0 + 0.5, 0, 255).astype(np.uint32)
atlas_u32 = jnp.asarray(a8[:, 0] | (a8[:, 1] << 8) | (a8[:, 2] << 16)
                        | (a8[:, 3] << 24))
scene2 = dict(scene)
scene2["atlas_u32"] = atlas_u32


def fetch_packed(scene, prim, u, v, d, cone_width):
    mats = scene["materials"]
    desc = scene["atlas_desc"]
    tri_uv = scene["tri_uv"][prim]
    n_geom = scene["tri_gnormal"][prim]
    mat_id = scene["tri_material"][prim]
    lod_base = scene["tri_lod"][prim]
    w = (1.0 - u - v)[..., None]
    uv_i = (w * tri_uv[:, 0] + u[..., None] * tri_uv[:, 1]
            + v[..., None] * tri_uv[:, 2])
    tex0 = jnp.maximum(mats["tex0_id"][mat_id], 0)
    uvt = mats["tex0_uvtransform"][mat_id]
    uv0 = uvt[..., 0:2] * (uvt[..., 2:4] + uv_i)
    base_w = desc[tex0, 0, 1].astype(jnp.float32)
    lam = (jnp.log2(jnp.maximum(
        base_w * cone_width
        / jnp.maximum(jnp.abs(jnp.sum(-d * n_geom, -1)), 1e-4), 1e-20))
        - lod_base)
    i0, w0 = taps_for(desc, tex0, uv0, lam)
    texn = jnp.maximum(mats["tex1_id"][mat_id], 0)
    i1, w1 = taps_for(desc, texn, uv_i, lam)
    texr = jnp.maximum(mats["tex3_id"][mat_id], 0)
    i2, w2 = taps_for(desc, texr, uv_i, lam)
    idx = jnp.concatenate([i0, i1, i2], -1)
    ws = jnp.concatenate([w0, w1, w2], -1)
    px = scene["atlas_u32"][idx]                  # (R, 24) u32
    texel = jnp.stack([(px & 0xFF), (px >> 8) & 0xFF,
                       (px >> 16) & 0xFF, (px >> 24) & 0xFF],
                      -1).astype(jnp.float32) * (1.0 / 255.0)
    out = texel * ws[..., None]
    return (out[:, 0:8].sum(1), out[:, 8:16].sum(1), out[:, 16:24].sum(1))


f_c = jax.jit(fetch_packed)
tc = bench("C) packed u32 atlas", f_c, scene2, prim, u, v, D, cone)

d0 = np.asarray(tb[0])
d1 = np.asarray(tc[0])
print("B vs C max diff:", np.abs(d0 - d1).max(), flush=True)
# sanity vs A's color path: A multiplies base color; compare where tex bound
mats = scene["materials"]
mat_id = np.asarray(scene["tri_material"])[np.asarray(prim)]
has0 = np.asarray(mats["tex0_id"])[mat_id] >= 0
base = np.asarray(mats["color"])[mat_id]
recon = np.where(has0[:, None], base * d0[:, :3], base)
print("A vs B color max diff:",
      np.abs(np.asarray(sd_a[0]["color"]) - recon).max(), flush=True)


# ---- E: 2-wide slice gathers (x-pairs as one descriptor) ------------------
# measurement-only: ignores the wrap seam (production needs gutter columns)
from jax import lax


def fetch_sliced(scene, prim, u, v, d, cone_width):
    mats = scene["materials"]
    desc = scene["atlas_desc"]
    atlas = scene["atlas"]
    tri_uv = scene["tri_uv"][prim]
    n_geom = scene["tri_gnormal"][prim]
    mat_id = scene["tri_material"][prim]
    lod_base = scene["tri_lod"][prim]
    w = (1.0 - u - v)[..., None]
    uv_i = (w * tri_uv[:, 0] + u[..., None] * tri_uv[:, 1]
            + v[..., None] * tri_uv[:, 2])
    tex0 = jnp.maximum(mats["tex0_id"][mat_id], 0)
    uvt = mats["tex0_uvtransform"][mat_id]
    uv0 = uvt[..., 0:2] * (uvt[..., 2:4] + uv_i)
    base_w = desc[tex0, 0, 1].astype(jnp.float32)
    lam = (jnp.log2(jnp.maximum(
        base_w * cone_width
        / jnp.maximum(jnp.abs(jnp.sum(-d * n_geom, -1)), 1e-4), 1e-20))
        - lod_base)

    starts = []
    wrow = []
    wxs = []
    for tex_id, uvx in ((tex0, uv0),
                        (jnp.maximum(mats["tex1_id"][mat_id], 0), uv_i),
                        (jnp.maximum(mats["tex3_id"][mat_id], 0), uv_i)):
        levels = desc.shape[1]
        lamc = jnp.clip(lam, 0.0, levels - 1)
        l0 = jnp.floor(lamc).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, levels - 1)
        f = lamc - l0.astype(jnp.float32)
        for lvl, lw in ((l0, 1.0 - f), (l1, f)):
            dd = desc[tex_id, lvl]
            addr, wid, hei = dd[..., 0], dd[..., 1], dd[..., 2]
            x = uvx[..., 0] * wid.astype(jnp.float32) - 0.5
            y = uvx[..., 1] * hei.astype(jnp.float32) - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            x0i = jnp.mod(x0.astype(jnp.int32), jnp.maximum(wid, 1))
            y0i = jnp.mod(y0.astype(jnp.int32), jnp.maximum(hei, 1))
            y1i = jnp.mod(y0.astype(jnp.int32) + 1, jnp.maximum(hei, 1))
            starts += [addr + y0i * wid + x0i, addr + y1i * wid + x0i]
            wrow += [lw * (1 - fy), lw * fy]
            wxs += [fx, fx]
    st = jnp.stack(starts, -1).reshape(-1, 1)       # (R*12, 1)
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                    collapsed_slice_dims=(),
                                    start_index_map=(0,))
    px = lax.gather(atlas, st, dn, slice_sizes=(2, 4),
                    mode=lax.GatherScatterMode.CLIP)
    px = px.reshape(-1, 12, 2, 4)
    wr = jnp.stack(wrow, -1)[..., None]             # (R, 12, 1)
    fx = jnp.stack(wxs, -1)
    wx = jnp.stack([1.0 - fx, fx], -1)[..., None]   # (R, 12, 2, 1)
    out = (px * wx).sum(2) * wr                     # (R, 12, 4)
    return (out[:, 0:4].sum(1), out[:, 4:8].sum(1), out[:, 8:12].sum(1))


f_e = jax.jit(fetch_sliced)
te = bench("E) 12x 2-wide slice gathers", f_e, scene, prim, u, v, D, cone)
print("E vs B max diff (seam texels differ):",
      np.abs(np.asarray(te[0]) - np.asarray(tb[0])).max(), flush=True)
