"""Fused dense-kNN EGNN message pipeline as Pallas TPU kernels (fwd + bwd).

This is the reference's hot loop (egnn_pytorch.py:262-333: neighbor gathers,
edge MLP, soft gate, coordinate-weight MLP, masked aggregation) as ONE kernel
per direction. The XLA version spends ~1 ms/step on the flagship config in
gather/elementwise/layout overhead over (b, n, k, ·) tensors; here each
i-tile keeps the whole pair block in VMEM:

- neighbor gathers are one-hot matmuls on the MXU (one-hot generated
  in-register; HIGHEST precision so gathered values are exact f32 —
  coordinates feed equivariant geometry and must not be rounded);
- the factorized edge MLP (proj_i + proj_j + distf @ Wd -> SiLU -> @W2 ->
  SiLU), optional soft-edge gate, coordinate-weight MLP, CoorsNorm, clamp
  and masked aggregation all fuse into the tile;
- the backward kernel RECOMPUTES the tile forward (flash-attention-style; no
  pair tensor is ever saved to HBM) and emits every input/weight gradient in
  one pass, weight grads accumulating across grid steps in resident VMEM
  blocks.

MEASURED OUTCOME (v5e, flagship shapes n=1024/k=8/dim=32, slope-based
timing): forward 226 us (HIGHEST-precision gathers) or ~62 us (default
precision) vs 26 us for XLA's native gather + fused elementwise pipeline;
fwd+bwd 275 vs 96 us. XLA's k-sparse dynamic gather beats one-hot MXU
gathers at these sizes, so the EGNN layer only uses this kernel when
explicitly asked (EGNN(fused_knn=True)); it is kept, fully grad-tested, as
the building block for regimes where it can win (very large k·hidden per
node, or fusion with a future in-kernel top-k).

Pair validity ``pv`` is always applied multiplicatively; the no-mask case
passes all-ones, which is bit-identical to the reference's unmasked branch.

Option surface: fourier_features, soft_edges, norm_coors(+scale), clamp,
sum pooling (masked-mean counts are cheap in XLA outside). NOT fused (the
layer falls back to the jnp path): explicit dense ``edges`` features,
pair-MLP dropout, update_feats/update_coors=False.

Differentiation boundary: inputs are per-node projections (``proj_i`` with
the edge bias folded in, ``proj_j``) and coordinates; everything upstream
(feats @ W, embeddings) stays in XLA where autodiff handles it. ``idx`` and
``pv`` come from ops/neighbors.py:knn_select (already stop-gradient).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_HIGH = jax.lax.Precision.HIGHEST
_OH_BUDGET = 2 * 1024 * 1024  # one-hot tile budget (bytes; ~2x live during concat)


def supports_fused_knn_layer(
    n: int, k: int, hidden: int, backend: Optional[str] = None
) -> bool:
    if backend is None:
        backend = jax.default_backend()
    n_pad = -(-n // _LANE) * _LANE
    return (
        backend == "tpu"
        and n >= _LANE
        and 1 <= k <= 64
        and n_pad * hidden * 4 <= 4 * 1024 * 1024  # proj_j block resident
        and _pick_ti(n_pad, k) >= 8
    )


def _pick_ti(n: int, k: int) -> int:
    ti = _LANE
    while ti > 4 and (ti * k > 1024 or n % ti != 0 or ti * k * n * 4 > _OH_BUDGET):
        ti //= 2
    return ti


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _fourier(dist, fourier: int):
    """[sin(d/2^f)..., cos(d/2^f)..., d] — ops/core.py:fourier_encode_dist."""
    if fourier == 0:
        return dist  # (R, 1): raw channel only
    parts_sin, parts_cos = [], []
    for f in range(fourier):
        xs = dist / (2.0**f)
        parts_sin.append(jnp.sin(xs))
        parts_cos.append(jnp.cos(xs))
    return jnp.concatenate(parts_sin + parts_cos + [dist], axis=1)


def _d_fourier(dist, g_distf, fourier: int):
    """Chain rule of _fourier back to dist; g_distf (R, dd) -> (R, 1)."""
    if fourier == 0:
        return g_distf
    dd = g_distf.shape[1]
    g = g_distf[:, dd - 1 : dd]
    for f in range(fourier):
        xs = dist / (2.0**f)
        g = g + g_distf[:, f : f + 1] * jnp.cos(xs) / (2.0**f)
        g = g - g_distf[:, fourier + f : fourier + f + 1] * jnp.sin(xs) / (2.0**f)
    return g


# in_specs order (shared by fwd and bwd):
# coors, proj_i(tile), proj_j, idx(tile), pv(tile),
# wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale
def _tile_forward(refs, i0, *, n, k, c, h, m, ti, opts):
    (coors_ref, proj_i_ref, proj_j_ref, idx_ref, pv_ref,
     wd_ref, w2_ref, b2_ref, gw_ref, gb_ref,
     cw1_ref, cb1_ref, cw2_ref, cb2_ref, scale_ref) = refs
    R = ti * k

    # Row layout is K-MAJOR: r = kk * ti + i. Mosaic cannot relayout a lane
    # dim into sublanes ((ti, k) -> (ti*k, 1) reshape is unsupported), so the
    # (R, n) one-hot is built by concatenating per-slot one-hots along
    # sublanes, each from a lane slice of the idx tile.
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (ti, n), 1)
    oh = jnp.concatenate(
        [
            (idx_ref[0, :, kk].reshape(ti, 1) == iota_n).astype(jnp.float32)
            for kk in range(k)
        ],
        axis=0,
    )                                                                  # (R,n)
    gm = lambda tbl: jax.lax.dot_general(
        oh, tbl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )
    cj = gm(coors_ref[0])                                              # (R,c)
    pj = gm(proj_j_ref[0])                                             # (R,h)

    ci_t = coors_ref[0, pl.ds(i0, ti), :]                              # (ti,c)
    pi_t = proj_i_ref[0, :, :]                                         # (ti,h)
    ci = jnp.concatenate([ci_t] * k, axis=0)                           # (R,c)
    pi = jnp.concatenate([pi_t] * k, axis=0)                           # (R,h)

    rel = ci - cj
    dist = jnp.sum(rel * rel, axis=1, keepdims=True)                   # (R,1)
    distf = _fourier(dist, opts["fourier"])                            # (R,dd)

    mm_ = lambda a, b_: jax.lax.dot_general(
        a, b_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h1 = pi + pj + mm_(distf, wd_ref[:, :])
    s1 = h1 * jax.nn.sigmoid(h1)
    z2 = mm_(s1, w2_ref[:, :]) + b2_ref[0, :]
    m0 = z2 * jax.nn.sigmoid(z2)                                       # (R,m)

    if opts["soft_edges"]:
        zg = mm_(m0, gw_ref[:, :]) + gb_ref[0, :]
        gate = jax.nn.sigmoid(zg)
        msg = m0 * gate
    else:
        zg = gate = None
        msg = m0

    cz1 = mm_(msg, cw1_ref[:, :]) + cb1_ref[0, :]
    cs1 = cz1 * jax.nn.sigmoid(cz1)                                    # (R,4m)
    wz = mm_(cs1, cw2_ref[:, :]) + cb2_ref[0, :]                       # (R,1)

    # lane-slice extraction via masked reduction (a direct (ti,1) lane slice
    # keeps its lane offset and Mosaic cannot concat mismatched offsets)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (ti, k), 1)
    pvt = pv_ref[0, :, :]
    pv = jnp.concatenate(
        [
            jnp.sum(jnp.where(iota_k == kk, pvt, 0), axis=1, keepdims=True)
            for kk in range(k)
        ],
        axis=0,
    ).astype(jnp.float32)                                              # (R,1)
    wm = wz * pv
    if opts["clamp"] is not None:
        cval = opts["clamp"]
        w = jnp.clip(wm, -cval, cval)
    else:
        w = wm

    if opts["norm_coors"]:
        eps = opts["eps"]
        nrm = jnp.sqrt(jnp.maximum(dist, eps * eps))
        rel_n = rel / nrm * scale_ref[0, 0]
    else:
        nrm = None
        rel_n = rel

    return dict(
        oh=oh, cj=cj, pj=pj, rel=rel, dist=dist, distf=distf,
        h1=h1, s1=s1, z2=z2, m0=m0, zg=zg, gate=gate, msg=msg,
        cz1=cz1, cs1=cs1, wz=wz, pv=pv, wm=wm, w=w, nrm=nrm, rel_n=rel_n,
    )


def _ksum(x, ti, k):
    """Sum k-major (R, d) rows back to (ti, d): Σ_kk x[kk*ti:(kk+1)*ti]."""
    acc = x[0:ti, :]
    for kk in range(1, k):
        acc = acc + x[kk * ti : (kk + 1) * ti, :]
    return acc


def _fwd_kernel(*refs, n, k, c, h, m, ti, opts):
    in_refs = refs[:15]
    out_mi_ref, out_cd_ref = refs[15], refs[16]
    i0 = pl.program_id(1) * ti
    t = _tile_forward(in_refs, i0, n=n, k=k, c=c, h=h, m=m, ti=ti, opts=opts)
    out_mi_ref[0, :, :] = _ksum(t["msg"] * t["pv"], ti, k)
    out_cd_ref[0, :, :] = _ksum(t["w"] * t["rel_n"], ti, k)


def _bwd_kernel(*refs, n, k, c, h, m, ti, opts):
    in_refs = refs[:15]
    (g_mi_ref, g_cd_ref,
     d_coors_ref, d_pi_ref, d_pj_ref,
     d_wd_ref, d_w2_ref, d_b2_ref, d_gw_ref, d_gb_ref,
     d_cw1_ref, d_cb1_ref, d_cw2_ref, d_cb2_ref, d_scale_ref) = refs[15:]
    ib, ii = pl.program_id(0), pl.program_id(1)
    i0 = ii * ti
    R = ti * k
    dG = lambda a, b_, dims: jax.lax.dot_general(
        a, b_, dims, preferred_element_type=jnp.float32
    )
    T_ = (((0,), (0,)), ((), ()))   # a^T @ b (contract rows)
    B_ = (((1,), (1,)), ((), ()))   # a @ b^T

    @pl.when((ib == 0) & (ii == 0))
    def _():
        for r in (d_wd_ref, d_w2_ref, d_b2_ref, d_gw_ref, d_gb_ref,
                  d_cw1_ref, d_cb1_ref, d_cw2_ref, d_cb2_ref, d_scale_ref):
            r[:, :] = jnp.zeros_like(r)

    @pl.when(ii == 0)
    def _():
        d_coors_ref[0, :, :] = jnp.zeros((n, c), jnp.float32)
        d_pj_ref[0, :, :] = jnp.zeros((n, h), jnp.float32)

    t = _tile_forward(in_refs, i0, n=n, k=k, c=c, h=h, m=m, ti=ti, opts=opts)
    wd_ref, w2_ref, gw_ref, cw1_ref, cw2_ref, scale_ref = (
        in_refs[5], in_refs[6], in_refs[8], in_refs[10], in_refs[12],
        in_refs[14],
    )

    gmi = g_mi_ref[0, :, :]                                            # (TI,m)
    gcd = g_cd_ref[0, :, :]                                            # (TI,c)
    gm_b = jnp.concatenate([gmi] * k, axis=0)                          # (R,m)
    gc_b = jnp.concatenate([gcd] * k, axis=0)                          # (R,c)

    # ---- aggregation backward ----
    d_msg = gm_b * t["pv"]                                             # (R,m)
    d_w = jnp.sum(gc_b * t["rel_n"], axis=1, keepdims=True)            # (R,1)
    d_rel_n = t["w"] * gc_b                                            # (R,c)

    if opts["clamp"] is not None:
        cval = opts["clamp"]
        inside = ((t["wm"] > -cval) & (t["wm"] < cval)).astype(jnp.float32)
        d_wm = d_w * inside
    else:
        d_wm = d_w
    d_wz = d_wm * t["pv"]                                              # (R,1)

    d_dist = jnp.zeros_like(t["dist"])
    if opts["norm_coors"]:
        eps = opts["eps"]
        s = scale_ref[0, 0]
        d_rel = d_rel_n * (s / t["nrm"])
        d_nrm = jnp.sum(d_rel_n * t["rel"], axis=1, keepdims=True) * (
            -s / (t["nrm"] * t["nrm"])
        )
        live = (t["dist"] > eps * eps).astype(jnp.float32)
        d_dist = d_dist + d_nrm * live * 0.5 / t["nrm"]
        d_scale_ref[:, :] += jnp.sum(d_rel_n * t["rel"] / t["nrm"]).reshape(1, 1)
    else:
        d_rel = d_rel_n

    # coordinate-weight MLP backward
    d_cs1 = dG(d_wz, cw2_ref[:, :], B_)                                # (R,4m)
    d_cw2_ref[:, :] += dG(t["cs1"], d_wz, T_)
    d_cb2_ref[0, :] += jnp.sum(d_wz, axis=0)
    d_cz1 = d_cs1 * _dsilu(t["cz1"])
    d_msg = d_msg + dG(d_cz1, cw1_ref[:, :], B_)
    d_cw1_ref[:, :] += dG(t["msg"], d_cz1, T_)
    d_cb1_ref[0, :] += jnp.sum(d_cz1, axis=0)

    # soft gate backward
    if opts["soft_edges"]:
        d_m0 = d_msg * t["gate"]
        d_g = jnp.sum(d_msg * t["m0"], axis=1, keepdims=True)
        d_zg = d_g * t["gate"] * (1.0 - t["gate"])
        d_m0 = d_m0 + dG(d_zg, gw_ref[:, :], B_)
        d_gw_ref[:, :] += dG(t["m0"], d_zg, T_)
        d_gb_ref[0, :] += jnp.sum(d_zg, axis=0)
    else:
        d_m0 = d_msg

    # edge MLP backward
    d_z2 = d_m0 * _dsilu(t["z2"])
    d_s1 = dG(d_z2, w2_ref[:, :], B_)                                  # (R,h)
    d_w2_ref[:, :] += dG(t["s1"], d_z2, T_)
    d_b2_ref[0, :] += jnp.sum(d_z2, axis=0)
    d_h1 = d_s1 * _dsilu(t["h1"])                                      # (R,h)

    d_distf = dG(d_h1, wd_ref[:, :], B_)                               # (R,dd)
    d_wd_ref[:, :] += dG(t["distf"], d_h1, T_)
    d_dist = d_dist + _d_fourier(t["dist"], d_distf, opts["fourier"])

    d_rel = d_rel + 2.0 * t["rel"] * d_dist                            # (R,c)

    # per-node grads: i-side per tile, j-side scattered via one-hot^T (MXU)
    d_pi_ref[0, :, :] = _ksum(d_h1, ti, k)
    d_pj_ref[0, :, :] += dG(t["oh"], d_h1, T_)
    d_coors_ref[0, :, :] += dG(t["oh"], -d_rel, T_)
    d_coors_ref[0, pl.ds(i0, ti), :] += _ksum(d_rel, ti, k)


def _cst(shp):
    return pl.BlockSpec(shp, lambda ib, ii: (0,) * len(shp), memory_space=pltpu.VMEM)


def _in_specs(n_pad, k, c, h, m, dd, ti):
    return [
        pl.BlockSpec((1, n_pad, c), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ti, h), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, h), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ti, k), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        _cst((dd, h)), _cst((h, m)), _cst((1, m)),
        _cst((m, 1)), _cst((1, 1)),
        _cst((m, 4 * m)), _cst((1, 4 * m)), _cst((4 * m, 1)), _cst((1, 1)),
        _cst((1, 1)),
    ]


def _prep_arrays(coors, proj_i, proj_j, idx, pv):
    b, n, c = coors.shape
    n_pad = -(-n // _LANE) * _LANE
    pd = n_pad - n
    f32 = lambda x: x.astype(jnp.float32)
    pad3 = lambda x: jnp.pad(x, ((0, 0), (0, pd), (0, 0)))
    return (
        pad3(f32(coors)), pad3(f32(proj_i)), pad3(f32(proj_j)),
        pad3(idx.astype(jnp.int32)), pad3(pv.astype(jnp.int32)), n_pad, pd,
    )


def _weights_2d(wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale):
    f32 = lambda x: x.astype(jnp.float32)
    return (
        f32(wd), f32(w2), f32(b2).reshape(1, -1),
        f32(gw).reshape(w2.shape[-1], 1), f32(gb).reshape(1, 1),
        f32(cw1), f32(cb1).reshape(1, -1), f32(cw2), f32(cb2).reshape(1, 1),
        f32(scale).reshape(1, 1),
    )


@functools.partial(
    jax.jit,
    static_argnames=("fourier", "soft_edges", "norm_coors", "clamp", "eps",
                     "interpret"),
)
def _fwd_call(coors, proj_i, proj_j, idx, pv, weights, *, fourier, soft_edges,
              norm_coors, clamp, eps, interpret):
    b, n, c = coors.shape
    k = idx.shape[-1]
    h = proj_i.shape[-1]
    m = weights[1].shape[-1]
    dd = 2 * fourier + 1
    coors_p, pi_p, pj_p, idx_p, pv_p, n_pad, pd = _prep_arrays(
        coors, proj_i, proj_j, idx, pv)
    w2d = _weights_2d(*weights)
    ti = _pick_ti(n_pad, k)
    opts = dict(fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
                clamp=clamp, eps=eps)
    kern = functools.partial(_fwd_kernel, n=n_pad, k=k, c=c, h=h, m=m, ti=ti,
                             opts=opts)
    m_i, cd = pl.pallas_call(
        kern,
        grid=(b, n_pad // ti),
        in_specs=_in_specs(n_pad, k, c, h, m, dd, ti),
        out_specs=[
            pl.BlockSpec((1, ti, m), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, c), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, m), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        ],
        interpret=interpret,
    )(coors_p, pi_p, pj_p, idx_p, pv_p, *w2d)
    return m_i[:, :n].astype(proj_i.dtype), cd[:, :n].astype(coors.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fourier", "soft_edges", "norm_coors", "clamp", "eps",
                     "interpret"),
)
def _bwd_call(coors, proj_i, proj_j, idx, pv, weights, g_mi, g_cd, *, fourier,
              soft_edges, norm_coors, clamp, eps, interpret):
    b, n, c = coors.shape
    k = idx.shape[-1]
    h = proj_i.shape[-1]
    m = weights[1].shape[-1]
    dd = 2 * fourier + 1
    coors_p, pi_p, pj_p, idx_p, pv_p, n_pad, pd = _prep_arrays(
        coors, proj_i, proj_j, idx, pv)
    w2d = _weights_2d(*weights)
    ti = _pick_ti(n_pad, k)
    opts = dict(fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
                clamp=clamp, eps=eps)
    pad3 = lambda x: jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pd), (0, 0)))
    kern = functools.partial(_bwd_kernel, n=n_pad, k=k, c=c, h=h, m=m, ti=ti,
                             opts=opts)
    shp = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kern,
        grid=(b, n_pad // ti),
        in_specs=_in_specs(n_pad, k, c, h, m, dd, ti) + [
            pl.BlockSpec((1, ti, m), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, c), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, c), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, h), lambda ib, ii: (ib, ii, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, h), lambda ib, ii: (ib, 0, 0), memory_space=pltpu.VMEM),
            _cst((dd, h)), _cst((h, m)), _cst((1, m)),
            _cst((m, 1)), _cst((1, 1)),
            _cst((m, 4 * m)), _cst((1, 4 * m)), _cst((4 * m, 1)), _cst((1, 1)),
            _cst((1, 1)),
        ],
        out_shape=[
            shp((b, n_pad, c), jnp.float32),
            shp((b, n_pad, h), jnp.float32),
            shp((b, n_pad, h), jnp.float32),
            shp((dd, h), jnp.float32), shp((h, m), jnp.float32),
            shp((1, m), jnp.float32),
            shp((m, 1), jnp.float32), shp((1, 1), jnp.float32),
            shp((m, 4 * m), jnp.float32), shp((1, 4 * m), jnp.float32),
            shp((4 * m, 1), jnp.float32), shp((1, 1), jnp.float32),
            shp((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(coors_p, pi_p, pj_p, idx_p, pv_p, *w2d, pad3(g_mi), pad3(g_cd))

    (d_coors, d_pi, d_pj, d_wd, d_w2, d_b2, d_gw, d_gb,
     d_cw1, d_cb1, d_cw2, d_cb2, d_scale) = outs
    wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale = weights
    cast = lambda g, ref: g.reshape(ref.shape).astype(ref.dtype)
    return (
        d_coors[:, :coors.shape[1]].astype(coors.dtype),
        d_pi[:, :coors.shape[1]].astype(proj_i.dtype),
        d_pj[:, :coors.shape[1]].astype(proj_j.dtype),
        (cast(d_wd, wd), cast(d_w2, w2), cast(d_b2, b2), cast(d_gw, gw),
         cast(d_gb, gb), cast(d_cw1, cw1), cast(d_cb1, cb1), cast(d_cw2, cw2),
         cast(d_cb2, cb2), cast(d_scale, scale)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def fused_knn_messages(
    coors, proj_i, proj_j, idx, pv, fourier: int, soft_edges: bool,
    norm_coors: bool, clamp: Optional[float], eps: float, interpret: bool,
    *weights,
):
    """Fused pair pipeline for the dense kNN path.

    ``weights`` = (wd, w2, b2, gw, gb, cw1, cb1, cw2, cb2, scale); pass
    zero-shaped dummies for unused options (gw/gb when not soft_edges, scale
    when not norm_coors) — their grads come back zero.

    Returns (m_i (b,n,m) = sum of pv-masked messages, coors_delta (b,n,c)).
    Masked-mean pooling: divide by pv counts outside.
    """
    return _fwd_call(
        coors, proj_i, proj_j, idx, pv, weights,
        fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
        clamp=clamp, eps=eps, interpret=interpret,
    )


def _vjp_fwd(coors, proj_i, proj_j, idx, pv, fourier, soft_edges, norm_coors,
             clamp, eps, interpret, *weights):
    out = _fwd_call(
        coors, proj_i, proj_j, idx, pv, weights,
        fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
        clamp=clamp, eps=eps, interpret=interpret,
    )
    return out, (coors, proj_i, proj_j, idx, pv, weights)


def _vjp_bwd(fourier, soft_edges, norm_coors, clamp, eps, interpret, res, g):
    coors, proj_i, proj_j, idx, pv, weights = res
    g_mi, g_cd = g
    d_coors, d_pi, d_pj, d_weights = _bwd_call(
        coors, proj_i, proj_j, idx, pv, weights, g_mi, g_cd,
        fourier=fourier, soft_edges=soft_edges, norm_coors=norm_coors,
        clamp=clamp, eps=eps, interpret=interpret,
    )
    return (d_coors, d_pi, d_pj, None, None) + tuple(d_weights)


fused_knn_messages.defvjp(_vjp_fwd, _vjp_bwd)
