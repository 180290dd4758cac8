"""CTU-row-sharded device filter chain over a jax.sharding Mesh.

The multi-chip form of ops/device_pipeline's whole-frame filter chain
(the P3 analog of the reference's CTU wavefront, DecLibRecon.cpp:603-641,
re-designed as row shards + halo exchange per SURVEY.md §2.6/§8E):

 - planes are sharded over CTU-row-aligned bands (shard height is a
   multiple of the CTU size, so every compile-time mask in the dense
   kernels — VB rows, deblock CTU-boundary rules, 4/8-pel edge phases —
   keeps its alignment in shard-local coordinates);
 - ONE halo exchange of `ctu_size` rows per neighbour per frame
   (lax.ppermute -> ICI on a real slice): the whole chain then runs on
   the haloed shard.  The chain's total contamination depth from a shard
   edge is <= 22 rows (deblock-H 15 + SAO 1 + ALF 6), well inside the
   64+ row halo, so the shard cores are bit-exact against the unsharded
   chain — asserted by tests/test_parallel.py on real decoded pictures;
 - per-CTU parameters ride the (small) replicated int16 vector and are
   dynamically sliced per shard by axis index.

Picture-edge shards replicate their border rows into the halo, matching
the whole-frame kernels' edge-pad semantics; SAO's picture-border
trimming uses the absolute row offset (traced) instead of shard-local
coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vvdec_tpu.ops.deblock_dense import (
    deblock_chroma_dense_core,
    deblock_luma_dense_core,
)
from vvdec_tpu.ops.device_pipeline import (
    _alf_inputs,
    _ccalf_dense_core,
    _classify_dense,
    _deblock_grid_inputs,
    _expand_ctu,
    _rep4,
    _sao_inputs,
    _sao_plane,
    device_filter_eligible,
)
from vvdec_tpu.ops.pipeline import _alf_diamond_dense_core


def sharded_filter_eligible(cs) -> bool:
    return device_filter_eligible(cs)


def _sharded_layout(skey):
    """(name, shape) list for the replicated parameter vector; grids are
    padded with one halo CTU row of inert values on each side so every
    shard's dynamic slice is in-bounds."""
    (h_img, w, hc_img, wc, h_pad, sh, bd, ctu, sub_w, sub_h, num_comp,
     w_ctu, db_on, n_sl, sao_on, alf_luma, alf_chroma, cc_on, n_banks,
     n_cb, n_cc) = skey
    c4 = ctu // 4
    g4 = h_pad // 4 + 2 * c4
    gc = h_pad // ctu + 2
    out = []
    if db_on:
        out.append(("db_y", (2, g4, w // 4)))
        if num_comp > 1:
            out.append(("db_cb", (2, g4, w // 4)))
            out.append(("db_cr", (2, g4, w // 4)))
        if n_sl > 1:
            out.append(("db_si", (g4, w // 4)))
        out.append(("db_sltab", (n_sl, 6)))
    if sao_on:
        out.append(("sao_type", (num_comp, gc, w_ctu)))
        out.append(("sao_vals", (num_comp, gc, w_ctu, 6)))
    if alf_luma or alf_chroma or cc_on:
        out += [("en_y", (gc, w_ctu)), ("set_ctu", (gc, w_ctu)),
                ("en_c", (2, gc, w_ctu)), ("alt_ctu", (2, gc, w_ctu)),
                ("cc_ctu", (2, gc, w_ctu)),
                ("banks_co", (n_banks, 4, 25, 13)),
                ("banks_cl", (n_banks, 4, 25, 13)),
                ("cbanks_co", (n_cb, 7)), ("cbanks_cl", (n_cb, 7)),
                ("cc_banks", (n_cc, 7))]
    return out


def _pack(skey, arrays):
    parts = []
    for name, shape in _sharded_layout(skey):
        a = np.ascontiguousarray(arrays[name], dtype=np.int32)
        assert a.shape == shape, (name, a.shape, shape)
        parts.append(a.reshape(-1).astype(np.int16))
    return np.concatenate(parts) if parts else np.zeros(1, np.int16)


def _pad_rows(a, rows_before, rows_after, fill):
    return np.pad(a, [(rows_before, rows_after)] + [(0, 0)] * (a.ndim - 1),
                  constant_values=fill)


def _shard_chain_core(skey, n_shards, axis):
    """Per-shard chain body (SPMD — used under shard_map)."""
    (h_img, w, hc_img, wc, h_pad, sh, bd, ctu, sub_w, sub_h, num_comp,
     w_ctu, db_on, n_sl, sao_on, alf_luma, alf_chroma, cc_on, n_banks,
     n_cb, n_cc) = skey
    layout = _sharded_layout(skey)
    c4 = ctu // 4
    sh4 = sh // 4
    hs = sh + 2 * ctu          # haloed luma shard height
    ctu_c = ctu // sub_h
    hcs = hs // sub_h
    shc = sh // sub_h
    wcs = wc
    sh_ctu = sh // ctu
    gcs = sh_ctu + 2
    vb_luma_h, vb_luma_pos = ctu, ctu - 4
    vb_chma_h = ctu // sub_h
    vb_chma_pos = vb_chma_h - 2
    h4s, w4s = hs // 4, w // 4

    if db_on:
        db_y = [deblock_luma_dense_core(hs, w, bd, ctu, False, n_sl),
                deblock_luma_dense_core(w, hs, bd, ctu, True, n_sl)]
        db_c = []
        if num_comp > 1:
            for d in range(2):
                L = 4 // (sub_h if d == 0 else sub_w)
                fy = 4 // (sub_h if d == 0 else sub_w)
                fx = 4 // (sub_w if d == 0 else sub_h)
                dims = (hcs, wcs) if d == 0 else (wcs, hcs)
                db_c.append([
                    deblock_chroma_dense_core(
                        dims[0], dims[1], bd, ctu_c, L, d == 1, fy, fx,
                        n_sl, comp) for comp in (1, 2)])
    alf_luma_fn = _alf_diamond_dense_core(
        hs, w, bd, 12, vb_luma_h, vb_luma_pos, False) if alf_luma else None
    alf_chroma_fn = _alf_diamond_dense_core(
        hcs, wcs, bd, 6, vb_chma_h, vb_chma_pos, True) \
        if alf_chroma else None
    cc_fn = _ccalf_dense_core(hs, w, hcs, wcs, bd, sub_w, sub_h, ctu,
                              w_ctu, n_cc) if cc_on else None

    def unpack(flat):
        out = {}
        pos = 0
        for name, shape in layout:
            n = int(np.prod(shape))
            out[name] = flat[pos:pos + n].reshape(shape) \
                .astype(jnp.int32)
            pos += n
        return out

    def halo(xs, hrows):
        """Exchange `hrows` boundary rows with row-shard neighbours;
        picture-edge shards replicate their border row."""
        idx = jax.lax.axis_index(axis)
        fwd = [(i, i + 1) for i in range(n_shards - 1)]
        bwd = [(i + 1, i) for i in range(n_shards - 1)]
        from_above = jax.lax.ppermute(xs[-hrows:, :], axis, fwd)
        from_below = jax.lax.ppermute(xs[:hrows, :], axis, bwd)
        top = jnp.where(idx == 0,
                        jnp.repeat(xs[:1, :], hrows, axis=0), from_above)
        bot = jnp.where(idx == n_shards - 1,
                        jnp.repeat(xs[-1:, :], hrows, axis=0), from_below)
        return jnp.concatenate([top, xs, bot], axis=0)

    def shard_fn(*args):
        planes_in = [a[0] for a in args[:num_comp]]  # drop frame dim
        flat = args[num_comp][0]
        Prm = unpack(flat)
        idx = jax.lax.axis_index(axis)
        # ONE halo exchange per plane per frame
        planes = [halo(planes_in[0], ctu)]
        if num_comp > 1:
            planes += [halo(p, ctu_c) for p in planes_in[1:]]

        def g4slice(a):
            # grid slice: rows [idx*sh4, idx*sh4 + sh4 + 2*c4)
            start = (idx * sh4,) + (0,) * (a.ndim - 1)
            size = (sh4 + 2 * c4,) + a.shape[1:]
            return jax.lax.dynamic_slice(a, start, size)

        def gcslice(a, lead=0):
            start = (0,) * lead + (idx * sh_ctu,) + (0,) * \
                (a.ndim - lead - 1)
            size = a.shape[:lead] + (gcs,) + a.shape[lead + 1:]
            return jax.lax.dynamic_slice(a, start, size)

        # ---- deblocking ----
        if db_on:
            sltab = Prm["db_sltab"]
            si = g4slice(Prm["db_si"]) if n_sl > 1 else \
                jnp.zeros((h4s, w4s), dtype=jnp.int32)
            gy = Prm["db_y"]
            planes[0] = db_y[0](planes[0], g4slice(gy[0]), si, sltab)
            if num_comp > 1:
                for k, nm in enumerate(("db_cb", "db_cr")):
                    planes[1 + k] = db_c[0][k](
                        planes[1 + k], g4slice(Prm[nm][0]), si, sltab)
            planes[0] = db_y[1](planes[0].T, g4slice(gy[1]).T, si.T,
                                sltab).T
            if num_comp > 1:
                for k, nm in enumerate(("db_cb", "db_cr")):
                    planes[1 + k] = db_c[1][k](
                        planes[1 + k].T, g4slice(Prm[nm][1]).T, si.T,
                        sltab).T
        # ---- SAO ----
        if sao_on:
            row0_y = idx * sh - ctu
            for comp in range(num_comp):
                cw_ = (ctu // sub_w) if comp else ctu
                ch_ = (ctu // sub_h) if comp else ctu
                ph_, pw_ = (hcs, wcs) if comp else (hs, w)
                r0 = row0_y // (sub_h if comp else 1)
                ih = hc_img if comp else h_img
                planes[comp] = _sao_plane(
                    planes[comp],
                    gcslice(Prm["sao_type"], 1)[comp].reshape(-1),
                    gcslice(Prm["sao_vals"], 1)[comp].reshape(-1, 6),
                    h=ph_, w=pw_, ctu_w=cw_, ctu_h=ch_, w_ctu=w_ctu,
                    bd=bd, row0=r0, img_h=ih)
        # ---- ALF / CC-ALF ----
        out = list(planes)
        if alf_luma or alf_chroma or cc_on:
            ctu4 = ctu >> 2
            if alf_luma:
                cls, tr = _classify_dense(planes[0], hs, w, bd,
                                          vb_luma_h, vb_luma_pos)
                set4 = _expand_ctu(gcslice(Prm["set_ctu"]).reshape(-1),
                                   ctu4, ctu4, h4s, w4s, w_ctu)
                co4 = Prm["banks_co"][set4, tr, cls][:, :, :12]
                cl4 = Prm["banks_cl"][set4, tr, cls][:, :, :12]
                co = _rep4(co4, hs, w)
                cl = _rep4(cl4, hs, w)
                mask = _rep4(_expand_ctu(
                    gcslice(Prm["en_y"]).reshape(-1), ctu4, ctu4,
                    h4s, w4s, w_ctu), hs, w) != 0
                out[0] = alf_luma_fn(planes[0], co, cl, mask)
            if num_comp > 1 and (alf_chroma or cc_on):
                hc4, wc4 = (hcs + 3) >> 2, (wcs + 3) >> 2
                lc4w = (ctu // sub_w) >> 2
                lc4h = (ctu // sub_h) >> 2
                for k in range(2):
                    comp = 1 + k
                    if alf_chroma:
                        en4 = _expand_ctu(
                            gcslice(Prm["en_c"], 1)[k].reshape(-1),
                            lc4h, lc4w, hc4, wc4, w_ctu)
                        alt4 = _expand_ctu(
                            gcslice(Prm["alt_ctu"], 1)[k].reshape(-1),
                            lc4h, lc4w, hc4, wc4, w_ctu)
                        co4 = Prm["cbanks_co"][alt4][:, :, :6]
                        cl4 = Prm["cbanks_cl"][alt4][:, :, :6]
                        co = _rep4(co4, hcs, wcs)
                        cl = _rep4(cl4, hcs, wcs)
                        maskc = _rep4(en4, hcs, wcs) != 0
                        out[comp] = alf_chroma_fn(planes[comp], co, cl,
                                                  maskc)
                    if cc_on:
                        out[comp] = cc_fn(
                            planes[0], out[comp], Prm["cc_banks"],
                            gcslice(Prm["cc_ctu"], 1)[k].reshape(-1))
        # crop halo, restore frame dim
        res = [out[0][ctu: ctu + sh][None]]
        if num_comp > 1:
            res += [o[ctu_c: ctu_c + shc][None] for o in out[1:num_comp]]
        return tuple(res)

    return shard_fn


_CACHE: dict = {}


def _get_mapped(skey, mesh, axis):
    mkey = (skey, axis, tuple(mesh.devices.flat), mesh.axis_names)
    fn = _CACHE.get(mkey)
    if fn is None:
        from jax.experimental.shard_map import shard_map
        n_shards = mesh.shape[axis]
        (h_img, w, hc_img, wc, h_pad, sh, bd, ctu, sub_w, sub_h,
         num_comp, *_rest) = skey
        body = _shard_chain_core(skey, n_shards, axis)
        frame_ax = "frame" if "frame" in mesh.axis_names else None
        pspec = P(frame_ax, axis, None)
        in_specs = tuple([pspec] * num_comp + [P(frame_ax, None)])
        out_specs = tuple([pspec] * num_comp)
        fn = jax.jit(shard_map(body, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs))
        _CACHE[mkey] = fn
    return fn


def sharded_inputs(cs):
    """Host-side parameter assembly for the sharded chain (padded-grid
    variants of device_pipeline's packers)."""
    bd = cs.sps.bit_depth
    ctu = cs.sps.ctu_size
    w_ctu = cs.pps.pic_width_in_ctu
    db = _deblock_grid_inputs(cs)
    sao = _sao_inputs(cs)
    alf = _alf_inputs(cs, bd)
    return db, sao, alf


def _frame_inputs(cs, mesh, axis):
    """(skey, flat) for one picture: padded grids packed replicated."""
    bd = cs.sps.bit_depth
    ctu = cs.sps.ctu_size
    w_ctu = cs.pps.pic_width_in_ctu
    num_comp = cs.num_comp
    n = mesh.shape[axis]
    w, h_img = cs.comp_size[0]
    wc, hc_img = cs.comp_size[1] if num_comp > 1 else (1, 1)
    sh = -(-h_img // (n * ctu)) * ctu
    h_pad = n * sh
    c4 = ctu // 4

    db, sao, alf = sharded_inputs(cs)
    skey = (h_img, w, hc_img, wc, h_pad, sh, bd, ctu, cs.sub_w, cs.sub_h,
            num_comp, w_ctu, db is not None, len(cs.shs), sao is not None,
            bool(alf and alf["any"][0]), bool(alf and alf["any"][1]),
            bool(alf and alf["any"][2]),
            0 if not alf else alf["arrays"][5].shape[0],
            0 if not alf else alf["arrays"][7].shape[0],
            0 if not alf else alf["arrays"][9].shape[0])

    arrays = {}
    g4_img = h_img // 4
    g4_pad = h_pad // 4
    h_ctu = -(-h_img // ctu)
    gc_pad = h_pad // ctu
    if db is not None:
        for nm in ("db_y", "db_cb", "db_cr"):
            if nm in db:
                g = db[nm].astype(np.int32)  # [2, g4_img, w4]
                g = _pad_rows(g.transpose(1, 0, 2), c4,
                              g4_pad - g4_img + c4, 0).transpose(1, 0, 2)
                arrays[nm] = g
        if "db_si" in db:
            arrays["db_si"] = _pad_rows(db["db_si"].astype(np.int32),
                                        c4, g4_pad - g4_img + c4, 0)
        arrays["db_sltab"] = db["db_sltab"]
    if sao is not None:
        t = sao[0][:num_comp].reshape(num_comp, h_ctu, w_ctu)
        v = sao[1][:num_comp].reshape(num_comp, h_ctu, w_ctu, 6)
        arrays["sao_type"] = _pad_rows(
            t.transpose(1, 0, 2), 1, gc_pad - h_ctu + 1,
            255).transpose(1, 0, 2)
        arrays["sao_vals"] = _pad_rows(
            v.transpose(1, 0, 2, 3), 1, gc_pad - h_ctu + 1,
            0).transpose(1, 0, 2, 3)
    if alf is not None:
        names = ("en_y", "set_ctu", "en_c", "alt_ctu", "cc_ctu",
                 "banks_co", "banks_cl", "cbanks_co", "cbanks_cl",
                 "cc_banks")
        for nm, a in zip(names, alf["arrays"]):
            if nm in ("en_y", "set_ctu"):
                a = _pad_rows(a.reshape(h_ctu, w_ctu), 1,
                              gc_pad - h_ctu + 1, 0)
            elif nm in ("en_c", "alt_ctu", "cc_ctu"):
                a = _pad_rows(a.reshape(2, h_ctu, w_ctu).transpose(
                    1, 0, 2), 1, gc_pad - h_ctu + 1, 0).transpose(1, 0, 2)
            arrays[nm] = a
    return skey, _pack(skey, arrays)


def filter_frames_sharded(items, mesh, axis="row"):
    """Run the filter chain for `items` — a list of (cs, planes) from
    pictures with a common geometry (e.g. one GOP) — row-sharded over
    `mesh[axis]` and frame-sharded over the mesh's "frame" axis.  The
    number of frames must equal the frame-axis size (1 when absent).
    Returns filtered planes per frame, bit-exact vs the unsharded
    chain."""
    F = len(items)
    frame_ax = "frame" if "frame" in mesh.axis_names else None
    assert F == (mesh.shape[frame_ax] if frame_ax else 1), \
        "frame count must match the mesh's frame axis"
    per = [_frame_inputs(cs, mesh, axis) for cs, _ in items]
    skey = per[0][0]
    assert all(k == skey for k, _ in per), \
        "frames in one sharded batch must share the static config"
    (h_img, w, hc_img, wc, h_pad, sh, bd, ctu, sub_w, sub_h, num_comp,
     *_r) = skey

    def padf(p, hp):
        return np.pad(p, ((0, hp - p.shape[0]), (0, 0)), mode="edge")

    planes_b = []
    for comp in range(num_comp):
        hp = h_pad if comp == 0 else h_pad // sub_h
        planes_b.append(np.stack(
            [padf(np.asarray(planes[comp]), hp) for _, planes in items]))
    flat_b = np.stack([f for _, f in per])

    pspec = P(frame_ax, axis, None)
    args = [jax.device_put(p, NamedSharding(mesh, pspec))
            for p in planes_b]
    args.append(jax.device_put(np.ascontiguousarray(flat_b),
                               NamedSharding(mesh, P(frame_ax, None))))
    outs = _get_mapped(skey, mesh, axis)(*args)
    result = []
    for f in range(F):
        planes = [np.asarray(outs[0][f][:h_img])]
        if num_comp > 1:
            planes += [np.asarray(o[f][:hc_img]) for o in outs[1:]]
        result.append(planes)
    return result
