"""Numpy golden inter prediction: motion derivation + motion compensation.

Behavioral parity (re-designed, not ported):
  - merge list:   PU::getInterMergeCandidates (UnitTools.cpp:841),
                  PU::addMergeHMVPCand (:3770 region), pairwise/zero tail
  - AMVP list:    PU::fillMvpCand (:?), addMVPCandUnscaled, addAMVPHMVPCand
  - HMVP:         MotionHist::addMiToLut (MotionInfo.h:242); reset per CTU row
  - MV clip:      clipMvInPic (Mv.cpp:64)
  - MC filters:   InterpolationFilter::filter<N> (InterpolationFilter.cpp:556),
                  filterCopy (:424); bi average AreaBuf::addAvg (Buffer.cpp:441)

Scope: regular inter (no affine/SbTMVP/MMVD/GPM/CIIP/BCW/DMVR/BDOF); TMVP
optional off.  MVs stored in 1/16 luma sample units.
"""

from __future__ import annotations

import os

import numpy as np

from vvdec_tpu.frame.structure import CodingStructure, CodingUnit, MODE_INTER

_IF = np.load(os.path.join(os.path.dirname(__file__), "..", "ops",
                           "tables_if.npz"))
LUMA_IF = _IF["LUMA_IF"]      # [16][8]
CHROMA_IF = _IF["CHROMA_IF"]  # [32][4]

IF_INTERNAL_PREC = 14
IF_FILTER_PREC = 6
IF_INTERNAL_OFFS = 1 << (IF_INTERNAL_PREC - 1)
MAX_NUM_HMVP = 5
AMVP_MAX = 2
MAX_NUM_HMVP_AMVP = 4


class MotionHist:
    """History-based MVP table (regular inter)."""

    def __init__(self) -> None:
        self.lut: list[tuple] = []  # entries: (inter_dir, mv0, mv1, r0, r1)

    def reset(self) -> None:
        self.lut = []

    def add(self, mi: tuple) -> None:
        for i, e in enumerate(self.lut):
            if e == mi:
                del self.lut[i]
                break
        else:
            if len(self.lut) == MAX_NUM_HMVP:
                del self.lut[0]
        self.lut.append(mi)


def _mi_of(cu: CodingUnit) -> tuple:
    mv = cu.mv if cu.mv else [[0, 0], [0, 0]]
    return (cu.inter_dir, tuple(mv[0]), tuple(mv[1]),
            cu.ref_idx[0], cu.ref_idx[1])


def _nb(cs: CodingStructure, cu: CodingUnit, x: int, y: int):
    """Inter neighbor CU at luma pos (getCURestricted + isInter)."""
    if x < 0 or y < 0 or x >= cs.w or y >= cs.h:
        return None
    nb = cs.cu_at_restricted(x, y, cu, 0)
    if nb is None or nb.pred_mode != MODE_INTER or nb.idx >= cu.idx:
        return None
    return nb


def derive_merge(cs: CodingStructure, cu: CodingUnit, hist: MotionHist,
                 is_b: bool) -> list[tuple]:
    """Regular merge candidate list (full list; idx selection by caller).
    Each candidate: (inter_dir, mv0, mv1, ref0, ref1)."""
    max_cand = cs.sps.max_num_merge_cand
    cands: list[tuple] = []
    x, y, w, h = cu.x, cu.y, cu.w, cu.h

    def mi(nb):
        return _mi_of(nb)

    b1 = _nb(cs, cu, x + w - 1, y - 1)
    mi_b1 = mi(b1) if b1 else None
    if b1:
        cands.append(mi_b1)
    if len(cands) == max_cand:
        return cands
    a1 = _nb(cs, cu, x - 1, y + h - 1)
    mi_a1 = mi(a1) if a1 else None
    if a1 and (mi_b1 is None or mi_a1 != mi_b1):
        cands.append(mi_a1)
    if len(cands) == max_cand:
        return cands
    spatial_cnt_pos = len(cands)
    b0 = _nb(cs, cu, x + w, y - 1)
    if b0:
        mi_b0 = mi(b0)
        if mi_b1 is None or mi_b0 != mi_b1:
            cands.append(mi_b0)
        if len(cands) == max_cand:
            return cands
    a0 = _nb(cs, cu, x - 1, y + h)
    if a0:
        mi_a0 = mi(a0)
        if mi_a1 is None or mi_a0 != mi_a1:
            cands.append(mi_a0)
        if len(cands) == max_cand:
            return cands
    if len(cands) < 4:
        b2 = _nb(cs, cu, x - 1, y - 1)
        if b2:
            mi_b2 = mi(b2)
            if (mi_a1 is None or mi_b2 != mi_a1) and \
                    (mi_b1 is None or mi_b2 != mi_b1):
                cands.append(mi_b2)
        if len(cands) == max_cand:
            return cands

    if cs.ph.temporal_mvp_enabled and (w + h > 12):
        raise NotImplementedError("TMVP merge candidate")

    # HMVP (newest first), pruned vs the first spatial candidates
    if len(cands) != max_cand - 1:
        pruned = [False] * 8

        def similar(cand):
            for ui in range(spatial_cnt_pos):
                if pruned[ui]:
                    continue
                c = cands[ui]
                if c[0] == cand[0]:
                    if c[0] == 3:
                        same = c[1] == cand[1] and c[2] == cand[2] and \
                            c[3] == cand[3] and c[4] == cand[4]
                    else:
                        lst = c[0] - 1
                        same = c[1 + lst] == cand[1 + lst] and \
                            c[3 + lst] == cand[3 + lst]
                    if same:
                        pruned[ui] = True
                        return True
            return False

        for k, e in enumerate(reversed(hist.lut)):
            cand = e if is_b else (1, e[1], (0, 0), e[3], -1)
            if k + 1 > 2 or not similar(cand):
                cands.append(cand)
                if len(cands) == max_cand - 1:
                    break

    # pairwise average of the first two candidates
    if 1 < len(cands) < max_cand:
        inter_dir = 0
        mv_out = [(0, 0), (0, 0)]
        ref_out = [-1, -1]
        for lst in range(2 if is_b else 1):
            ri = cands[0][3 + lst]
            rj = cands[1][3 + lst]
            if ri < 0 and rj < 0:
                continue
            inter_dir += 1 << lst
            if ri >= 0 and rj >= 0:
                ax = cands[0][1 + lst][0] + cands[1][1 + lst][0]
                ay = cands[0][1 + lst][1] + cands[1][1 + lst][1]
                ax = (ax + 1 - (ax >= 0)) >> 1
                ay = (ay + 1 - (ay >= 0)) >> 1
                mv_out[lst] = (ax, ay)
                ref_out[lst] = ri
            elif ri >= 0:
                mv_out[lst] = cands[0][1 + lst]
                ref_out[lst] = ri
            else:
                mv_out[lst] = cands[1][1 + lst]
                ref_out[lst] = rj
        if inter_dir > 0:
            cands.append((inter_dir, mv_out[0], mv_out[1],
                          ref_out[0], ref_out[1]))

    # zero candidates
    n0 = cs.sh.num_ref_idx_active[0]
    n1 = cs.sh.num_ref_idx_active[1]
    n_ref = min(n0, n1) if is_b else n0
    r = 0
    refcnt = 0
    while len(cands) < max_cand:
        if is_b:
            cands.append((3, (0, 0), (0, 0), r, r))
        else:
            cands.append((1, (0, 0), (0, 0), r, -1))
        if refcnt == n_ref - 1:
            r = 0
        else:
            r += 1
            refcnt += 1
    return cands


def round_amvr(mv: tuple, shift: int = 2) -> tuple:
    """Round an internal-precision MV to the AMVR signalling grid
    (Mv::roundToPrecision + changePrecision, Mv.h:177): shift 2 for
    quarter-pel (imv 0)."""
    if shift == 0:
        return mv
    off = 1 << (shift - 1)
    out = []
    for v in mv:
        r = (v + off - 1) >> shift if v >= 0 else (v + off) >> shift
        out.append(r << shift)
    return tuple(out)


def fill_mvp(cs: CodingStructure, cu: CodingUnit, lst: int, ref_idx: int,
             hist: MotionHist) -> list[tuple]:
    """AMVP candidate pair (PU::fillMvpCand)."""
    cands: list[tuple] = []
    x, y, w, h = cu.x, cu.y, cu.w, cu.h
    cur_ref_poc = cs.ref_pocs[lst][ref_idx]

    def try_add(nx, ny):
        nb = _nb(cs, cu, nx, ny)
        if nb is None:
            return False
        for src in range(2):
            li = lst if src == 0 else 1 - lst
            nri = nb.ref_idx[li]
            if nri >= 0 and cur_ref_poc == cs.ref_pocs[li][nri]:
                cands.append(tuple(nb.mv[li]))
                return True
        return False

    # left: A0 (below-left) then A1 (left)
    if not try_add(x - 1, y + h):
        try_add(x - 1, y + h - 1)
    # above: B0, B1, B2
    if not try_add(x + w, y - 1):
        if not try_add(x + w - 1, y - 1):
            try_add(x - 1, y - 1)

    cands = [round_amvr(c) for c in cands]
    if len(cands) == 2 and cands[0] == cands[1]:
        cands.pop()
    if cs.ph.temporal_mvp_enabled and len(cands) < AMVP_MAX and (w + h > 12):
        raise NotImplementedError("TMVP AMVP candidate")
    if len(cands) < AMVP_MAX:
        for e in hist.lut[:MAX_NUM_HMVP_AMVP]:
            if len(cands) >= AMVP_MAX:
                break
            for src in range(2):
                li = lst if src == 0 else 1 - lst
                nri = e[3 + li]
                if nri >= 0 and cur_ref_poc == cs.ref_pocs[li][nri]:
                    cands.append(round_amvr(e[1 + li]))
                    if len(cands) >= AMVP_MAX:
                        break
    while len(cands) < AMVP_MAX:
        cands.append((0, 0))
    return cands[:AMVP_MAX]


def clip_mv(mv: tuple, x: int, y: int, cs: CodingStructure) -> tuple:
    """clipMvInPic (Mv.cpp:64); 1/16-pel units."""
    ctu = cs.sps.ctu_size
    hor_max = (cs.w + 8 - x - 1) << 4
    hor_min = (-ctu - 8 - x + 1) << 4
    ver_max = (cs.h + 8 - y - 1) << 4
    ver_min = (-ctu - 8 - y + 1) << 4
    return (min(hor_max, max(hor_min, mv[0])),
            min(ver_max, max(ver_min, mv[1])))


def _filter_1d(arr: np.ndarray, coeffs: np.ndarray, axis: int) -> np.ndarray:
    """N-tap FIR along axis; arr already includes the (N-1) extension."""
    n = len(coeffs)
    out = None
    for k in range(n):
        c = int(coeffs[k])
        if c == 0:
            continue
        sl = [slice(None)] * 2
        sl[axis] = slice(k, k + (arr.shape[axis] - n + 1))
        term = arr[tuple(sl)].astype(np.int64) * c
        out = term if out is None else out + term
    return out


def mc_block(ref: np.ndarray, x: int, y: int, w: int, h: int,
             mv: tuple, comp: int, bit_depth: int, sub: tuple[int, int],
             intermediate: bool) -> np.ndarray:
    """Motion-compensated prediction of one block.

    ref: reference plane (this component).  (x, y, w, h) in component coords.
    mv in 1/16 luma units.  intermediate=True returns the 14-bit signal for
    bi averaging; otherwise the clipped final prediction.
    """
    if comp == 0:
        frac_bits, taps, table = 4, 8, LUMA_IF
    else:
        frac_bits, taps = 4 + (sub[0] - 1), 4
        table = CHROMA_IF
    fx_bits = 4 + (sub[0] - 1) if comp else 4
    fy_bits = 4 + (sub[1] - 1) if comp else 4
    ix = mv[0] >> fx_bits
    iy = mv[1] >> fy_bits
    fx = mv[0] & ((1 << fx_bits) - 1)
    fy = mv[1] & ((1 << fy_bits) - 1)
    if comp:
        # chroma fraction index is in 1/32 units regardless of subsampling
        fx <<= (5 - fx_bits)
        fy <<= (5 - fy_bits)

    half = taps // 2 - 1
    x0 = x + ix - half
    y0 = y + iy - half
    # edge-extended reference window
    hh, ww = ref.shape
    xs = np.clip(np.arange(x0, x0 + w + taps - 1), 0, ww - 1)
    ys = np.clip(np.arange(y0, y0 + h + taps - 1), 0, hh - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int64)

    bd = bit_depth
    head = max(2, IF_INTERNAL_PREC - bd)

    if fx == 0 and fy == 0:
        blk = win[half: half + h, half: half + w]
        if intermediate:
            return (blk << head) - IF_INTERNAL_OFFS
        return blk

    if fx and fy:
        # pass 1 horizontal (isFirst, !isLast): shift = 6 - head,
        # offset = -IF_INTERNAL_OFFS << shift
        tmp = _filter_1d(win, table[fx], axis=1)    # [h+taps-1, w]
        s1 = IF_FILTER_PREC - head
        tmp = (tmp - (IF_INTERNAL_OFFS << s1)) >> s1
        blk = _filter_1d(tmp, table[fy], axis=0)    # [h, w]
        if intermediate:
            # pass 2 (!isFirst, !isLast): shift = 6, offset = 0
            return blk >> IF_FILTER_PREC
        # pass 2 (!isFirst, isLast): shift = 6 + head,
        # offset = (1 << (shift-1)) + (IF_INTERNAL_OFFS << 6)
        s2 = IF_FILTER_PREC + head
        off2 = (1 << (s2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
        out = (blk + off2) >> s2
        return np.clip(out, 0, (1 << bd) - 1)

    if fx:
        row = win[half: half + h, :]
        blk = _filter_1d(row, table[fx], axis=1)
    else:
        col = win[:, half: half + w]
        blk = _filter_1d(col, table[fy], axis=0)
    if intermediate:
        # single pass (isFirst, !isLast): shift = 6 - head,
        # offset = -IF_INTERNAL_OFFS << shift
        s = IF_FILTER_PREC - head
        return (blk - (IF_INTERNAL_OFFS << s)) >> s
    # single pass (isFirst, isLast): shift = 6, offset = 32
    s = IF_FILTER_PREC
    out = (blk + (1 << (s - 1))) >> s
    return np.clip(out, 0, (1 << bd) - 1)


def bi_average(a: np.ndarray, b: np.ndarray, bit_depth: int) -> np.ndarray:
    shift = max(2, IF_INTERNAL_PREC - bit_depth) + 1
    offset = (1 << (shift - 1)) + 2 * IF_INTERNAL_OFFS
    return np.clip((a + b + offset) >> shift, 0, (1 << bit_depth) - 1)
