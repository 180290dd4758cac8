/* Native CABAC syntax walk, part 2: TU syntax, intra/inter CU syntax, the
 * coding tree, and the Python session type.  #included by cabac.c right
 * after walk.c.  See walk.c for the parity notes.
 */

static int w_coding_tree(Walk *ws, const WNode *node);

/* ---------------- TU-level helpers ---------------- */
static void w_set_chroma_qp(Walk *ws, int32_t *tu, const int32_t *cu)
{
    if (WPAR(ws, WP_NUM_COMP) == 1 || tu[TUF_BW1] == 0) return;
    int qp_bd = WPAR(ws, WP_QP_BD_OFFSET);
    int base = cu[CU_QP];
    if (base < -qp_bd) base = -qp_bd;
    if (base > W_MAX_QP) base = W_MAX_QP;
    for (int i = 0; i < 2; i++) {
        int off, comp_idx;
        if (tu[TUF_JOINT_CBCR]) {
            off = WPAR(ws, WP_PPS_JOINT_QP_OFF) + WPAR(ws, WP_SH_JOINT_QP_OFF);
            comp_idx = 2;
        } else {
            off = (i == 0 ? WPAR(ws, WP_PPS_CB_QP_OFF) + WPAR(ws, WP_SH_CB_QP_OFF)
                          : WPAR(ws, WP_PPS_CR_QP_OFF) + WPAR(ws, WP_SH_CR_QP_OFF));
            comp_idx = i;
        }
        int mapped = ws->cqp[(size_t)comp_idx * ws->cqp_len + base + qp_bd];
        int qp = mapped + off;
        if (qp < -qp_bd) qp = -qp_bd;
        if (qp > W_MAX_QP) qp = W_MAX_QP;
        tu[TUF_CQP0 + i] = qp + qp_bd;
    }
}

static int w_cbf_comp(Walk *ws, const int32_t *cu, int comp, int prev_cbf,
                      int use_isp)
{
    int base = comp == 0 ? CTX_QtCbf0 : (comp == 1 ? CTX_QtCbf1 : CTX_QtCbf2);
    int inc;
    if ((comp == 0 && cu[CU_BDPCM]) || (comp != 0 && cu[CU_BDPCM_C]))
        inc = comp == 2 ? 2 : 1;
    else if (use_isp && comp == 0)
        inc = 2 + (prev_cbf ? 1 : 0);
    else if (comp == 2)
        inc = prev_cbf ? 1 : 0;
    else
        inc = 0;
    return dec_bin(ws->dec, base + inc);
}

static void w_cu_qp_delta(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    int pred_qp = cu[CU_QP];
    int dqp = w_unary_max_symbol(d, CTX_DeltaQP, CTX_DeltaQP + 1,
                                 W_CU_DQP_TU_CMAX);
    if (dqp >= W_CU_DQP_TU_CMAX) dqp += w_exp_golomb_eqprob(d, 0);
    if (dqp > 0 && dec_bin_ep(d)) dqp = -dqp;
    if (dqp != 0) {
        int qp_bd = WPAR(ws, WP_QP_BD_OFFSET);
        int m = (W_MAX_QP + 1) + qp_bd;
        long long v = (long long)pred_qp + dqp + (W_MAX_QP + 1) + 2 * qp_bd;
        v %= m;
        if (v < 0) v += m;
        cu[CU_QP] = (int)v - qp_bd;
    }
}

static void w_cu_chroma_qp_offset(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    int adj = dec_bin(d, CTX_ChromaQpAdjFlag);
    if (adj && WPAR(ws, WP_CQP_LIST_LEN) > 1)
        adj += w_unary_max_symbol(d, CTX_ChromaQpAdjIdc, CTX_ChromaQpAdjIdc,
                                  WPAR(ws, WP_CQP_LIST_LEN) - 1);
    cu[CU_CHROMA_QP_ADJ] = adj;
    ws->state[1] = adj;
}

static void w_joint_cb_cr(Walk *ws, int32_t *tu, const int32_t *cu,
                          int cbf_mask)
{
    if (!WPAR(ws, WP_JOINT_CBCR_EN)) return;
    if ((cu[CU_PRED_MODE] == W_MODE_INTRA && cbf_mask) || cbf_mask == 3) {
        if (dec_bin(ws->dec, CTX_JointCbCrFlag + cbf_mask - 1))
            tu[TUF_JOINT_CBCR] = cbf_mask;
    }
}

static int w_ts_allowed(Walk *ws, const int32_t *tu, const int32_t *cu,
                        int comp)
{
    if (!WPAR(ws, WP_TS_EN)) return 0;
    if (comp == 0 && cu[CU_BDPCM]) return 0;
    if (comp != 0 && cu[CU_BDPCM_C]) return 0;
    if ((cu[CU_ISP] && comp == 0) || cu[CU_SBT_INFO]) return 0;
    int max_ts = 1 << WPAR(ws, WP_LOG2_MAX_TS);
    int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
    return w <= max_ts && h <= max_ts;
}

static void w_ts_flag(Walk *ws, int32_t *tu, const int32_t *cu, int comp)
{
    int ts = ((cu[CU_BDPCM] && comp == 0) || (cu[CU_BDPCM_C] && comp != 0))
                 ? 1 : 0;
    int ctx_idx = comp == 0 ? 4 : 5;
    if (w_ts_allowed(ws, tu, cu, comp))
        ts = dec_bin(ws->dec, CTX_MTSIndex + ctx_idx);
    tu[TUF_MTS0 + comp] = ts ? W_MTS_SKIP : W_MTS_DCT2;
}

static void w_residual_coding(Walk *ws, int32_t *tu, const int32_t *cu,
                              int comp)
{
    if (comp == 2 && tu[TUF_JOINT_CBCR] == 3) return;
    w_ts_flag(ws, tu, cu, comp);
    if (tu[TUF_MTS0 + comp] == W_MTS_SKIP && !WPAR(ws, WP_TS_RC_DISABLED))
        w_residual_ts(ws, tu, cu, comp);
    else
        w_residual_reg(ws, tu, cu, comp);
}

/* append a fresh TU record; returns its index or -1 on overflow */
static int w_add_tu(Walk *ws, int32_t *cu, int cu_idx, int part_idx)
{
    if (ws->counts[1] >= ws->tu_cap) {
        g_walk_err = "walk TU record capacity exceeded";
        return -1;
    }
    int ti = ws->counts[1];
    int32_t *tu = TRR(ws, ti);
    memset(tu, 0, sizeof(int32_t) * TUF_NF);
    tu[TUF_CU_IDX] = cu_idx;
    tu[TUF_PART_IDX] = part_idx;
    ws->counts[1] = ti + 1;
    cu[CU_NUM_TU] += 1;
    return ti;
}

static void w_tu_set_blocks(Walk *ws, int32_t *tu, const int32_t *cu,
                            WArea a, int luma, int chroma)
{
    if (luma) {
        tu[TUF_BX0] = a.x; tu[TUF_BY0] = a.y;
        tu[TUF_BW0] = a.w; tu[TUF_BH0] = a.h;
    }
    if (chroma && WPAR(ws, WP_NUM_COMP) > 1) {
        int sw = WPAR(ws, WP_SUB_W), sh = WPAR(ws, WP_SUB_H);
        tu[TUF_BX1] = a.x / sw; tu[TUF_BY1] = a.y / sh;
        tu[TUF_BW1] = a.w / sw; tu[TUF_BH1] = a.h / sh;
        tu[TUF_BX2] = tu[TUF_BX1]; tu[TUF_BY2] = tu[TUF_BY1];
        tu[TUF_BW2] = tu[TUF_BW1]; tu[TUF_BH2] = tu[TUF_BH1];
    }
    (void)cu;
}

static int w_transform_unit(Walk *ws, int ti, int32_t *cu, int cu_idx,
                            const WNode *node, int isp_idx, int isp_n,
                            int sbt_no_resi)
{
    int32_t *tu = TRR(ws, ti);
    int cbf_cb = 0, cbf_cr = 0;
    int sep_tree = cu[CU_TREE_TYPE] != W_TREE_D;

    if (tu[TUF_BW1] != 0 && (!sep_tree || node->ch_type == 1)
        && !(cu[CU_SBT_INFO] && sbt_no_resi)) {
        cbf_cb = w_cbf_comp(ws, cu, 1, 0, 0);
        cbf_cr = w_cbf_comp(ws, cu, 2, cbf_cb, 0);
    }
    tu[TUF_CBF1] = cbf_cb;
    tu[TUF_CBF2] = cbf_cr;

    if (node->ch_type == 0 && tu[TUF_BW0] != 0) {
        if (cu[CU_SBT_INFO] && sbt_no_resi) {
            tu[TUF_CBF0] = 0;
        } else if (cu[CU_SBT_INFO] && !(cbf_cb || cbf_cr)) {
            tu[TUF_CBF0] = 1;
        } else if (cu[CU_PRED_MODE] != W_MODE_INTRA && node->tr_depth == 0
                   && !cu[CU_SBT_INFO] && !(cbf_cb || cbf_cr)) {
            tu[TUF_CBF0] = 1;
        } else if (cu[CU_ISP]) {
            int prev = 0;
            if (isp_idx > 0) prev = TRR(ws, ti - 1)[TUF_CBF0];
            int root_so_far = 0;
            for (int k = cu[CU_FIRST_TU]; k < ti; k++)
                if (TRR(ws, k)[TUF_CBF0]) { root_so_far = 1; break; }
            if (isp_idx == isp_n - 1 && !root_so_far)
                tu[TUF_CBF0] = 1;
            else
                tu[TUF_CBF0] = w_cbf_comp(ws, cu, 0, prev, 1);
        } else {
            tu[TUF_CBF0] = w_cbf_comp(ws, cu, 0, 0, 0);
        }
    }

    cu[CU_PCBF0] |= tu[TUF_CBF0];
    cu[CU_PCBF1] |= tu[TUF_CBF1];
    cu[CU_PCBF2] |= tu[TUF_CBF2];

    int luma_only = tu[TUF_BW1] == 0;
    int cbf_luma = tu[TUF_CBF0];
    int cbf_chroma = !luma_only && (cbf_cb || cbf_cr);

    if (cu[CU_W] > 64 || cu[CU_H] > 64 || cbf_luma || cbf_chroma) {
        if (WPAR(ws, WP_CU_QP_DELTA_EN) && !ws->is_dqp_coded) {
            if (!sep_tree || node->ch_type == 0) {
                w_cu_qp_delta(ws, cu);
                ws->state[0] = cu[CU_QP];
                ws->is_dqp_coded = 1;
                int qp = cu[CU_QP];
                for (int y4 = cu[CU_Y] >> 2; y4 < (cu[CU_Y] + cu[CU_H]) >> 2;
                     y4++)
                    memset(ws->qp_map + (size_t)y4 * ws->w4 + (cu[CU_X] >> 2),
                           (int8_t)qp,
                           (size_t)((cu[CU_X] + cu[CU_W]) >> 2)
                               - (cu[CU_X] >> 2));
            }
        }
        if ((!sep_tree || node->ch_type == 1) && WPAR(ws, WP_CQP_ADJ_EN)) {
            if ((cu[CU_W] > 64 || cu[CU_H] > 64 || cbf_chroma)
                && !ws->is_cqp_adj_coded) {
                w_cu_chroma_qp_offset(ws, cu);
                ws->is_cqp_adj_coded = 1;
            }
        }
        if (!luma_only) {
            w_joint_cb_cr(ws, tu, cu,
                          (tu[TUF_CBF1] ? 2 : 0) + (tu[TUF_CBF2] ? 1 : 0));
            if (tu[TUF_JOINT_CBCR]) {
                cu[CU_PCBF1] = 1;
                cu[CU_PCBF2] = 1;
            }
        }
        tu[TUF_QP] = cu[CU_QP];
        w_set_chroma_qp(ws, tu, cu);
        if (cbf_luma) w_residual_coding(ws, tu, cu, 0);
        if (!luma_only) {
            for (int comp = 1; comp < 3; comp++)
                if (tu[TUF_CBF0 + comp]) w_residual_coding(ws, tu, cu, comp);
        }
    } else {
        tu[TUF_QP] = cu[CU_QP];
        w_set_chroma_qp(ws, tu, cu);
    }
    return 0;
}

static int w_add_empty_tus(Walk *ws, int32_t *cu, int cu_idx,
                           const WNode *node)
{
    int max_tr = 1 << WPAR(ws, WP_LOG2_MAX_TB);
    WArea a = {node->x, node->y, node->w, node->h};
    WArea subs[16];
    int n = 1;
    subs[0] = a;
    if (a.w > max_tr || a.h > max_tr)
        n = w_split_areas(a, SP_TU, max_tr, subs);
    for (int i = 0; i < n; i++) {
        int ti = w_add_tu(ws, cu, cu_idx, i);
        if (ti < 0) return -1;
        int32_t *tu = TRR(ws, ti);
        w_tu_set_blocks(ws, tu, cu, subs[i], cu[CU_HAS_LUMA],
                        cu[CU_HAS_CHROMA]);
        tu[TUF_QP] = cu[CU_QP];
        w_set_chroma_qp(ws, tu, cu);
    }
    return 0;
}

static int w_isp_split_dim(int w, int h, int horizontal)
{
    int split = horizontal ? h : w;
    int non_split = horizontal ? w : h;
    int factor = non_split < 16 ? (16 >> w_ilog2(non_split)) : 1;
    int part = split >> 2;
    return part < factor ? factor : part;
}

static int w_can_use_isp(int w, int h, int max_tr)
{
    int not_enough = (w_ilog2(w) + w_ilog2(h)) <= 4;
    int too_large = w > max_tr || h > max_tr;
    return (!too_large && !not_enough) ? 4 : 0;
}

static int w_can_lfnst_isp(int w, int h, int isp_mode)
{
    if (isp_mode == 0) return 0;
    int tw, th;
    if (isp_mode == 1) {
        tw = w; th = w_isp_split_dim(w, h, 1);
    } else {
        tw = w_isp_split_dim(w, h, 0); th = h;
    }
    return tw >= 4 && th >= 4;
}

static int w_transform_tree(Walk *ws, int32_t *cu, int cu_idx,
                            const WNode *node)
{
    int max_tr = 1 << WPAR(ws, WP_LOG2_MAX_TB);
    WArea a = {node->x, node->y, node->w, node->h};
    if (cu[CU_SBT_INFO]) {
        int sbt_idx = cu[CU_SBT_INFO] & 0xF;
        int pos = (cu[CU_SBT_INFO] >> 4) & 3;
        int hor = sbt_idx == 2 || sbt_idx == 4;
        int quad = sbt_idx == 3 || sbt_idx == 4;
        WArea subs[2];
        if (hor) {
            int h0 = quad ? a.h / 4 : a.h / 2;
            int s0 = pos == 0 ? h0 : a.h - h0;
            subs[0] = (WArea){a.x, a.y, a.w, s0};
            subs[1] = (WArea){a.x, a.y + s0, a.w, a.h - s0};
        } else {
            int w0 = quad ? a.w / 4 : a.w / 2;
            int s0 = pos == 0 ? w0 : a.w - w0;
            subs[0] = (WArea){a.x, a.y, s0, a.h};
            subs[1] = (WArea){a.x + s0, a.y, a.w - s0, a.h};
        }
        for (int i = 0; i < 2; i++) {
            int ti = w_add_tu(ws, cu, cu_idx, i);
            if (ti < 0) return -1;
            int32_t *tu = TRR(ws, ti);
            w_tu_set_blocks(ws, tu, cu, subs[i], 1, cu[CU_HAS_CHROMA]);
            int no_resi = (pos == 0 && i == 1) || (pos == 1 && i == 0);
            if (w_transform_unit(ws, ti, cu, cu_idx, node, 0, 1, no_resi))
                return -1;
        }
        return 0;
    }
    if (cu[CU_ISP]) {
        int horiz = cu[CU_ISP] == 1;
        int dim = w_isp_split_dim(a.w, a.h, horiz);
        int n = (horiz ? a.h : a.w) / dim;
        for (int i = 0; i < n; i++) {
            int ti = w_add_tu(ws, cu, cu_idx, i);
            if (ti < 0) return -1;
            int32_t *tu = TRR(ws, ti);
            WArea strip = horiz ? (WArea){a.x, a.y + i * dim, a.w, dim}
                                : (WArea){a.x + i * dim, a.y, dim, a.h};
            tu[TUF_BX0] = strip.x; tu[TUF_BY0] = strip.y;
            tu[TUF_BW0] = strip.w; tu[TUF_BH0] = strip.h;
            if (i == n - 1 && cu[CU_HAS_CHROMA] && WPAR(ws, WP_NUM_COMP) > 1)
                w_tu_set_blocks(ws, tu, cu, a, 0, 1);
            if (w_transform_unit(ws, ti, cu, cu_idx, node, i, n, 0))
                return -1;
        }
        return 0;
    }
    if (a.w > max_tr || a.h > max_tr) {
        WArea subs[16];
        int n = w_split_areas(a, SP_TU, max_tr, subs);
        for (int i = 0; i < n; i++) {
            WNode child;
            wnode_child(node, &child, subs[i], SP_TU, i);
            child.part_idx = i;
            if (w_transform_tree(ws, cu, cu_idx, &child)) return -1;
        }
        return 0;
    }
    int ti = w_add_tu(ws, cu, cu_idx, node->part_idx);
    if (ti < 0) return -1;
    int32_t *tu = TRR(ws, ti);
    w_tu_set_blocks(ws, tu, cu, a, cu[CU_HAS_LUMA], cu[CU_HAS_CHROMA]);
    return w_transform_unit(ws, ti, cu, cu_idx, node, 0, 1, 0);
}

static int w_mts_allowed(Walk *ws, const int32_t *cu)
{
    if (!WPAR(ws, WP_MTS_EN)) return 0;
    int use = cu[CU_PRED_MODE] == W_MODE_INTRA ? WPAR(ws, WP_MTS_INTRA)
                                               : WPAR(ws, WP_MTS_INTER);
    return use && cu[CU_W] <= 32 && cu[CU_H] <= 32 && !cu[CU_SBT_INFO]
           && !cu[CU_ISP] && cu[CU_HAS_LUMA];
}

static void w_mts_idx(Walk *ws, int32_t *cu)
{
    if (cu[CU_NUM_TU] == 0) return;
    int32_t *tu0 = TRR(ws, cu[CU_FIRST_TU]);
    int mts = tu0[TUF_MTS0];
    if (w_mts_allowed(ws, cu) && !ws->viol_mts && ws->mts_last
        && cu[CU_LFNST] == 0 && mts != W_MTS_SKIP) {
        if (dec_bin(ws->dec, CTX_MTSIndex)) {
            mts = W_MTS_DST7_DST7;
            for (int i = 0; i < 3; i++) {
                int s = dec_bin(ws->dec, CTX_MTSIndex + 1 + i);
                mts += s;
                if (!s) break;
            }
        }
        tu0[TUF_MTS0] = mts;
    }
}

static void w_lfnst(Walk *ws, int32_t *cu)
{
    if (!WPAR(ws, WP_LFNST_EN) || cu[CU_PRED_MODE] != W_MODE_INTRA) return;
    int sep_tree = cu[CU_TREE_TYPE] != W_TREE_D;
    int ch_idx = (sep_tree && cu[CU_CH_TYPE] == 1) ? 1 : 0;
    if (cu[CU_ISP] && !w_can_lfnst_isp(cu[CU_W], cu[CU_H], cu[CU_ISP]))
        return;
    if (cu[CU_MIP_FLAG] && !(cu[CU_W] >= 16 && cu[CU_H] >= 16)) return;
    if (cu[CU_CH_TYPE] == 1 && w_min(cu[CU_CW], cu[CU_CH]) < 4) return;
    int lw, lh;
    if (ch_idx == 1) {
        lw = cu[CU_CW] * WPAR(ws, WP_SUB_W);
        lh = cu[CU_CH] * WPAR(ws, WP_SUB_H);
    } else {
        lw = cu[CU_W]; lh = cu[CU_H];
    }
    int max_tb = 1 << WPAR(ws, WP_LOG2_MAX_TB);
    if (lw > max_tb || lh > max_tb) return;
    int luma_flag = sep_tree ? (cu[CU_CH_TYPE] == 0) : 1;
    int chroma_flag = sep_tree ? (cu[CU_CH_TYPE] == 1) : 1;
    int nonzero_corner = (luma_flag && ws->viol_lfnst0)
                         || (chroma_flag && ws->viol_lfnst1);
    int is_tr_skip = 0;
    for (int k = cu[CU_FIRST_TU]; k < cu[CU_FIRST_TU] + cu[CU_NUM_TU]; k++) {
        const int32_t *tu = TRR(ws, k);
        for (int comp = 0; comp < 3; comp++)
            if (tu[TUF_BW0 + comp * 4] != 0 && tu[TUF_CBF0 + comp]
                && tu[TUF_MTS0 + comp] == W_MTS_SKIP)
                is_tr_skip = 1;
    }
    if (nonzero_corner || (!ws->lfnst_last && !cu[CU_ISP]) || is_tr_skip)
        return;
    int cctx = sep_tree ? 1 : 0;
    int idx = dec_bin(ws->dec, CTX_LFNSTIdx + cctx);
    if (idx) idx += dec_bin(ws->dec, CTX_LFNSTIdx + 2);
    cu[CU_LFNST] = idx;
}

static void w_sbt_mode(Walk *ws, int32_t *cu)
{
    if (!WPAR(ws, WP_SBT_EN) || cu[CU_PRED_MODE] != W_MODE_INTER
        || cu[CU_CIIP])
        return;
    int max_sbt = 1 << WPAR(ws, WP_LOG2_MAX_TB);
    int w = cu[CU_W], h = cu[CU_H];
    if (w > max_sbt || h > max_sbt) return;
    int ver_half = w >= 8, hor_half = h >= 8;
    int ver_quad = w >= 16, hor_quad = h >= 16;
    if (!ver_half && !hor_half) return;
    Decoder *d = ws->dec;
    if (!dec_bin(d, CTX_SbtFlag + (w * h <= 256 ? 1 : 0))) return;
    int quad = 0;
    if ((hor_half || ver_half) && (hor_quad || ver_quad))
        quad = dec_bin(d, CTX_SbtQuadFlag);
    int v_ok, h_ok;
    if (quad) {
        v_ok = ver_quad; h_ok = hor_quad;
    } else {
        v_ok = ver_half; h_ok = hor_half;
    }
    int hor;
    if (v_ok && h_ok) {
        int ctx_hv = w == h ? 0 : (w < h ? 1 : 2);
        hor = dec_bin(d, CTX_SbtHorFlag + ctx_hv);
    } else {
        hor = h_ok;
    }
    int idx = (hor ? 2 : 1) + (quad ? 2 : 0);
    int pos = dec_bin(d, CTX_SbtPosFlag);
    cu[CU_SBT_INFO] = idx | (pos << 4);
}

static int w_cu_residual(Walk *ws, int32_t *cu, int cu_idx,
                         const WNode *node)
{
    if (cu[CU_PRED_MODE] != W_MODE_INTRA) {
        int root_cbf = 1;
        if (!cu[CU_MERGE_FLAG]) root_cbf = dec_bin(ws->dec, CTX_QtRootCbf);
        cu[CU_ROOT_CBF] = root_cbf;
        if (root_cbf) w_sbt_mode(ws, cu);
        if (!root_cbf) return w_add_empty_tus(ws, cu, cu_idx, node);
    }
    cu[CU_ROOT_CBF] = 1;
    ws->viol_lfnst0 = ws->viol_lfnst1 = 0;
    ws->lfnst_last = 0;
    ws->viol_mts = 0;
    ws->mts_last = 0;
    if (w_transform_tree(ws, cu, cu_idx, node)) return -1;
    w_lfnst(ws, cu);
    w_mts_idx(ws, cu);
    cu[CU_ROOT_CBF] = cu[CU_PCBF0] || cu[CU_PCBF1] || cu[CU_PCBF2];
    return 0;
}

/* ---------------- intra syntax ---------------- */
static void w_get_intra_mpms(Walk *ws, const int32_t *cu, int cur_idx,
                             int mpm[6])
{
    int left_dir = W_PLANAR, above_dir = W_PLANAR;
    int li = w_cu_restricted(ws, cu[CU_X] - 1, cu[CU_Y] + cu[CU_H] - 1, cu,
                             cur_idx, 0);
    if (li >= 0) {
        const int32_t *cl = CRR(ws, li);
        if (cl[CU_PRED_MODE] == W_MODE_INTRA)
            left_dir = cl[CU_MIP_FLAG] ? W_PLANAR : cl[CU_INTRA_DIR0];
    }
    int ai = w_cu_restricted(ws, cu[CU_X] + cu[CU_W] - 1, cu[CU_Y] - 1, cu,
                             cur_idx, 0);
    int lg = WPAR(ws, WP_CTU_LOG2);
    if (ai >= 0) {
        const int32_t *ca = CRR(ws, ai);
        if (ca[CU_PRED_MODE] == W_MODE_INTRA
            && ((cu[CU_Y] - 1) >> lg) == (cu[CU_Y] >> lg)
            && (ca[CU_Y] >> lg) == (cu[CU_Y] >> lg))
            above_dir = ca[CU_MIP_FLAG] ? W_PLANAR : ca[CU_INTRA_DIR0];
    }
    int offset = W_NUM_LUMA - 6; /* 61 */
    int mod = offset + 3;        /* 64 */
    mpm[0] = W_PLANAR; mpm[1] = W_DC; mpm[2] = W_VER; mpm[3] = W_HOR;
    mpm[4] = W_VER - 4; mpm[5] = W_VER + 4;
    if (left_dir == above_dir) {
        if (left_dir > W_DC) {
            mpm[0] = W_PLANAR;
            mpm[1] = left_dir;
            mpm[2] = ((left_dir + offset) % mod) + 2;
            mpm[3] = ((left_dir - 1) % mod) + 2;
            mpm[4] = ((left_dir + offset - 1) % mod) + 2;
            mpm[5] = (left_dir % mod) + 2;
        }
    } else {
        if (left_dir > W_DC && above_dir > W_DC) {
            mpm[0] = W_PLANAR;
            mpm[1] = left_dir;
            mpm[2] = above_dir;
            int mx = mpm[1] > mpm[2] ? 1 : 2;
            int mn = mpm[1] > mpm[2] ? 2 : 1;
            int d = mpm[mx] - mpm[mn];
            if (d == 1) {
                mpm[3] = ((mpm[mn] + offset) % mod) + 2;
                mpm[4] = ((mpm[mx] - 1) % mod) + 2;
                mpm[5] = ((mpm[mn] + offset - 1) % mod) + 2;
            } else if (d >= 62) {
                mpm[3] = ((mpm[mn] - 1) % mod) + 2;
                mpm[4] = ((mpm[mx] + offset) % mod) + 2;
                mpm[5] = (mpm[mn] % mod) + 2;
            } else if (d == 2) {
                mpm[3] = ((mpm[mn] - 1) % mod) + 2;
                mpm[4] = ((mpm[mn] + offset) % mod) + 2;
                mpm[5] = ((mpm[mx] - 1) % mod) + 2;
            } else {
                mpm[3] = ((mpm[mn] + offset) % mod) + 2;
                mpm[4] = ((mpm[mn] - 1) % mod) + 2;
                mpm[5] = ((mpm[mx] + offset) % mod) + 2;
            }
        } else if (left_dir + above_dir >= 2) {
            mpm[0] = W_PLANAR;
            mpm[1] = left_dir > above_dir ? left_dir : above_dir;
            mpm[2] = ((mpm[1] + offset) % mod) + 2;
            mpm[3] = ((mpm[1] - 1) % mod) + 2;
            mpm[4] = ((mpm[1] + offset - 1) % mod) + 2;
            mpm[5] = (mpm[1] % mod) + 2;
        }
    }
}

static void w_bdpcm_mode(Walk *ws, int32_t *cu, int comp_ch)
{
    if (!WPAR(ws, WP_BDPCM_EN)) return;
    int max_ts = 1 << WPAR(ws, WP_LOG2_MAX_TS);
    int allowed;
    if (comp_ch == 0)
        allowed = cu[CU_W] <= max_ts && cu[CU_H] <= max_ts && cu[CU_HAS_LUMA];
    else
        allowed = cu[CU_CW] <= max_ts && cu[CU_CH] <= max_ts
                  && cu[CU_HAS_CHROMA];
    if (!allowed) return;
    int ctx_id = comp_ch == 0 ? 0 : 2;
    int mode = dec_bin(ws->dec, CTX_BDPCMMode + ctx_id);
    if (mode) mode += dec_bin(ws->dec, CTX_BDPCMMode + ctx_id + 1);
    if (comp_ch == 0) cu[CU_BDPCM] = mode;
    else cu[CU_BDPCM_C] = mode;
}

static void w_mip_flag(Walk *ws, int32_t *cu, int cur_idx)
{
    if (!WPAR(ws, WP_MIP_EN)) {
        cu[CU_MIP_FLAG] = 0;
        return;
    }
    int li = w_cu_restricted(ws, cu[CU_X] - 1, cu[CU_Y], cu, cur_idx, 0);
    int ai = w_cu_restricted(ws, cu[CU_X], cu[CU_Y] - 1, cu, cur_idx, 0);
    int ctx_id = (li >= 0 && CRR(ws, li)[CU_MIP_FLAG] ? 1 : 0)
                 + (ai >= 0 && CRR(ws, ai)[CU_MIP_FLAG] ? 1 : 0);
    if (cu[CU_W] > 2 * cu[CU_H] || cu[CU_H] > 2 * cu[CU_W]) ctx_id = 3;
    cu[CU_MIP_FLAG] = dec_bin(ws->dec, CTX_MipFlag + ctx_id);
}

static int w_num_mip_modes(int w, int h)
{
    if (w == 4 && h == 4) return 16;
    if (w == 4 || h == 4 || (w == 8 && h == 8)) return 8;
    return 6;
}

static void w_intra_luma_pred_mode(Walk *ws, int32_t *cu, int cur_idx)
{
    Decoder *d = ws->dec;
    if (cu[CU_BDPCM]) {
        cu[CU_INTRA_DIR0] = cu[CU_BDPCM] == 2 ? W_VER : W_HOR;
        return;
    }
    w_mip_flag(ws, cu, cur_idx);
    if (cu[CU_MIP_FLAG]) {
        cu[CU_MIP_TRANSPOSE] = dec_bin_ep(d);
        cu[CU_INTRA_DIR0] = w_trunc_bin(
            d, w_num_mip_modes(cu[CU_W], cu[CU_H]));
        return;
    }
    /* extend_ref_line */
    if (WPAR(ws, WP_MRL_EN) && (cu[CU_Y] & (WPAR(ws, WP_CTU_SIZE) - 1)) != 0) {
        int idx = 0;
        if (dec_bin(d, CTX_MultiRefLineIdx)) {
            idx = 1;
            if (dec_bin(d, CTX_MultiRefLineIdx + 1)) idx = 2;
        }
        cu[CU_MULTI_REF] = idx;
    }
    /* isp_mode */
    if (!cu[CU_MULTI_REF] && WPAR(ws, WP_ISP_EN)) {
        int allowed = w_can_use_isp(cu[CU_W], cu[CU_H],
                                    1 << WPAR(ws, WP_LOG2_MAX_TB));
        if (allowed != 0) {
            if (dec_bin(d, CTX_ISPMode)) {
                if (allowed == 1)
                    cu[CU_ISP] = 1;
                else if (allowed == 2)
                    cu[CU_ISP] = 2;
                else
                    cu[CU_ISP] = 1 + dec_bin(d, CTX_ISPMode + 1);
            }
        }
    }

    int mpm[6];
    w_get_intra_mpms(ws, cu, cur_idx, mpm);
    int mpm_flag;
    if (cu[CU_MULTI_REF])
        mpm_flag = 1;
    else
        mpm_flag = dec_bin(d, CTX_IPredMode0);
    if (mpm_flag) {
        int ctx_pl = cu[CU_ISP] == 0 ? 1 : 0;
        int idx;
        if (cu[CU_MULTI_REF] == 0)
            idx = dec_bin(d, CTX_IntraLumaPlanarFlag + ctx_pl);
        else
            idx = 1;
        if (idx)
            while (idx < 5 && dec_bin_ep(d))
                idx++;
        cu[CU_INTRA_DIR0] = mpm[idx];
    } else {
        int mode = w_trunc_bin(d, W_NUM_LUMA - W_NUM_MPM);
        int srt[6];
        memcpy(srt, mpm, sizeof(srt));
        for (int i = 1; i < 6; i++) {
            int v = srt[i], j = i - 1;
            while (j >= 0 && srt[j] > v) {
                srt[j + 1] = srt[j];
                j--;
            }
            srt[j + 1] = v;
        }
        for (int i = 0; i < 6; i++)
            if (mode >= srt[i]) mode++;
        cu[CU_INTRA_DIR0] = mode;
    }
}

static int w_co_located_luma_mode(Walk *ws, const int32_t *cu)
{
    const int32_t *src = cu;
    if (cu[CU_TREE_TYPE] == W_TREE_C || !cu[CU_HAS_LUMA]) {
        int lx = (cu[CU_CX] + (cu[CU_CW] >> 1)) * WPAR(ws, WP_SUB_W);
        int ly = (cu[CU_CY] + (cu[CU_CH] >> 1)) * WPAR(ws, WP_SUB_H);
        int li = w_cu_at(ws, lx, ly, 0);
        if (li < 0) return W_PLANAR;
        src = CRR(ws, li);
    }
    return src[CU_MIP_FLAG] ? W_PLANAR : src[CU_INTRA_DIR0];
}

static int w_check_cclm(Walk *ws, const int32_t *cu, const WNode *node)
{
    if (!WPAR(ws, WP_DUAL_TREE)) return 1;
    if (WPAR(ws, WP_CTU_SIZE) <= 32) return 1;
    int d64 = WPAR(ws, WP_CTU_SIZE) == 128 ? 1 : 0;
    int s1 = node->sh_len > d64 ? node->sh[d64] : SP_NONE;
    int s2 = node->sh_len > d64 + 1 ? node->sh[d64 + 1] : SP_NONE;
    int allow = s1 == SP_QT || (s1 == SP_BH && s2 == SP_BV) || s1 == SP_NONE
                || (s1 == SP_BH && s2 == SP_NONE);
    if (allow) {
        int li = w_cu_at(ws, cu[CU_CX] * WPAR(ws, WP_SUB_W),
                         cu[CU_CY] * WPAR(ws, WP_SUB_H), 0);
        if (li >= 0) {
            const int32_t *cl = CRR(ws, li);
            if (cl[CU_DEPTH] > d64 && cl[CU_QT_DEPTH] == d64)
                allow = 0;
            else if (cl[CU_DEPTH] == d64 && cl[CU_ISP])
                allow = 0;
        }
    }
    return allow;
}

static void w_intra_chroma_pred_mode(Walk *ws, int32_t *cu,
                                     const WNode *node)
{
    Decoder *d = ws->dec;
    if (cu[CU_BDPCM_C]) {
        cu[CU_INTRA_DIR1] = cu[CU_BDPCM_C] == 2 ? W_VER : W_HOR;
        return;
    }
    int cclm_on = WPAR(ws, WP_CCLM_EN) && w_check_cclm(ws, cu, node);
    if (cclm_on) {
        if (dec_bin(d, CTX_CclmModeFlag)) {
            int symbol = dec_bin(d, CTX_CclmModeIdx);
            if (symbol) symbol += dec_bin_ep(d);
            static const int lm_modes[3] = {W_LM, W_MDLM_L, W_MDLM_T};
            cu[CU_INTRA_DIR1] = lm_modes[symbol];
            return;
        }
    }
    if (dec_bin(d, CTX_IPredMode1) == 0) {
        cu[CU_INTRA_DIR1] = W_DM;
        return;
    }
    int modes[8] = {W_PLANAR, W_VER, W_HOR, W_DC, W_LM, W_MDLM_L, W_MDLM_T,
                    W_DM};
    int luma_mode = w_co_located_luma_mode(ws, cu);
    for (int i = 0; i < 4; i++) {
        if (luma_mode == modes[i]) {
            modes[i] = W_VDIA;
            break;
        }
    }
    int cand_id = (int)dec_bins_ep(d, 2);
    cu[CU_INTRA_DIR1] = modes[cand_id];
}

/* ---------------- inter syntax ---------------- */
static int w_nb_flag2(Walk *ws, const int32_t *cu, int cur_idx, int field,
                      int value)
{
    /* count of {left, above} neighbors whose rec[field] == value */
    int cnt = 0;
    int li = w_cu_restricted(ws, cu[CU_X] - 1, cu[CU_Y], cu, cur_idx, 0);
    if (li >= 0 && CRR(ws, li)[field] == value) cnt++;
    int ai = w_cu_restricted(ws, cu[CU_X], cu[CU_Y] - 1, cu, cur_idx, 0);
    if (ai >= 0 && CRR(ws, ai)[field] == value) cnt++;
    return cnt;
}

static void w_merge_idx(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    int n_minus1 = WPAR(ws, WP_MAX_MERGE) - 1;
    int idx = 0;
    if (n_minus1 > 0 && dec_bin(d, CTX_MergeIdx)) {
        idx = 1;
        while (idx < n_minus1 && dec_bin_ep(d))
            idx++;
    }
    cu[CU_MERGE_IDX] = idx;
}

static void w_ibc_merge_idx(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    int n_minus1 = WPAR(ws, WP_MAX_IBC_MERGE) - 1;
    int idx = 0;
    if (n_minus1 > 0 && dec_bin(d, CTX_MergeIdx)) {
        idx = 1;
        while (idx < n_minus1 && dec_bin_ep(d))
            idx++;
    }
    cu[CU_MERGE_IDX] = idx;
}

static void w_affine_merge_idx(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    int n_minus1 = WPAR(ws, WP_MAX_AFF_MERGE) - 1;
    int idx = 0;
    if (n_minus1 > 0 && dec_bin(d, CTX_AffMergeIdx)) {
        idx = 1;
        while (idx < n_minus1 && dec_bin_ep(d))
            idx++;
    }
    cu[CU_MERGE_IDX] = idx;
}

static void w_mmvd_merge_idx(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    int n_base = WPAR(ws, WP_MAX_MERGE) > 1 ? 1 : 0;
    int var0 = 0;
    if (n_base > 0 && dec_bin(d, CTX_MmvdMergeIdx)) var0 = 1;
    int var1 = 0;
    if (dec_bin(d, CTX_MmvdStepMvpIdx)) {
        var1 = 1;
        while (var1 < 7 && dec_bin_ep(d))
            var1++;
    }
    int var2 = 0;
    if (dec_bin_ep(d)) var2 += 2;
    if (dec_bin_ep(d)) var2 += 1;
    cu[CU_MMVD_IDX] = var0 * 32 + var1 * 4 + var2;
}

static void w_geo_merge_idx(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    cu[CU_GEO_DIR] = w_trunc_bin(d, 64);
    int n_minus2 = WPAR(ws, WP_MAX_GPM) - 2;
    int cand0 = 0;
    if (dec_bin(d, CTX_MergeIdx))
        cand0 = w_unary_max_eqprob(d, n_minus2) + 1;
    int cand1 = 0;
    if (n_minus2 > 0) {
        if (dec_bin(d, CTX_MergeIdx))
            cand1 = w_unary_max_eqprob(d, n_minus2 - 1) + 1;
    }
    cand1 += (cand1 >= cand0);
    cu[CU_GEO_IDX0] = cand0;
    cu[CU_GEO_IDX1] = cand1;
}

static void w_subblock_merge_flag(Walk *ws, int32_t *cu, int cur_idx)
{
    if (WPAR(ws, WP_IS_INTRA) || WPAR(ws, WP_MAX_AFF_MERGE) <= 0
        || cu[CU_W] < 8 || cu[CU_H] < 8)
        return;
    int ctx = w_nb_flag2(ws, cu, cur_idx, CU_AFFINE, 1);
    cu[CU_AFFINE] = dec_bin(ws->dec, CTX_SubblockMergeFlag + ctx);
}

static void w_merge_data(Walk *ws, int32_t *cu, int cur_idx)
{
    Decoder *d = ws->dec;
    if (cu[CU_PRED_MODE] == W_MODE_IBC) {
        w_ibc_merge_idx(ws, cu);
        return;
    }
    w_subblock_merge_flag(ws, cu, cur_idx);
    if (cu[CU_AFFINE]) {
        w_affine_merge_idx(ws, cu);
        return;
    }
    int w = cu[CU_W], h = cu[CU_H];
    int ciip_ok = WPAR(ws, WP_CIIP_EN) && !cu[CU_SKIP] && w < 128 && h < 128
                  && w * h >= 64;
    int geo_ok = WPAR(ws, WP_GPM_EN) && WPAR(ws, WP_IS_B) && w >= 8 && w <= 64
                 && h >= 8 && h <= 64 && w < 8 * h && h < 8 * w;
    int regular = 1;
    if (geo_ok || ciip_ok)
        regular = dec_bin(d, CTX_RegularMergeFlag + (cu[CU_SKIP] ? 0 : 1));
    if (!regular) {
        if (geo_ok && ciip_ok)
            cu[CU_CIIP] = dec_bin(d, CTX_CiipFlag);
        else if (ciip_ok)
            cu[CU_CIIP] = 1;
        if (cu[CU_CIIP]) {
            cu[CU_INTRA_DIR0] = W_PLANAR;
            cu[CU_INTRA_DIR1] = W_DM;
            w_merge_idx(ws, cu);
            return;
        }
        cu[CU_GEO] = 1;
        w_geo_merge_idx(ws, cu);
        return;
    }
    if (WPAR(ws, WP_MMVD_EN))
        cu[CU_MMVD_FLAG] = dec_bin(d, CTX_MmvdFlag);
    if (cu[CU_MMVD_FLAG])
        w_mmvd_merge_idx(ws, cu);
    else
        w_merge_idx(ws, cu);
}

static void w_inter_pred_idc(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    if (WPAR(ws, WP_IS_P)) {
        cu[CU_INTER_DIR] = 1;
        return;
    }
    int bipred_ok = !(cu[CU_W] + cu[CU_H] == 12);
    if (bipred_ok) {
        int ctx_id = 7 - ((w_ilog2(cu[CU_W]) + w_ilog2(cu[CU_H]) + 1) >> 1);
        if (dec_bin(d, CTX_InterDir + ctx_id)) {
            cu[CU_INTER_DIR] = 3;
            return;
        }
    }
    if (dec_bin(d, CTX_InterDir + 5)) {
        cu[CU_INTER_DIR] = 2;
        return;
    }
    cu[CU_INTER_DIR] = 1;
}

static int w_ref_idx(Walk *ws, int lst)
{
    Decoder *d = ws->dec;
    int num_ref = lst == 0 ? WPAR(ws, WP_NUM_REF0) : WPAR(ws, WP_NUM_REF1);
    if (num_ref <= 1) return 0;
    if (!dec_bin(d, CTX_RefPic)) return 0;
    if (num_ref <= 2 || !dec_bin(d, CTX_RefPic + 1)) return 1;
    int idx = 3;
    for (;;) {
        if (num_ref <= idx || !dec_bin_ep(d)) return idx - 1;
        idx++;
    }
}

static void w_mvd_coding(Walk *ws, int32_t *out /* [2] */)
{
    Decoder *d = ws->dec;
    int v[2];
    v[0] = dec_bin(d, CTX_Mvd);
    v[1] = dec_bin(d, CTX_Mvd);
    for (int i = 0; i < 2; i++)
        if (v[i]) v[i] += dec_bin(d, CTX_Mvd + 1);
    for (int i = 0; i < 2; i++) {
        int val = v[i];
        if (val) {
            if (val > 1)
                val += dec_rem_abs(d, 1, 0, 17);
            if (dec_bin_ep(d)) val = -val;
        }
        out[i] = val;
    }
}

static void w_affine_flag(Walk *ws, int32_t *cu, int cur_idx)
{
    if (!(WPAR(ws, WP_AFFINE_EN) && cu[CU_W] >= 16 && cu[CU_H] >= 16))
        return;
    int ctx = w_nb_flag2(ws, cu, cur_idx, CU_AFFINE, 1);
    cu[CU_AFFINE] = dec_bin(ws->dec, CTX_AffineFlag + ctx);
    if (cu[CU_AFFINE] && WPAR(ws, WP_AFFINE_6PARAM))
        cu[CU_AFF_TYPE] = dec_bin(ws->dec, CTX_AffineType);
}

static void w_smvd_mode(Walk *ws, int32_t *cu)
{
    cu[CU_SMVD] = 0;
    if (cu[CU_INTER_DIR] != 3 || cu[CU_AFFINE] || !WPAR(ws, WP_SMVD_EN)
        || WPAR(ws, WP_MVD_L1_ZERO))
        return;
    if (!WPAR(ws, WP_BI_DIR_PRED)) return;
    cu[CU_SMVD] = dec_bin(ws->dec, CTX_SmvdFlag);
}

static void w_prediction_unit(Walk *ws, int32_t *cu, int cur_idx)
{
    Decoder *d = ws->dec;
    if (cu[CU_SKIP])
        cu[CU_MERGE_FLAG] = 1;
    else
        cu[CU_MERGE_FLAG] = dec_bin(d, CTX_MergeFlag);
    cu[CU_REF0] = -1;
    cu[CU_REF1] = -1;
    if (cu[CU_MERGE_FLAG]) {
        w_merge_data(ws, cu, cur_idx);
        return;
    }
    if (cu[CU_PRED_MODE] == W_MODE_IBC) {
        cu[CU_INTER_DIR] = 1;
        w_mvd_coding(ws, cu + CU_MVD0X);
        if (WPAR(ws, WP_MAX_IBC_MERGE) == 1)
            cu[CU_MVP0] = 0;
        else
            cu[CU_MVP0] = dec_bin(d, CTX_MVPIdx);
        return;
    }
    w_inter_pred_idc(ws, cu);
    w_affine_flag(ws, cu, cur_idx);
    w_smvd_mode(ws, cu);
    if (cu[CU_INTER_DIR] != 2) {
        if (cu[CU_SMVD])
            cu[CU_REF0] = WPAR(ws, WP_SYM_REF0);
        else
            cu[CU_REF0] = w_ref_idx(ws, 0);
        w_mvd_coding(ws, cu + CU_MVD0X);
        if (cu[CU_AFFINE]) {
            w_mvd_coding(ws, cu + CU_MVDA00X);
            if (cu[CU_AFF_TYPE] == 1)
                w_mvd_coding(ws, cu + CU_MVDA01X);
        }
        cu[CU_MVP0] = dec_bin(d, CTX_MVPIdx);
    }
    if (cu[CU_INTER_DIR] != 1) {
        if (cu[CU_SMVD] != 1) {
            cu[CU_REF1] = w_ref_idx(ws, 1);
            if (WPAR(ws, WP_MVD_L1_ZERO) && cu[CU_INTER_DIR] == 3) {
                cu[CU_MVD1X] = 0;
                cu[CU_MVD1Y] = 0;
            } else {
                w_mvd_coding(ws, cu + CU_MVD1X);
                if (cu[CU_AFFINE]) {
                    w_mvd_coding(ws, cu + CU_MVDA10X);
                    if (cu[CU_AFF_TYPE] == 1)
                        w_mvd_coding(ws, cu + CU_MVDA11X);
                }
            }
        }
        cu[CU_MVP1] = dec_bin(d, CTX_MVPIdx);
    }
    if (cu[CU_SMVD]) {
        cu[CU_REF1] = WPAR(ws, WP_SYM_REF1);
        cu[CU_MVD1X] = -cu[CU_MVD0X];
        cu[CU_MVD1Y] = -cu[CU_MVD0Y];
    }
}

static void w_amvr_mode(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    if (!WPAR(ws, WP_AMVR_EN)) return;
    int has_mvd = 0;
    for (int lst = 0; lst < 2; lst++) {
        if (!(cu[CU_INTER_DIR] & (1 << lst))) continue;
        if (cu[CU_MVD0X + 2 * lst] != 0 || cu[CU_MVD0Y + 2 * lst] != 0)
            has_mvd = 1;
    }
    if (!has_mvd) return;
    if (cu[CU_PRED_MODE] == W_MODE_IBC) {
        int v = dec_bin(d, CTX_ImvFlag + 1);
        cu[CU_IMV] = v + 1;
        return;
    }
    int v = dec_bin(d, CTX_ImvFlag);
    if (!v) return;
    cu[CU_IMV] = 1;
    v = dec_bin(d, CTX_ImvFlag + 4);
    cu[CU_IMV] = v ? 1 : 3;
    if (v) {
        v = dec_bin(d, CTX_ImvFlag + 1);
        cu[CU_IMV] = v + 1;
    }
}

static void w_affine_amvr_mode(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    if (!WPAR(ws, WP_AFFINE_AMVR)) return;
    int has_mvd = 0;
    for (int lst = 0; lst < 2; lst++) {
        if (!(cu[CU_INTER_DIR] & (1 << lst))) continue;
        if (lst == 1 && WPAR(ws, WP_MVD_L1_ZERO) && cu[CU_INTER_DIR] == 3)
            continue;
        if (cu[CU_MVD0X + 2 * lst] != 0 || cu[CU_MVD0Y + 2 * lst] != 0)
            has_mvd = 1;
        int base = lst == 0 ? CU_MVDA00X : CU_MVDA10X;
        int ncp = 1 + cu[CU_AFF_TYPE];
        for (int cp = 0; cp < ncp; cp++)
            if (cu[base + 2 * cp] != 0 || cu[base + 2 * cp + 1] != 0)
                has_mvd = 1;
    }
    if (!has_mvd) return;
    int v = dec_bin(d, CTX_ImvFlag + 2);
    if (v) {
        v = dec_bin(d, CTX_ImvFlag + 3);
        v += 1;
    }
    cu[CU_IMV] = v;
}

static void w_cu_bcw_flag(Walk *ws, int32_t *cu)
{
    Decoder *d = ws->dec;
    if (!(WPAR(ws, WP_BCW_EN) && cu[CU_PRED_MODE] == W_MODE_INTER
          && cu[CU_INTER_DIR] == 3 && cu[CU_W] * cu[CU_H] >= 256
          && !WPAR(ws, WP_IS_P)))
        return;
    int r0 = cu[CU_REF0], r1 = cu[CU_REF1];
    if ((r0 >= 0 && r0 < 16 && ws->wp[r0])
        || (r1 >= 0 && r1 < 16 && ws->wp[16 + r1]))
        return;
    int num_bcw = WPAR(ws, WP_CHECK_LDC) ? 5 : 3;
    int idx = 0;
    if (dec_bin(d, CTX_BcwIdx)) {
        idx = 1;
        for (int ui = 0; ui < num_bcw - 2; ui++) {
            if (!dec_bin_ep(d)) break;
            idx++;
        }
    }
    static const int parsing_order[5] = {2, 3, 1, 4, 0};
    static const int intern_fwd[5] = {1, 2, 0, 3, 4};
    cu[CU_BCW] = intern_fwd[parsing_order[idx]];
}

/* ---------------- QP prediction ---------------- */
static int w_predict_qp(Walk *ws, const int32_t *cu, int prev_qp)
{
    int ch = cu[CU_CH_TYPE];
    int x, y, mask_w, mask_h;
    int ctu = WPAR(ws, WP_CTU_SIZE);
    if (ch == 1) {
        x = cu[CU_CX]; y = cu[CU_CY];
        mask_w = (ctu / WPAR(ws, WP_SUB_W)) - 1;
        mask_h = (ctu / WPAR(ws, WP_SUB_H)) - 1;
    } else {
        x = cu[CU_X]; y = cu[CU_Y];
        mask_w = mask_h = ctu - 1;
    }
    int ia = w_cu_at(ws, x, y - 1, ch);
    int il = w_cu_at(ws, x - 1, y, ch);
    int lx = x * (ch ? WPAR(ws, WP_SUB_W) : 1);
    int ctu_x = lx / ctu;
    int at_start = WPAR(ws, WP_NO_PIC_PARTITION) ? (ctu_x == 0)
                                                 : ws->tcs[ctu_x];
    if (at_start && !(x & mask_w) && !(y & mask_h) && ia >= 0) {
        const int32_t *ca = CRR(ws, ia);
        if (ca[CU_SLICE_IDX] == cu[CU_SLICE_IDX]
            && ca[CU_TILE_IDX] == cu[CU_TILE_IDX])
            return ca[CU_QP];
    }
    int a = ((y & mask_h) && ia >= 0) ? CRR(ws, ia)[CU_QP] : prev_qp;
    int b = ((x & mask_w) && il >= 0) ? CRR(ws, il)[CU_QP] : prev_qp;
    return (a + b + 1) >> 1;
}
