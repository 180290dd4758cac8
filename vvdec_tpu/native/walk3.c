/* Native CABAC syntax walk, part 3: CU dispatch, coding tree, partitioning
 * rules, and the Python session type.  #included by cabac.c after walk2.c.
 */

/* commit the CU into the picture maps (CodingStructure.add_cu) */
static void w_add_cu(Walk *ws, int ci)
{
    int32_t *cu = CRR(ws, ci);
    ws->counts[0] = ci + 1;
    if (cu[CU_HAS_LUMA]) {
        int x4a = cu[CU_X] >> 2, x4b = (cu[CU_X] + cu[CU_W]) >> 2;
        int y4a = cu[CU_Y] >> 2, y4b = (cu[CU_Y] + cu[CU_H]) >> 2;
        for (int y4 = y4a; y4 < y4b; y4++) {
            int32_t *cm = ws->cu_map + (size_t)y4 * ws->w4;
            int32_t *sm = ws->slice_map + (size_t)y4 * ws->w4;
            int8_t *qm = ws->qp_map + (size_t)y4 * ws->w4;
            for (int x4 = x4a; x4 < x4b; x4++) {
                cm[x4] = ci;
                sm[x4] = cu[CU_SLICE_IDX];
                qm[x4] = (int8_t)cu[CU_QP];
            }
        }
    }
    if (cu[CU_HAS_CHROMA] && ws->cu_map_c && cu[CU_TREE_TYPE] != W_TREE_L) {
        int x2a = cu[CU_CX] >> 1, x2b = (cu[CU_CX] + cu[CU_CW]) >> 1;
        int y2a = cu[CU_CY] >> 1, y2b = (cu[CU_CY] + cu[CU_CH]) >> 1;
        for (int y2 = y2a; y2 < y2b; y2++) {
            int32_t *cm = ws->cu_map_c + (size_t)y2 * ws->cw2;
            for (int x2 = x2a; x2 < x2b; x2++)
                cm[x2] = ci;
        }
    }
}

static int w_cu_skip_flag(Walk *ws, int32_t *cu, const WNode *node)
{
    Decoder *d = ws->dec;
    int ibc_ok = WPAR(ws, WP_IBC_EN) && cu[CU_W] <= 64 && cu[CU_H] <= 64;
    int cons_intra = node->mode_type == W_MT_INTRA;
    int cons_inter = node->mode_type == W_MT_INTER;
    if ((WPAR(ws, WP_IS_INTRA) || cons_intra) && ibc_ok) {
        int skip = dec_bin(d, CTX_SkipFlag
                                  + w_nb_flag2(ws, cu, -1, CU_SKIP, 1));
        if (skip) cu[CU_PRED_MODE] = W_MODE_IBC;
        return skip;
    }
    if (!ibc_ok && ((cu[CU_W] == 4 && cu[CU_H] == 4) || cons_intra))
        return 0;
    int skip = dec_bin(d, CTX_SkipFlag + w_nb_flag2(ws, cu, -1, CU_SKIP, 1));
    if (skip && ibc_ok && !cons_inter) {
        if (cu[CU_W] == 4 && cu[CU_H] == 4) {
            cu[CU_PRED_MODE] = W_MODE_IBC;
            return 1;
        }
        int ibc_ctx = w_nb_flag2(ws, cu, -1, CU_PRED_MODE, W_MODE_IBC);
        if (dec_bin(d, CTX_IBCFlag + ibc_ctx))
            cu[CU_PRED_MODE] = W_MODE_IBC;
    }
    return skip;
}

static void w_pred_mode_syntax(Walk *ws, int32_t *cu, const WNode *node)
{
    Decoder *d = ws->dec;
    if (node->mode_type == W_MT_INTER) {
        cu[CU_PRED_MODE] = W_MODE_INTER;
        return;
    }
    int ibc_allowed = 0;
    if (WPAR(ws, WP_IS_INTRA) || (cu[CU_W] == 4 && cu[CU_H] == 4)
        || node->mode_type == W_MT_INTRA) {
        ibc_allowed = 1;
        cu[CU_PRED_MODE] = W_MODE_INTRA;
    } else {
        int left, above;
        w_node_neighbors(ws, node, &left, &above);
        int ctx_pm =
            ((above >= 0 && CRR(ws, above)[CU_PRED_MODE] == W_MODE_INTRA)
             || (left >= 0 && CRR(ws, left)[CU_PRED_MODE] == W_MODE_INTRA))
                ? 1 : 0;
        if (dec_bin(d, CTX_PredMode + ctx_pm)) {
            cu[CU_PRED_MODE] = W_MODE_INTRA;
        } else {
            cu[CU_PRED_MODE] = W_MODE_INTER;
            ibc_allowed = 1;
        }
    }
    ibc_allowed = ibc_allowed && cu[CU_CH_TYPE] == 0 && WPAR(ws, WP_IBC_EN)
                  && cu[CU_W] <= 64 && cu[CU_H] <= 64;
    if (ibc_allowed) {
        int ibc_ctx = w_nb_flag2(ws, cu, -1, CU_PRED_MODE, W_MODE_IBC);
        if (dec_bin(d, CTX_IBCFlag + ibc_ctx))
            cu[CU_PRED_MODE] = W_MODE_IBC;
    }
}

static int w_code_cu(Walk *ws, const WNode *node)
{
    if (ws->counts[0] >= ws->cu_cap) {
        g_walk_err = "walk CU record capacity exceeded";
        return -1;
    }
    int ci = ws->counts[0];
    int32_t *cu = CRR(ws, ci);
    memset(cu, 0, sizeof(int32_t) * CU_NF);
    int sw = WPAR(ws, WP_SUB_W), sh = WPAR(ws, WP_SUB_H);
    cu[CU_X] = node->x; cu[CU_Y] = node->y;
    cu[CU_W] = node->w; cu[CU_H] = node->h;
    cu[CU_CX] = node->x / sw; cu[CU_CY] = node->y / sh;
    cu[CU_CW] = node->w / sw; cu[CU_CH] = node->h / sh;
    cu[CU_HAS_LUMA] = 1;
    cu[CU_HAS_CHROMA] = 1;
    cu[CU_CH_TYPE] = node->ch_type;
    cu[CU_TREE_TYPE] = node->tree_type;
    cu[CU_MODE_TYPE] = node->mode_type;
    cu[CU_QT_DEPTH] = node->qt_depth;
    cu[CU_MT_DEPTH] = node->mt_depth;
    cu[CU_DEPTH] = node->depth;
    cu[CU_PRED_MODE] = W_MODE_INTRA;
    cu[CU_INTRA_DIR0] = W_DC;
    cu[CU_INTRA_DIR1] = W_PLANAR;
    cu[CU_ROOT_CBF] = 1;
    cu[CU_REF0] = -1;
    cu[CU_REF1] = -1;
    cu[CU_GEO_IDX0] = 0;
    cu[CU_GEO_IDX1] = 1;
    cu[CU_SLICE_IDX] = WPAR(ws, WP_SLICE_IDX);
    cu[CU_TILE_IDX] = w_tile_at(ws, node->x, node->y);
    cu[CU_FIRST_TU] = ws->counts[1];
    cu[CU_NUM_TU] = 0;
    if (WPAR(ws, WP_DUAL_TREE) && node->tree_type == W_TREE_D)
        cu[CU_TREE_TYPE] = node->ch_type == 0 ? W_TREE_L : W_TREE_C;
    if (cu[CU_TREE_TYPE] == W_TREE_C) {
        cu[CU_HAS_LUMA] = 0;
        cu[CU_CH_TYPE] = 1;
    }
    if (cu[CU_TREE_TYPE] == W_TREE_L || WPAR(ws, WP_NUM_COMP) == 1)
        cu[CU_HAS_CHROMA] = 0;

    if (ws->qg_start) {
        ws->qg_start = 0;
        ws->state[0] = w_predict_qp(ws, cu, ws->state[0]);
    }
    cu[CU_QP] = ws->state[0];
    cu[CU_CHROMA_QP_ADJ] = ws->state[1];

    if (!WPAR(ws, WP_IS_INTRA) || WPAR(ws, WP_IBC_EN)) {
        int skip = 0;
        if (cu[CU_HAS_LUMA]) skip = w_cu_skip_flag(ws, cu, node);
        if (skip) {
            cu[CU_SKIP] = 1;
            cu[CU_MERGE_FLAG] = 1;
            if (cu[CU_PRED_MODE] != W_MODE_IBC)
                cu[CU_PRED_MODE] = W_MODE_INTER;
            w_add_cu(ws, ci);
            w_prediction_unit(ws, cu, ci);
            return w_add_empty_tus(ws, cu, ci, node);
        }
        w_pred_mode_syntax(ws, cu, node);
    } else {
        cu[CU_PRED_MODE] = W_MODE_INTRA;
    }

    w_add_cu(ws, ci);

    if (WPAR(ws, WP_ACT_EN)) {
        g_walk_err = "adaptive color transform not supported";
        return -1;
    }

    if (cu[CU_PRED_MODE] == W_MODE_INTRA) {
        if (cu[CU_CH_TYPE] == 0 && cu[CU_HAS_LUMA]) {
            w_bdpcm_mode(ws, cu, 0);
            w_intra_luma_pred_mode(ws, cu, ci);
        }
        if (cu[CU_HAS_CHROMA] && WPAR(ws, WP_NUM_COMP) > 1) {
            w_bdpcm_mode(ws, cu, 1);
            w_intra_chroma_pred_mode(ws, cu, node);
        }
    } else {
        w_prediction_unit(ws, cu, ci);
        if (!cu[CU_MERGE_FLAG]) {
            if (cu[CU_AFFINE])
                w_affine_amvr_mode(ws, cu);
            else
                w_amvr_mode(ws, cu);
            w_cu_bcw_flag(ws, cu);
        }
    }

    return w_cu_residual(ws, cu, ci, node);
}

/* ---------------- partitioning rules (partitioner.py can_split) -------- */
static void w_can_split(Walk *ws, const WNode *node, int allowed[8])
{
    int ch = node->ch_type;
    int base = ch == 0 ? WP_MIN_QT0 : WP_MIN_QT1;
    int min_qt = WPAR(ws, base + 0);
    int max_bt_depth = WPAR(ws, base + 1);
    int max_bt = WPAR(ws, base + 2);
    int max_tt = WPAR(ws, base + 3);
    int min_bt = WPAR(ws, base + 4);
    int min_tt = WPAR(ws, base + 5);
    int w = node->w, h = node->h;
    for (int i = 0; i < 8; i++) allowed[i] = 0;

    int can_btt = node->mt_depth < (max_bt_depth + node->impl_bt_depth);
    int has_ac = node->ch_type == 1;
    int acw = has_ac ? w / WPAR(ws, WP_SUB_W) : 0;
    int ach = has_ac ? h / WPAR(ws, WP_SUB_H) : 0;

    if (WPAR(ws, WP_DUAL_TREE) && node->ch_type == 0 && (w > 64 || h > 64)) {
        allowed[SP_QT] = 1;
        return;
    }
    if (node->tree_type == W_TREE_C) {
        allowed[SP_NONE] = 1;
        return;
    }

    int last = node->last_split;
    int tr_in = node->x + w <= WPAR(ws, WP_PIC_W);
    int bl_in = node->y + h <= WPAR(ws, WP_PIC_H);
    int implicit = !tr_in || !bl_in;

    int can_qt = 1;
    if (last != SP_CTU && last != SP_QT) can_qt = 0;
    if (w <= min_qt) can_qt = 0;
    if (has_ac && acw <= W_MIN_DT_CHROMA_W) can_qt = 0;

    if (implicit) {
        int bt_allowed = w <= max_bt && h <= max_bt && w <= W_MAX_TU_PROFILE
                         && h <= W_MAX_TU_PROFILE && can_btt;
        int can_bh = bt_allowed && !bl_in && (tr_in || !can_qt);
        int can_bv = bt_allowed && bl_in && !tr_in;
        if (has_ac && acw <= 4) can_bv = 0;
        can_qt = can_qt || !bt_allowed;
        can_qt = can_qt || (!can_bh && !can_bv);
        allowed[SP_QT] = can_qt;
        allowed[SP_BH] = can_bh;
        allowed[SP_BV] = can_bv;
        return;
    }

    can_btt = can_btt
              && (w > min_bt || h > min_bt || w > min_tt || h > min_tt);
    can_btt = can_btt && ((w <= max_bt && h <= max_bt)
                          || (w <= max_tt && h <= max_tt));
    if (!can_btt) {
        allowed[SP_NONE] = 1;
        allowed[SP_QT] = can_qt;
        return;
    }

    int allow_bt = node->mode_type != W_MT_INTER || w * h != 32;
    int allow_tt = node->mode_type != W_MT_INTER || w * h != 64;

    int can_bh = 1, can_bv = 1;
    if (w > max_bt || h > max_bt || !allow_bt) {
        can_bh = can_bv = 0;
    } else {
        if ((last == SP_TH || last == SP_TV) && node->part_idx == 1) {
            if (last == SP_TH) can_bh = 0;
            else can_bv = 0;
        }
        can_bh = can_bh && min_bt < h && h <= max_bt;
        can_bh = can_bh && (w <= W_MAX_TU_PROFILE || h > W_MAX_TU_PROFILE);
        can_bv = can_bv && min_bt < w && w <= max_bt;
        can_bv = can_bv && (w > W_MAX_TU_PROFILE || h <= W_MAX_TU_PROFILE);
    }

    int can_th = 1, can_tv = 1;
    if (w > max_tt || h > max_tt || !allow_tt || w > W_MAX_TU_PROFILE
        || h > W_MAX_TU_PROFILE) {
        can_th = can_tv = 0;
    } else {
        can_th = h > 2 * min_tt;
        can_tv = w > 2 * min_tt;
    }

    if (has_ac) {
        can_bh = can_bh && acw * ach > W_MIN_DT_CHROMA_SZ;
        can_th = can_th && acw * ach > W_MIN_DT_CHROMA_SZ * 2;
        can_bv = can_bv && acw * ach > W_MIN_DT_CHROMA_SZ && acw > 4;
        can_tv = can_tv && acw * ach > W_MIN_DT_CHROMA_SZ * 2 && acw > 8;
    }

    allowed[SP_NONE] = 1;
    allowed[SP_QT] = can_qt;
    allowed[SP_BH] = can_bh;
    allowed[SP_BV] = can_bv;
    allowed[SP_TH] = can_th;
    allowed[SP_TV] = can_tv;
}

static int w_split_cu_mode(Walk *ws, const WNode *node)
{
    Decoder *d = ws->dec;
    int allowed[8];
    w_can_split(ws, node, allowed);
    int can_no = allowed[SP_NONE];
    int can_qt = allowed[SP_QT];
    int can_bh = allowed[SP_BH], can_bv = allowed[SP_BV];
    int can_th = allowed[SP_TH], can_tv = allowed[SP_TV];

    int num_hor = can_bh + can_th;
    int num_ver = can_bv + can_tv;
    int num_split = (can_qt << 1) + num_hor + num_ver;
    int is_split = num_split != 0;
    if (can_no && !is_split) return SP_NONE;

    int left, above;
    w_node_neighbors(ws, node, &left, &above);
    int ch = node->tree_type == W_TREE_C ? 1 : node->ch_type;
    int wc = node->w / (ch ? WPAR(ws, WP_SUB_W) : 1);
    int hc = node->h / (ch ? WPAR(ws, WP_SUB_H) : 1);
    int lw = 0, lh = 0, aw = 0, ah = 0;
    if (left >= 0) {
        const int32_t *cl = CRR(ws, left);
        lw = ch ? cl[CU_CW] : cl[CU_W];
        lh = ch ? cl[CU_CH] : cl[CU_H];
    }
    if (above >= 0) {
        const int32_t *ca = CRR(ws, above);
        aw = ch ? ca[CU_CW] : ca[CU_W];
        ah = ch ? ca[CU_CH] : ca[CU_H];
    }
    (void)ah;

    if (can_no && is_split) {
        static const int ofs[7] = {0, 0, 0, 3, 3, 6, 6};
        int ctx_split = (left >= 0 && lh < hc) + (above >= 0 && aw < wc)
                        + ofs[num_split];
        is_split = dec_bin(d, CTX_SplitFlag + ctx_split);
    }
    if (!is_split) return SP_NONE;

    int can_btt = num_hor != 0 || num_ver != 0;
    int is_qt = can_qt;
    if (is_qt && can_btt) {
        int ctx_qt =
            (left >= 0 && CRR(ws, left)[CU_QT_DEPTH] > node->qt_depth)
            + (above >= 0 && CRR(ws, above)[CU_QT_DEPTH] > node->qt_depth)
            + (node->qt_depth < 2 ? 0 : 3);
        is_qt = dec_bin(d, CTX_SplitQtFlag + ctx_qt);
    }
    if (is_qt) return SP_QT;

    int can_hor = num_hor != 0;
    int is_ver = num_ver != 0;
    if (is_ver && can_hor) {
        int ctx_hv = 0;
        if (num_ver == num_hor) {
            if (left >= 0 && above >= 0) {
                int dep_above = wc >> w_ilog2(aw);
                int dep_left = hc >> w_ilog2(lh);
                ctx_hv = dep_above == dep_left ? 0
                                               : (dep_above < dep_left ? 1 : 2);
            }
        } else if (num_ver < num_hor) {
            ctx_hv = 3;
        } else {
            ctx_hv = 4;
        }
        is_ver = dec_bin(d, CTX_SplitHvFlag + ctx_hv);
    }

    int can14 = is_ver ? can_tv : can_th;
    int is12 = is_ver ? can_bv : can_bh;
    if (is12 && can14) {
        int ctx_12 = (node->mt_depth <= 1) + (is_ver ? 2 : 0);
        is12 = dec_bin(d, CTX_Split12Flag + ctx_12);
    }

    if (is_ver) return is12 ? SP_BV : SP_TV;
    return is12 ? SP_BH : SP_TH;
}

static int w_mode_constraint(Walk *ws, const WNode *node, int split)
{
    int fmt = WPAR(ws, WP_CHROMA_FMT);
    if (WPAR(ws, WP_DUAL_TREE) || node->mode_type != W_MT_ALL || fmt == 0
        || fmt == 3)
        return node->mode_type;
    int min_luma_area = node->w * node->h;
    if (split == SP_QT || split == SP_TH || split == SP_TV)
        min_luma_area >>= 2;
    else if (split == SP_BV || split == SP_BH)
        min_luma_area >>= 1;
    int min_chroma_blk =
        min_luma_area >> ((WPAR(ws, WP_SUB_W) - 1) + (WPAR(ws, WP_SUB_H) - 1));
    int cw = node->w / WPAR(ws, WP_SUB_W);
    int is_2xn = (cw == 4 && split == SP_BV) || (cw == 8 && split == SP_TV);
    if (min_chroma_blk >= 16 && !is_2xn) return node->mode_type;
    if (min_luma_area < 32 || WPAR(ws, WP_IS_INTRA)) return W_MT_INTRA;
    int left, above;
    w_node_neighbors(ws, node, &left, &above);
    int ctx_id = ((above >= 0 && CRR(ws, above)[CU_PRED_MODE] == W_MODE_INTRA)
                  || (left >= 0 && CRR(ws, left)[CU_PRED_MODE] == W_MODE_INTRA))
                     ? 1 : 0;
    int flag = dec_bin(ws->dec, CTX_ModeConsFlag + ctx_id);
    return flag ? W_MT_INTRA : W_MT_INTER;
}

static int w_coding_tree(Walk *ws, const WNode *node)
{
    int mode_type_parent = node->mode_type;

    if (WPAR(ws, WP_CU_QP_DELTA_EN) && node->subdiv <= WPAR(ws, WP_QG_SUBDIV)
        && node->ch_type == 0) {
        ws->qg_start = 1;
        ws->is_dqp_coded = 0;
    }
    if (WPAR(ws, WP_CQP_ADJ_EN)
        && node->subdiv <= WPAR(ws, WP_QG_C_SUBDIV)) {
        ws->is_cqp_adj_coded = 0;
        ws->state[1] = 0;
    }

    int split = w_split_cu_mode(ws, node);

    if (split != SP_NONE) {
        int child_mode_type = w_mode_constraint(ws, node, split);
        int chroma_not_split = mode_type_parent == W_MT_ALL
                               && child_mode_type == W_MT_INTRA;
        int tree_type = node->tree_type;
        if (tree_type == W_TREE_D)
            tree_type = chroma_not_split ? W_TREE_L : W_TREE_D;

        int implicit = !(node->x + node->w <= WPAR(ws, WP_PIC_W)
                         && node->y + node->h <= WPAR(ws, WP_PIC_H));
        WArea a = {node->x, node->y, node->w, node->h};
        WArea subs[4];
        int n = w_split_areas(a, split, 64, subs);
        for (int i = 0; i < n; i++) {
            if (subs[i].x < WPAR(ws, WP_PIC_W)
                && subs[i].y < WPAR(ws, WP_PIC_H)) {
                WNode child;
                wnode_child(node, &child, subs[i], split, i);
                child.mode_type = child_mode_type;
                child.tree_type = tree_type;
                if (implicit && (split == SP_BH || split == SP_BV))
                    child.impl_bt_depth = node->impl_bt_depth + 1;
                if (w_coding_tree(ws, &child)) return -1;
            }
        }

        if (chroma_not_split) {
            WNode cnode;
            memset(&cnode, 0, sizeof(cnode));
            cnode.x = node->x; cnode.y = node->y;
            cnode.w = node->w; cnode.h = node->h;
            cnode.ch_type = 1;
            cnode.tree_type = W_TREE_C;
            cnode.mode_type = child_mode_type;
            cnode.qt_depth = node->qt_depth;
            cnode.mt_depth = node->mt_depth;
            cnode.impl_bt_depth = node->impl_bt_depth;
            cnode.depth = node->depth;
            cnode.subdiv = node->subdiv;
            cnode.last_split = node->last_split;
            cnode.part_idx = node->part_idx;
            cnode.sh_len = 0;
            if (w_coding_tree(ws, &cnode)) return -1;
        }
        return 0;
    }

    return w_code_cu(ws, node);
}

static int w_dt_implicit_qt(Walk *ws, const WNode *nl, const WNode *nc)
{
    if (nl->w > 64) {
        if (WPAR(ws, WP_CU_QP_DELTA_EN)) {
            ws->qg_start = 1;
            ws->is_dqp_coded = 0;
        }
        WArea al = {nl->x, nl->y, nl->w, nl->h};
        WArea subs[4];
        w_split_areas(al, SP_QT, 64, subs);
        for (int i = 0; i < 4; i++) {
            if (subs[i].x < WPAR(ws, WP_PIC_W)
                && subs[i].y < WPAR(ws, WP_PIC_H)) {
                WNode cl, cc;
                wnode_child(nl, &cl, subs[i], SP_QT, i);
                wnode_child(nc, &cc, subs[i], SP_QT, i);
                if (w_dt_implicit_qt(ws, &cl, &cc)) return -1;
            }
        }
        return 0;
    }
    if (w_coding_tree(ws, nl)) return -1;
    return w_coding_tree(ws, nc);
}

static int w_ctu(Walk *ws, int cx, int cy)
{
    if (WPAR(ws, WP_SAO_LUMA) || WPAR(ws, WP_SAO_CHROMA))
        w_sao_ctu(ws, cx, cy);
    if (WPAR(ws, WP_ALF_EN0) || WPAR(ws, WP_ALF_EN1) || WPAR(ws, WP_ALF_EN2)
        || WPAR(ws, WP_CCALF_CB) || WPAR(ws, WP_CCALF_CR))
        w_alf_ctu(ws, cx, cy);

    WNode node;
    memset(&node, 0, sizeof(node));
    node.x = cx; node.y = cy;
    node.w = WPAR(ws, WP_CTU_SIZE); node.h = WPAR(ws, WP_CTU_SIZE);
    node.last_split = SP_CTU;
    if (WPAR(ws, WP_DUAL_TREE) && WPAR(ws, WP_CHROMA_FMT) != 0) {
        WNode node_c = node;
        node_c.ch_type = 1;
        return w_dt_implicit_qt(ws, &node, &node_c);
    }
    return w_coding_tree(ws, &node);
}

/* ================= Python session type ================= */

static void Walk_release_buffers(Walk *self)
{
    if (!self->bufs_ok) return;
    self->bufs_ok = 0;
    PyBuffer_Release(&self->b_params);
    PyBuffer_Release(&self->b_cu_map);
    PyBuffer_Release(&self->b_cu_map_c);
    PyBuffer_Release(&self->b_qp_map);
    PyBuffer_Release(&self->b_slice_map);
    PyBuffer_Release(&self->b_tile_map);
    PyBuffer_Release(&self->b_coef0);
    PyBuffer_Release(&self->b_coef1);
    PyBuffer_Release(&self->b_coef2);
    PyBuffer_Release(&self->b_cu_rec);
    PyBuffer_Release(&self->b_tu_rec);
    PyBuffer_Release(&self->b_counts);
    PyBuffer_Release(&self->b_sao);
    PyBuffer_Release(&self->b_alf);
    PyBuffer_Release(&self->b_flags);
    PyBuffer_Release(&self->b_cqp);
    PyBuffer_Release(&self->b_wp);
    PyBuffer_Release(&self->b_tcs);
    PyBuffer_Release(&self->b_state);
}

static void Walk_dealloc(Walk *self)
{
    Walk_release_buffers(self);
    Py_XDECREF(self->dec);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyObject *Walk_ctu(Walk *self, PyObject *args)
{
    int cx, cy;
    if (!PyArg_ParseTuple(args, "ii", &cx, &cy))
        return NULL;
    if (!self->bufs_ok) {
        PyErr_SetString(PyExc_ValueError, "walk session closed");
        return NULL;
    }
    int rc;
    g_walk_err = NULL;
    Py_BEGIN_ALLOW_THREADS
    rc = w_ctu(self, cx, cy);
    Py_END_ALLOW_THREADS
    if (rc) {
        if (!PyErr_Occurred())
            PyErr_SetString(PyExc_ValueError,
                            g_walk_err ? g_walk_err : "walk error");
        return NULL;
    }
    Py_RETURN_NONE;
}

static PyObject *Walk_close(Walk *self, PyObject *Py_UNUSED(ignored))
{
    Walk_release_buffers(self);
    Py_RETURN_NONE;
}

/* ctu_run(xy: int32[n,2] buffer, n, headroom) -> number of CTUs walked.
 * Walks consecutive CTUs under ONE GIL release (per-CTU release/acquire
 * convoys against a concurrent recon thread); stops early when the
 * CU/TU record headroom drops below `headroom` so the Python wrapper
 * can regrow the arrays and resume. */
static PyObject *Walk_ctu_run(Walk *self, PyObject *args)
{
    Py_buffer xy_buf;
    int n, headroom;
    if (!PyArg_ParseTuple(args, "y*ii", &xy_buf, &n, &headroom))
        return NULL;
    if (!self->bufs_ok) {
        PyBuffer_Release(&xy_buf);
        PyErr_SetString(PyExc_ValueError, "walk session closed");
        return NULL;
    }
    const int32_t *xy = (const int32_t *)xy_buf.buf;
    int done = 0, rc = 0;
    g_walk_err = NULL;
    Py_BEGIN_ALLOW_THREADS
    for (; done < n; done++) {
        if (self->counts[0] + headroom > self->cu_cap ||
            self->counts[1] + headroom > self->tu_cap)
            break;
        rc = w_ctu(self, xy[2 * done], xy[2 * done + 1]);
        if (rc)
            break;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&xy_buf);
    if (rc) {
        if (!PyErr_Occurred())
            PyErr_SetString(PyExc_ValueError,
                            g_walk_err ? g_walk_err : "walk error");
        return NULL;
    }
    return PyLong_FromLong(done);
}

static PyMethodDef Walk_methods[] = {
    {"ctu", (PyCFunction)Walk_ctu, METH_VARARGS,
     "decode one CTU's full syntax"},
    {"ctu_run", (PyCFunction)Walk_ctu_run, METH_VARARGS,
     "decode a run of CTUs under one GIL release"},
    {"close", (PyCFunction)Walk_close, METH_NOARGS,
     "release buffer views"},
    {NULL},
};

static PyTypeObject WalkType = {
    PyVarObject_HEAD_INIT(NULL, 0).tp_name = "_cabac.Walk",
    .tp_basicsize = sizeof(Walk),
    .tp_dealloc = (destructor)Walk_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_doc = "native CABAC syntax-walk session for one slice",
    .tp_methods = Walk_methods,
};

static int g_scan_ready = 0;

static PyObject *Decoder_walk_begin(Decoder *self, PyObject *args)
{
    if (!g_scan_ready) {
        if (w_scan_init()) {
            PyErr_NoMemory();
            return NULL;
        }
        g_scan_ready = 1;
    }
    Walk *ws = PyObject_New(Walk, &WalkType);
    if (!ws) return NULL;
    memset(((char *)ws) + sizeof(PyObject), 0,
           sizeof(Walk) - sizeof(PyObject));
    Py_INCREF(self);
    ws->dec = self;
    if (!PyArg_ParseTuple(
            args, "y*w*w*w*w*y*w*w*w*w*w*w*w*w*w*y*y*y*w*",
            &ws->b_params, &ws->b_cu_map, &ws->b_cu_map_c, &ws->b_qp_map,
            &ws->b_slice_map, &ws->b_tile_map, &ws->b_coef0, &ws->b_coef1,
            &ws->b_coef2, &ws->b_cu_rec, &ws->b_tu_rec, &ws->b_counts,
            &ws->b_sao, &ws->b_alf, &ws->b_flags, &ws->b_cqp, &ws->b_wp,
            &ws->b_tcs, &ws->b_state)) {
        ws->bufs_ok = 0;
        Py_DECREF(ws);
        return NULL;
    }
    ws->bufs_ok = 1;
    if (ws->b_params.len < (Py_ssize_t)(WP_COUNT * sizeof(int32_t))) {
        PyErr_SetString(PyExc_ValueError, "walk params too short");
        Py_DECREF(ws);
        return NULL;
    }
    memcpy(ws->P, ws->b_params.buf, WP_COUNT * sizeof(int32_t));
    ws->cu_map = (int32_t *)ws->b_cu_map.buf;
    ws->cu_map_c = WPAR(ws, WP_NUM_COMP) > 1 ? (int32_t *)ws->b_cu_map_c.buf
                                             : NULL;
    ws->qp_map = (int8_t *)ws->b_qp_map.buf;
    ws->slice_map = (int32_t *)ws->b_slice_map.buf;
    ws->tile_map = (int32_t *)ws->b_tile_map.buf;
    ws->coef[0] = (int32_t *)ws->b_coef0.buf;
    ws->coef[1] = (int32_t *)ws->b_coef1.buf;
    ws->coef[2] = (int32_t *)ws->b_coef2.buf;
    ws->cu_rec = (int32_t *)ws->b_cu_rec.buf;
    ws->tu_rec = (int32_t *)ws->b_tu_rec.buf;
    ws->counts = (int32_t *)ws->b_counts.buf;
    ws->sao_rec = (int32_t *)ws->b_sao.buf;
    ws->alf_rec = (int32_t *)ws->b_alf.buf;
    ws->ctu_flags = (int32_t *)ws->b_flags.buf;
    ws->cqp = (const int8_t *)ws->b_cqp.buf;
    ws->wp = (const uint8_t *)ws->b_wp.buf;
    ws->tcs = (const uint8_t *)ws->b_tcs.buf;
    ws->state = (int32_t *)ws->b_state.buf;
    ws->cu_cap = ws->b_cu_rec.len / (Py_ssize_t)(CU_NF * sizeof(int32_t));
    ws->tu_cap = ws->b_tu_rec.len / (Py_ssize_t)(TUF_NF * sizeof(int32_t));
    ws->w4 = WPAR(ws, WP_PIC_W) >> 2;
    ws->h4 = WPAR(ws, WP_PIC_H) >> 2;
    ws->cpw = WPAR(ws, WP_PIC_W) / WPAR(ws, WP_SUB_W);
    ws->cph = WPAR(ws, WP_PIC_H) / WPAR(ws, WP_SUB_H);
    ws->cw2 = ws->cpw >> 1;
    ws->ch2 = ws->cph >> 1;
    ws->coefw[0] = WPAR(ws, WP_PIC_W);
    ws->coefh[0] = WPAR(ws, WP_PIC_H);
    ws->coefw[1] = ws->coefw[2] = ws->cpw;
    ws->coefh[1] = ws->coefh[2] = ws->cph;
    ws->cqp_len = 64 + WPAR(ws, WP_QP_BD_OFFSET);
    ws->qg_start = 0;
    ws->is_dqp_coded = 0;
    ws->is_cqp_adj_coded = 0;
    return (PyObject *)ws;
}
