/* Native CABAC syntax walk: full decode-side coding-tree / CU / TU / residual
 * syntax for one CTU, operating on the Decoder arithmetic engine.
 *
 * This is the C port of the decode paths of vvdec_tpu/cabac/ctu_decoder.py
 * (which stays as the golden reference and the encoder).  Behavioral parity:
 * vvdec CABACReader (source/Lib/DecoderLib/CABACReader.cpp) — coding_tree_unit
 * :128, coding_tree :477, coding_unit :856, transform_unit :2148,
 * residual_coding :2362 — and Partitioner::canSplit (UnitPartitioner.cpp:281).
 *
 * Outputs: flat int32 CU/TU record arrays (materialized into Python objects
 * per slice by vvdec_tpu/cabac/native_walk.py), the whole-frame maps
 * (coefficient planes, cu/qp/slice maps) written in place, and per-CTU
 * SAO/ALF parameter records.
 *
 * This file is #included by cabac.c (single translation unit) so it can use
 * the static arithmetic-decoder inlines directly.
 */

/* ---------------- context offsets (ctx_tables.py CTX_OFFSETS) ----------- */
#define CTX_SplitFlag 0
#define CTX_SplitQtFlag 9
#define CTX_SplitHvFlag 15
#define CTX_Split12Flag 20
#define CTX_ModeConsFlag 24
#define CTX_SkipFlag 26
#define CTX_MergeFlag 29
#define CTX_RegularMergeFlag 30
#define CTX_MergeIdx 32
#define CTX_MmvdFlag 33
#define CTX_MmvdMergeIdx 34
#define CTX_MmvdStepMvpIdx 35
#define CTX_PredMode 36
#define CTX_MultiRefLineIdx 38
#define CTX_IPredMode0 40
#define CTX_IPredMode1 41
#define CTX_IntraLumaPlanarFlag 42
#define CTX_CclmModeFlag 44
#define CTX_CclmModeIdx 45
#define CTX_MipFlag 46
#define CTX_DeltaQP 50
#define CTX_InterDir 52
#define CTX_RefPic 58
#define CTX_SubblockMergeFlag 60
#define CTX_AffineFlag 63
#define CTX_AffineType 66
#define CTX_AffMergeIdx 67
#define CTX_BcwIdx 68
#define CTX_Mvd 69
#define CTX_BDPCMMode 71
#define CTX_QtRootCbf 75
#define CTX_QtCbf0 77
#define CTX_QtCbf1 81
#define CTX_QtCbf2 83
#define CTX_SigCoeffGroup0 86
#define CTX_SigCoeffGroup1 88
#define CTX_SigFlag0 90
#define CTX_SigFlag1 102
#define CTX_SigFlag2 110
#define CTX_SigFlag3 122
#define CTX_SigFlag4 130
#define CTX_SigFlag5 142
#define CTX_ParFlag0 150
#define CTX_ParFlag1 171
#define CTX_GtxFlag0 182
#define CTX_GtxFlag1 203
#define CTX_GtxFlag2 214
#define CTX_GtxFlag3 235
#define CTX_LastX0 246
#define CTX_LastX1 266
#define CTX_LastY0 269
#define CTX_LastY1 289
#define CTX_MVPIdx 292
#define CTX_SmvdFlag 293
#define CTX_SaoMergeFlag 294
#define CTX_SaoTypeIdx 295
#define CTX_LFNSTIdx 296
#define CTX_MTSIndex 303
#define CTX_ISPMode 309
#define CTX_SbtFlag 311
#define CTX_SbtQuadFlag 313
#define CTX_SbtHorFlag 314
#define CTX_SbtPosFlag 317
#define CTX_ChromaQpAdjFlag 318
#define CTX_ChromaQpAdjIdc 319
#define CTX_ImvFlag 320
#define CTX_ctbAlfFlag 325
#define CTX_ctbAlfAlternative 334
#define CTX_AlfUseTemporalFilt 336
#define CTX_CcAlfFilterControlFlag 337
#define CTX_CiipFlag 343
#define CTX_IBCFlag 344
#define CTX_JointCbCrFlag 347
#define CTX_TsSigCoeffGroup 350
#define CTX_TsSigFlag 353
#define CTX_TsParFlag 356
#define CTX_TsGtxFlag 357
#define CTX_TsLrg1Flag 362
#define CTX_TsResidualSign 366

/* ---------------- shared enums (mirrored in cabac/native_walk.py) ------- */
enum {
    WP_CTU_SIZE, WP_CTU_LOG2, WP_LOG2_MIN_CB, WP_LOG2_MAX_TB, WP_LOG2_MAX_TS,
    WP_CHROMA_FMT, WP_SUB_W, WP_SUB_H, WP_NUM_COMP, WP_PIC_W, WP_PIC_H,
    WP_PIC_W_CTU, WP_BIT_DEPTH, WP_QP_BD_OFFSET, WP_DUAL_TREE,
    WP_ENTROPY_SYNC,
    WP_IBC_EN, WP_MIP_EN, WP_MRL_EN, WP_ISP_EN, WP_CCLM_EN, WP_BDPCM_EN,
    WP_MTS_EN, WP_MTS_INTRA, WP_MTS_INTER, WP_LFNST_EN, WP_SBT_EN,
    WP_SMVD_EN, WP_AFFINE_EN, WP_AFFINE_6PARAM, WP_AFFINE_AMVR, WP_AMVR_EN,
    WP_MMVD_EN, WP_GPM_EN, WP_CIIP_EN, WP_BCW_EN, WP_JOINT_CBCR_EN,
    WP_TS_EN, WP_ACT_EN,
    WP_MAX_MERGE, WP_MAX_IBC_MERGE, WP_MAX_GPM, WP_MAX_AFF_MERGE,
    WP_MVD_L1_ZERO, WP_QG_SUBDIV, WP_QG_C_SUBDIV,
    WP_CU_QP_DELTA_EN, WP_NO_PIC_PARTITION,
    WP_IS_INTRA, WP_IS_P, WP_IS_B, WP_SLICE_IDX, WP_QP_Y,
    WP_NUM_REF0, WP_NUM_REF1,
    WP_DEP_QUANT, WP_SDH, WP_TS_RC_DISABLED, WP_CQP_ADJ_EN, WP_CQP_LIST_LEN,
    WP_SAO_LUMA, WP_SAO_CHROMA, WP_ALF_EN0, WP_ALF_EN1, WP_ALF_EN2,
    WP_CCALF_CB, WP_CCALF_CR, WP_NUM_ALF_APS, WP_ALF_N_ALTS,
    WP_CC_COUNT_CB, WP_CC_COUNT_CR,
    WP_CHECK_LDC, WP_BI_DIR_PRED, WP_SYM_REF0, WP_SYM_REF1,
    WP_PPS_CB_QP_OFF, WP_PPS_CR_QP_OFF, WP_PPS_JOINT_QP_OFF,
    WP_SH_CB_QP_OFF, WP_SH_CR_QP_OFF, WP_SH_JOINT_QP_OFF,
    WP_MIN_QT0, WP_MAX_BTD0, WP_MAX_BT0, WP_MAX_TT0, WP_MIN_BT0, WP_MIN_TT0,
    WP_MIN_CB0,
    WP_MIN_QT1, WP_MAX_BTD1, WP_MAX_BT1, WP_MAX_TT1, WP_MIN_BT1, WP_MIN_TT1,
    WP_MIN_CB1,
    WP_SAO_MAX_Q, WP_MAX_LOG2_TR_RANGE,
    WP_COUNT
};

enum {
    CU_X, CU_Y, CU_W, CU_H, CU_CX, CU_CY, CU_CW, CU_CH,
    CU_HAS_LUMA, CU_HAS_CHROMA, CU_CH_TYPE, CU_TREE_TYPE, CU_MODE_TYPE,
    CU_QT_DEPTH, CU_MT_DEPTH, CU_DEPTH, CU_PRED_MODE, CU_SKIP, CU_QP,
    CU_CHROMA_QP_ADJ, CU_INTRA_DIR0, CU_INTRA_DIR1, CU_BDPCM, CU_BDPCM_C,
    CU_MIP_FLAG, CU_MIP_TRANSPOSE, CU_MULTI_REF, CU_ISP, CU_LFNST,
    CU_ROOT_CBF, CU_PCBF0, CU_PCBF1, CU_PCBF2, CU_SBT_INFO,
    CU_MERGE_FLAG, CU_MERGE_IDX, CU_INTER_DIR,
    CU_MVD0X, CU_MVD0Y, CU_MVD1X, CU_MVD1Y,
    CU_MVDA00X, CU_MVDA00Y, CU_MVDA01X, CU_MVDA01Y,
    CU_MVDA10X, CU_MVDA10Y, CU_MVDA11X, CU_MVDA11Y,
    CU_REF0, CU_REF1, CU_MVP0, CU_MVP1, CU_SMVD, CU_MMVD_FLAG, CU_MMVD_IDX,
    CU_IMV, CU_BCW, CU_AFFINE, CU_AFF_TYPE, CU_CIIP, CU_GEO, CU_GEO_DIR,
    CU_GEO_IDX0, CU_GEO_IDX1, CU_SLICE_IDX, CU_TILE_IDX,
    CU_FIRST_TU, CU_NUM_TU,
    CU_NF
};

enum {
    TUF_CU_IDX, TUF_PART_IDX,
    TUF_BX0, TUF_BY0, TUF_BW0, TUF_BH0,
    TUF_BX1, TUF_BY1, TUF_BW1, TUF_BH1,
    TUF_BX2, TUF_BY2, TUF_BW2, TUF_BH2,
    TUF_CBF0, TUF_CBF1, TUF_CBF2,
    TUF_MTS0, TUF_MTS1, TUF_MTS2, TUF_JOINT_CBCR, TUF_QP, TUF_CQP0, TUF_CQP1,
    TUF_MSX0, TUF_MSX1, TUF_MSX2, TUF_MSY0, TUF_MSY1, TUF_MSY2,
    TUF_NF
};

/* prediction modes / tree types / mode types (frame/structure.py) */
#define W_MODE_INTER 0
#define W_MODE_INTRA 1
#define W_MODE_IBC 2
#define W_TREE_D 0
#define W_TREE_L 1
#define W_TREE_C 2
#define W_MT_ALL 0
#define W_MT_INTER 1
#define W_MT_INTRA 2
/* intra modes */
#define W_PLANAR 0
#define W_DC 1
#define W_HOR 18
#define W_VER 50
#define W_VDIA 66
#define W_NUM_LUMA 67
#define W_LM 67
#define W_MDLM_L 68
#define W_MDLM_T 69
#define W_DM 70
#define W_NUM_MPM 6
/* MTS */
#define W_MTS_DCT2 0
#define W_MTS_SKIP 1
#define W_MTS_DST7_DST7 2
/* splits (cabac/partitioner.py) */
#define SP_CTU 0
#define SP_QT 1
#define SP_BH 2
#define SP_BV 3
#define SP_TH 4
#define SP_TV 5
#define SP_NONE 6
#define SP_TU 7

#define W_MAX_QP 63
#define W_CU_DQP_TU_CMAX 5
#define W_DQ_TRANS 32040
#define W_MAX_TU_PROFILE 64
#define W_MIN_DT_CHROMA_W 4
#define W_MIN_DT_CHROMA_SZ 16

static const int8_t LAST_PREFIX_CTX_T[8] = {0, 0, 0, 3, 6, 10, 15, 21};

/* Deferred error message for GIL-released code paths: the hot walk /
 * recon loops run under Py_BEGIN_ALLOW_THREADS, so error sites record a
 * message here and the METH wrappers raise after re-acquiring the GIL. */
static _Thread_local const char *g_walk_err;

static inline int w_ilog2(int v) { return 31 - __builtin_clz((unsigned)v); }
static inline int w_min(int a, int b) { return a < b ? a : b; }
static inline int w_max(int a, int b) { return a > b ? a : b; }

/* sub-block (CG) log2 dims per TU log2 dims (rom.py log2_sbb_size) */
static const int8_t SBB_W[7][7] = {
    {0, 0, 0, 0, 0, 0, 0}, {1, 1, 1, 1, 1, 1, 1}, {2, 1, 2, 2, 2, 2, 2},
    {3, 3, 2, 2, 2, 2, 2}, {4, 3, 2, 2, 2, 2, 2}, {4, 3, 2, 2, 2, 2, 2},
    {4, 3, 2, 2, 2, 2, 2}};
static const int8_t SBB_H[7][7] = {
    {0, 1, 2, 3, 4, 4, 4}, {0, 1, 1, 3, 3, 3, 3}, {0, 1, 2, 2, 2, 2, 2},
    {0, 1, 2, 2, 2, 2, 2}, {0, 1, 2, 2, 2, 2, 2}, {0, 1, 2, 2, 2, 2, 2},
    {0, 1, 2, 2, 2, 2, 2}};

/* scan tables: grouped coefficient scan + CG scan, generated at first use */
static int32_t *g_wscan[7][7];    /* grouped scan for (log2w, log2h) */
static int32_t *g_wscan_cg[7][7]; /* CG scan (diag over group grid) */
static int32_t *g_wscan_inv[7][7]; /* blk_pos -> scan index (covered only) */

static void w_diag_scan(int w, int h, int32_t *out)
{
    int n = 0;
    for (int d = 0; d < w + h - 1; d++) {
        int y = d < h - 1 ? d : h - 1;
        while (y >= 0 && d - y < w) {
            out[n++] = y * w + (d - y);
            y--;
        }
    }
}

static int w_scan_init(void)
{
    for (int lw = 0; lw < 7; lw++) {
        for (int lh = 0; lh < 7; lh++) {
            int w = 1 << lw, h = 1 << lh;
            int lcw = SBB_W[lw][lh], lch = SBB_H[lw][lh];
            int gw = 1 << lcw, gh = 1 << lch;
            int wg = w_min(32, w) >> lcw, hg = w_min(32, h) >> lch;
            int32_t *cg = (int32_t *)malloc(sizeof(int32_t) * wg * hg);
            int32_t *sc = (int32_t *)malloc(sizeof(int32_t) * wg * hg * gw * gh);
            int32_t *sub = (int32_t *)malloc(sizeof(int32_t) * gw * gh);
            if (!cg || !sc || !sub) return -1;
            w_diag_scan(wg, hg, cg);
            /* cg holds group raster positions in the group grid */
            w_diag_scan(gw, gh, sub);
            int n = 0;
            for (int gi = 0; gi < wg * hg; gi++) {
                int gp = cg[gi];
                int gy = gp / wg, gx = gp - gy * wg;
                int ox = gx * gw, oy = gy * gh;
                for (int si = 0; si < gw * gh; si++) {
                    int sp = sub[si];
                    int sy = sp / gw, sx = sp - sy * gw;
                    sc[n++] = (oy + sy) * w + ox + sx;
                }
            }
            free(sub);
            int32_t *inv = (int32_t *)malloc(sizeof(int32_t) * w * h);
            if (!inv) return -1;
            for (int i = 0; i < w * h; i++) inv[i] = w * h - 1;
            for (int i = 0; i < wg * hg * gw * gh; i++) inv[sc[i]] = i;
            g_wscan[lw][lh] = sc;
            g_wscan_cg[lw][lh] = cg;
            g_wscan_inv[lw][lh] = inv;
        }
    }
    return 0;
}

/* ---------------- the walk session ---------------- */
typedef struct {
    PyObject_HEAD
    Decoder *dec; /* owned reference */
    int32_t P[WP_COUNT];
    Py_buffer b_params, b_cu_map, b_cu_map_c, b_qp_map, b_slice_map,
        b_tile_map, b_coef0, b_coef1, b_coef2, b_cu_rec, b_tu_rec, b_counts,
        b_sao, b_alf, b_flags, b_cqp, b_wp, b_tcs, b_state;
    int bufs_ok;
    int32_t *cu_map, *cu_map_c, *slice_map, *tile_map;
    int8_t *qp_map;
    int32_t *coef[3];
    int coefw[3], coefh[3];
    int32_t *cu_rec, *tu_rec, *counts, *sao_rec, *alf_rec, *ctu_flags,
        *state;
    Py_ssize_t cu_cap, tu_cap;
    const int8_t *cqp; /* [3][cqp_len] */
    int cqp_len;
    const uint8_t *wp;  /* [2][16] */
    const uint8_t *tcs; /* per ctu-x: tile-col-start */
    int w4, h4, cw2, ch2, cpw, cph; /* chroma comp dims */
    /* per-CU transient residual flags */
    int viol_lfnst0, viol_lfnst1, lfnst_last, viol_mts, mts_last;
    /* quant-group transients */
    int qg_start, is_dqp_coded, is_cqp_adj_coded;
} Walk;

#define WPAR(ws, i) ((ws)->P[(i)])
#define CRR(ws, idx) ((ws)->cu_rec + (size_t)(idx) * CU_NF)
#define TRR(ws, idx) ((ws)->tu_rec + (size_t)(idx) * TUF_NF)

typedef struct {
    int x, y, w, h;
    int ch_type, tree_type, mode_type;
    int qt_depth, mt_depth, impl_bt_depth, tr_depth, depth, subdiv;
    int last_split, part_idx;
    int sh_len;
    int8_t sh[4]; /* first entries of the split history (CCLM check) */
} WNode;

typedef struct { int x, y, w, h; } WArea;

static void wnode_child(const WNode *p, WNode *c, WArea a, int split, int idx)
{
    *c = *p;
    c->x = a.x; c->y = a.y; c->w = a.w; c->h = a.h;
    c->qt_depth = p->qt_depth + (split == SP_QT);
    c->mt_depth = p->mt_depth + (split >= SP_BH && split <= SP_TV);
    c->tr_depth = p->tr_depth + (split == SP_TU);
    c->depth = p->depth + 1;
    if (split == SP_QT)
        c->subdiv = p->subdiv + 2;
    else if (split == SP_BH || split == SP_BV)
        c->subdiv = p->subdiv + 1;
    else if (split == SP_TH || split == SP_TV)
        c->subdiv = p->subdiv + (idx == 1 ? 1 : 2);
    else
        c->subdiv = p->subdiv;
    c->last_split = split;
    c->part_idx = idx;
    if (split != SP_TU && p->sh_len < 4) {
        c->sh[p->sh_len] = (int8_t)split;
        c->sh_len = p->sh_len + 1;
    }
}

static int w_split_areas(WArea a, int split, int max_tr, WArea *out)
{
    int x = a.x, y = a.y, w = a.w, h = a.h;
    switch (split) {
    case SP_QT: {
        int hw = w >> 1, hh = h >> 1;
        out[0] = (WArea){x, y, hw, hh};
        out[1] = (WArea){x + hw, y, hw, hh};
        out[2] = (WArea){x, y + hh, hw, hh};
        out[3] = (WArea){x + hw, y + hh, hw, hh};
        return 4;
    }
    case SP_BH: {
        int hh = h >> 1;
        out[0] = (WArea){x, y, w, hh};
        out[1] = (WArea){x, y + hh, w, hh};
        return 2;
    }
    case SP_BV: {
        int hw = w >> 1;
        out[0] = (WArea){x, y, hw, h};
        out[1] = (WArea){x + hw, y, hw, h};
        return 2;
    }
    case SP_TH: {
        int q = h >> 2;
        out[0] = (WArea){x, y, w, q};
        out[1] = (WArea){x, y + q, w, h >> 1};
        out[2] = (WArea){x, y + 3 * q, w, q};
        return 3;
    }
    case SP_TV: {
        int q = w >> 2;
        out[0] = (WArea){x, y, q, h};
        out[1] = (WArea){x + q, y, w >> 1, h};
        out[2] = (WArea){x + 3 * q, y, q, h};
        return 3;
    }
    case SP_TU: {
        int tw = w / max_tr; if (tw < 1) tw = 1;
        int th = h / max_tr; if (th < 1) th = 1;
        int pw = w / tw, ph = h / th;
        /* z-scan over the tile grid (rom.py z_scan_order) */
        int n = 0;
        int coords[16][2];
        for (int ty = 0; ty < th; ty++)
            for (int tx = 0; tx < tw; tx++) {
                coords[n][0] = tx; coords[n][1] = ty; n++;
            }
        /* sort by interleave(y)<<1 | interleave(x) — n <= 16: insertion */
        for (int i = 1; i < n; i++) {
            int cx = coords[i][0], cy = coords[i][1];
            unsigned key = 0;
            for (int b = 0; b < 4; b++)
                key |= (((cy >> b) & 1) << (2 * b + 1))
                       | (((cx >> b) & 1) << (2 * b));
            int j = i - 1;
            while (j >= 0) {
                unsigned kj = 0;
                for (int b = 0; b < 4; b++)
                    kj |= (((coords[j][1] >> b) & 1) << (2 * b + 1))
                          | (((coords[j][0] >> b) & 1) << (2 * b));
                if (kj <= key) break;
                coords[j + 1][0] = coords[j][0];
                coords[j + 1][1] = coords[j][1];
                j--;
            }
            coords[j + 1][0] = cx; coords[j + 1][1] = cy;
        }
        for (int i = 0; i < n; i++)
            out[i] = (WArea){x + coords[i][0] * pw, y + coords[i][1] * ph,
                             pw, ph};
        return n;
    }
    }
    return 0;
}

/* ---------------- neighbor / map queries ---------------- */
static inline int w_cu_at(Walk *ws, int x, int y, int ch)
{
    if (x < 0 || y < 0) return -1;
    if (ch == 0) {
        if (x >= WPAR(ws, WP_PIC_W) || y >= WPAR(ws, WP_PIC_H)) return -1;
        return ws->cu_map[(size_t)(y >> 2) * ws->w4 + (x >> 2)];
    }
    if (!ws->cu_map_c) return -1;
    if (x >= ws->cpw || y >= ws->cph) return -1;
    return ws->cu_map_c[(size_t)(y >> 1) * ws->cw2 + (x >> 1)];
}

static inline int w_tile_at(Walk *ws, int x, int y)
{
    if (WPAR(ws, WP_NO_PIC_PARTITION)) return 0;
    int y4 = y >> 2; if (y4 > ws->h4 - 1) y4 = ws->h4 - 1;
    int x4 = x >> 2; if (x4 > ws->w4 - 1) x4 = ws->w4 - 1;
    return ws->tile_map[(size_t)y4 * ws->w4 + x4];
}

/* cu_at_restricted (structure.py:260): cur described by its rec + cur_idx
 * (-1 while the CU is still being parsed). */
static int w_cu_restricted(Walk *ws, int x, int y, const int32_t *cur,
                           int cur_idx, int ch)
{
    int idx = w_cu_at(ws, x, y, ch);
    if (idx < 0) return -1;
    const int32_t *cr = CRR(ws, idx);
    if (cr[CU_SLICE_IDX] != cur[CU_SLICE_IDX]
        || cr[CU_TILE_IDX] != cur[CU_TILE_IDX])
        return -1;
    int ctu_log2 = WPAR(ws, WP_CTU_LOG2);
    int sh, cx, cy;
    if (ch == 0) {
        sh = ctu_log2; cx = cur[CU_X]; cy = cur[CU_Y];
    } else {
        sh = ctu_log2 - (WPAR(ws, WP_SUB_W) - 1);
        cx = cur[CU_CX]; cy = cur[CU_CY];
    }
    int ysh = ctu_log2 - (ch ? (WPAR(ws, WP_SUB_H) - 1) : 0);
    int xdiff = (x >> sh) - (cx >> sh);
    int ydiff = (y >> ysh) - (cy >> ysh);
    if (ydiff == 0 && xdiff == 0) {
        if (cur_idx >= 0 && idx > cur_idx) return -1;
    } else if (ydiff > 0 || (ydiff == 0 && xdiff > 0)
               || xdiff > (WPAR(ws, WP_ENTROPY_SYNC) ? 0 : 1)) {
        return -1;
    }
    return idx;
}

/* node-level neighbors for split/mode-constraint context */
static void w_node_neighbors(Walk *ws, const WNode *node, int *left,
                             int *above)
{
    int ch = (node->tree_type == W_TREE_C) ? 1 : node->ch_type;
    int x, y;
    if (ch == 1) {
        x = node->x / WPAR(ws, WP_SUB_W);
        y = node->y / WPAR(ws, WP_SUB_H);
    } else {
        x = node->x; y = node->y;
    }
    int tile = w_tile_at(ws, node->x, node->y);
    int cand[2] = {-1, -1};
    int qx[2] = {x - 1, x}, qy[2] = {y, y - 1};
    for (int i = 0; i < 2; i++) {
        int idx = w_cu_at(ws, qx[i], qy[i], ch);
        if (idx < 0) continue;
        const int32_t *cr = CRR(ws, idx);
        if (cr[CU_SLICE_IDX] != WPAR(ws, WP_SLICE_IDX)) continue;
        if (!WPAR(ws, WP_NO_PIC_PARTITION)) {
            int lx = qx[i] * (ch ? WPAR(ws, WP_SUB_W) : 1);
            int ly = qy[i] * (ch ? WPAR(ws, WP_SUB_H) : 1);
            if (w_tile_at(ws, lx, ly) != tile) continue;
        }
        cand[i] = idx;
    }
    *left = cand[0];
    *above = cand[1];
}

/* ---------------- bin helpers ---------------- */
static int w_trunc_bin(Decoder *d, int max_symbol)
{
    int thresh = w_ilog2(max_symbol);
    int val = 1 << thresh;
    int b = max_symbol - val;
    int symbol = thresh ? (int)dec_bins_ep(d, thresh) : 0;
    if (symbol >= val - b) {
        symbol = (symbol << 1) + dec_bin_ep(d);
        symbol -= val - b;
    }
    return symbol;
}

static int w_unary_max_eqprob(Decoder *d, int max_symbol)
{
    for (int k = 0; k < max_symbol; k++)
        if (!dec_bin_ep(d)) return k;
    return max_symbol;
}

static int w_unary_max_symbol(Decoder *d, int ctx0, int ctxn, int max_symbol)
{
    int ones = 0;
    while (ones < max_symbol && dec_bin(d, ones == 0 ? ctx0 : ctxn))
        ones++;
    return ones;
}

static int w_exp_golomb_eqprob(Decoder *d, int count)
{
    int symbol = 0, bit = 1;
    while (bit) {
        bit = dec_bin_ep(d);
        symbol += bit << count;
        count++;
    }
    count--;
    if (count) symbol += (int)dec_bins_ep(d, count);
    return symbol;
}

/* ---------------- SAO / ALF CTU syntax ---------------- */
#define SAO_STRIDE 24 /* 3 comps x (mode, type, band, o0..o3, pad) */
#define ALF_STRIDE 8

static int w_sao_nb_avail(Walk *ws, int nx, int ny, int cx, int cy)
{
    if (nx < 0 || ny < 0) return 0;
    int idx = w_cu_at(ws, nx, ny, 0);
    if (idx < 0) return 0;
    const int32_t *cr = CRR(ws, idx);
    return cr[CU_SLICE_IDX] == WPAR(ws, WP_SLICE_IDX)
           && w_tile_at(ws, nx, ny) == w_tile_at(ws, cx, cy);
}

static void w_sao_ctu(Walk *ws, int cx, int cy)
{
    Decoder *d = ws->dec;
    int ctu = WPAR(ws, WP_CTU_SIZE);
    int w_ctu = WPAR(ws, WP_PIC_W_CTU);
    int rx = cx / ctu, ry = cy / ctu;
    int addr = ry * w_ctu + rx;
    int32_t *rec = ws->sao_rec + (size_t)addr * SAO_STRIDE;
    memset(rec, 0, sizeof(int32_t) * SAO_STRIDE);
    ws->ctu_flags[addr] |= 1;
    int luma_on = WPAR(ws, WP_SAO_LUMA);
    int chroma_on = WPAR(ws, WP_SAO_CHROMA) && WPAR(ws, WP_NUM_COMP) > 1;
    if (!luma_on && !chroma_on) return;

    int left_ok = rx > 0 && w_sao_nb_avail(ws, cx - 1, cy, cx, cy);
    int above_ok = ry > 0 && w_sao_nb_avail(ws, cx, cy - 1, cx, cy);
    int merge = -1;
    if (left_ok) merge += dec_bin(d, CTX_SaoMergeFlag);
    if (merge < 0 && above_ok) merge += dec_bin(d, CTX_SaoMergeFlag) << 1;
    if (merge >= 0) {
        int src_addr = merge == 0 ? addr - 1 : addr - w_ctu;
        const int32_t *src = ws->sao_rec + (size_t)src_addr * SAO_STRIDE;
        for (int c = 0; c < 3; c++)
            if ((c == 0 && luma_on) || (c > 0 && chroma_on))
                memcpy(rec + c * 8, src + c * 8, sizeof(int32_t) * 8);
        return;
    }

    int max_q = WPAR(ws, WP_SAO_MAX_Q);
    int c0 = luma_on ? 0 : 1;
    int c1 = chroma_on ? 3 : 1;
    for (int comp = c0; comp < c1; comp++) {
        int32_t *p = rec + comp * 8; /* mode, type, band, o0..o3 */
        if (comp != 2) {
            if (dec_bin(d, CTX_SaoTypeIdx)) {
                p[0] = 1;
                p[1] = dec_bin_ep(d) ? 0 : 4;
            }
        } else {
            p[0] = rec[1 * 8 + 0];
            p[1] = rec[1 * 8 + 1];
        }
        if (p[0] == 0) continue;
        int offs[4];
        for (int k = 0; k < 4; k++)
            offs[k] = w_unary_max_eqprob(d, max_q);
        if (p[1] == 4) { /* band offset */
            for (int k = 0; k < 4; k++)
                if (offs[k] && dec_bin_ep(d)) offs[k] = -offs[k];
            p[2] = (int)dec_bins_ep(d, 5);
        } else { /* edge offset */
            if (comp != 2)
                p[1] = (int)dec_bins_ep(d, 2);
            else
                p[1] = rec[1 * 8 + 1];
        }
        for (int k = 0; k < 4; k++) p[3 + k] = offs[k];
    }
}

static int w_alf_filter_idx(Walk *ws)
{
    Decoder *d = ws->dec;
    int num_aps = WPAR(ws, WP_NUM_ALF_APS);
    int use_prev = 0;
    if (num_aps > 0)
        use_prev = dec_bin(d, CTX_AlfUseTemporalFilt);
    if (use_prev) {
        int idx = 0;
        if (num_aps > 1) idx = w_trunc_bin(d, num_aps);
        return idx + 16;
    }
    return w_trunc_bin(d, 16);
}

static void w_alf_ctu(Walk *ws, int cx, int cy)
{
    Decoder *d = ws->dec;
    int ctu = WPAR(ws, WP_CTU_SIZE);
    int w_ctu = WPAR(ws, WP_PIC_W_CTU);
    int rx = cx / ctu, ry = cy / ctu;
    int addr = ry * w_ctu + rx;
    int32_t *cur = ws->alf_rec + (size_t)addr * ALF_STRIDE;
    memset(cur, 0, sizeof(int32_t) * ALF_STRIDE);
    ws->ctu_flags[addr] |= 2;
    static const int32_t zero[ALF_STRIDE] = {0};
    const int32_t *left = zero, *above = zero;
    if (rx > 0 && w_sao_nb_avail(ws, cx - 1, cy, cx, cy))
        left = ws->alf_rec + (size_t)(addr - 1) * ALF_STRIDE;
    if (ry > 0 && w_sao_nb_avail(ws, cx, cy - 1, cx, cy))
        above = ws->alf_rec + (size_t)(addr - w_ctu) * ALF_STRIDE;

    int alf_en[3] = {WPAR(ws, WP_ALF_EN0), WPAR(ws, WP_ALF_EN1),
                     WPAR(ws, WP_ALF_EN2)};
    if (alf_en[0]) {
        int ncomp = WPAR(ws, WP_NUM_COMP) > 1 ? 3 : 1;
        for (int comp = 0; comp < ncomp; comp++) {
            if (!alf_en[comp]) continue;
            int ctx_inc = (left[comp] & 1) + (above[comp] & 1);
            cur[comp] = dec_bin(d, CTX_ctbAlfFlag + comp * 3 + ctx_inc);
            if (comp == 0 && cur[0])
                cur[3] = w_alf_filter_idx(ws);
            if (comp > 0 && cur[comp]) {
                int n_alts = WPAR(ws, WP_ALF_N_ALTS);
                int decoded = 0;
                while (decoded < n_alts - 1
                       && dec_bin(d, CTX_ctbAlfAlternative + comp - 1))
                    decoded++;
                cur[4 + comp - 1] = decoded;
            }
        }
    }
    for (int comp = 1; comp < WPAR(ws, WP_NUM_COMP); comp++) {
        int cc_on = comp == 1 ? WPAR(ws, WP_CCALF_CB) : WPAR(ws, WP_CCALF_CR);
        if (!cc_on) continue;
        int ctx_inc = (left[6 + comp - 1] ? 1 : 0)
                      + (above[6 + comp - 1] ? 1 : 0) + (comp == 2 ? 3 : 0);
        int count = comp == 1 ? WPAR(ws, WP_CC_COUNT_CB)
                              : WPAR(ws, WP_CC_COUNT_CR);
        int idc = dec_bin(d, CTX_CcAlfFilterControlFlag + ctx_inc);
        if (idc)
            while (idc != count && dec_bin_ep(d))
                idc++;
        cur[6 + comp - 1] = idc;
    }
}

/* ---------------- residual coding (regular), writes into the plane ------ */
static void w_residual_reg(Walk *ws, int32_t *tu, const int32_t *cu, int comp)
{
    Decoder *d = ws->dec;
    int ch = comp == 0 ? 0 : 1;
    int x0 = tu[TUF_BX0 + comp * 4], y0 = tu[TUF_BY0 + comp * 4];
    int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
    int log2_w = w_ilog2(w), log2_h = w_ilog2(h);
    int lg_cw = SBB_W[log2_w][log2_h], lg_ch = SBB_H[log2_w][log2_h];
    int log2_cg = lg_cw + lg_ch;
    int w_clip = w_min(32, w), h_clip = w_min(32, h);
    int w_groups = w_clip >> lg_cw, h_groups = h_clip >> lg_ch;
    int max_num_coeff = w * h;
    const int32_t *scan = g_wscan[log2_w][log2_h];
    const int32_t *scan_cg = g_wscan_cg[log2_w][log2_h];
    int bdpcm = comp == 0 ? cu[CU_BDPCM] : cu[CU_BDPCM_C];
    int mts = tu[TUF_MTS0 + comp];
    long long state_trans = WPAR(ws, WP_DEP_QUANT) ? W_DQ_TRANS : 0;
    int max_log2_tr = WPAR(ws, WP_MAX_LOG2_TR_RANGE);

    int max_last_x = GROUP_IDX_T[w_clip - 1];
    int max_last_y = GROUP_IDX_T[h_clip - 1];
    int last_ctx_x, last_ctx_y, last_shift_x, last_shift_y;
    if (ch == 0) {
        last_ctx_x = CTX_LastX0 + LAST_PREFIX_CTX_T[log2_w];
        last_ctx_y = CTX_LastY0 + LAST_PREFIX_CTX_T[log2_h];
        last_shift_x = (log2_w + 1) >> 2;
        last_shift_y = (log2_h + 1) >> 2;
    } else {
        last_ctx_x = CTX_LastX1;
        last_ctx_y = CTX_LastY1;
        last_shift_x = w_max(0, w_min(2, w >> 3));
        last_shift_y = w_max(0, w_min(2, h >> 3));
    }
    const int sig_base[3] = {ch ? CTX_SigFlag1 : CTX_SigFlag0,
                             ch ? CTX_SigFlag3 : CTX_SigFlag2,
                             ch ? CTX_SigFlag5 : CTX_SigFlag4};
    int par_b = ch ? CTX_ParFlag1 : CTX_ParFlag0;
    int gt1_b = ch ? CTX_GtxFlag3 : CTX_GtxFlag2;
    int gt2_b = ch ? CTX_GtxFlag1 : CTX_GtxFlag0;
    int sig_grp_b = ch ? CTX_SigCoeffGroup1 : CTX_SigCoeffGroup0;

    /* ---- last significant position ---- */
    EngSt e;
    eng_load(&e, d);
    int pos_x = e_last_prefix(&e, d, last_ctx_x, last_shift_x, max_last_x);
    int pos_y = e_last_prefix(&e, d, last_ctx_y, last_shift_y, max_last_y);
    if (pos_x > 3) {
        int n = (pos_x - 2) >> 1, t = 0;
        for (int i = n - 1; i >= 0; i--)
            t += e_dec_bin_ep(&e) << i;
        pos_x = MIN_IN_GROUP_T[pos_x] + t;
    }
    if (pos_y > 3) {
        int n = (pos_y - 2) >> 1, t = 0;
        for (int i = n - 1; i >= 0; i--)
            t += e_dec_bin_ep(&e) << i;
        pos_y = MIN_IN_GROUP_T[pos_y] + t;
    }
    int blk_last = pos_x + pos_y * w;
    int scan_pos_last = g_wscan_inv[log2_w][log2_h][blk_last];

    /* per-CU residual bookkeeping (lfnst/mts gates) */
    if (mts != W_MTS_SKIP && w >= 4 && h >= 4) {
        int max_lfnst_pos = ((w == 4 && h == 4) || (w == 8 && h == 8)) ? 7
                                                                       : 15;
        if (scan_pos_last > max_lfnst_pos) {
            if (ch == 0) ws->viol_lfnst0 = 1; else ws->viol_lfnst1 = 1;
        }
        if (scan_pos_last >= 1) ws->lfnst_last = 1;
    }
    if (ch == 0 && mts != W_MTS_SKIP && scan_pos_last >= 1)
        ws->mts_last = 1;

    static _Thread_local int32_t coeff_abs[64 * 64];
    static _Thread_local int32_t tplw[64 * 64];
    {
        /* clear only rows the scan (and the +2-row template window of
         * tmpl_abs_sum) can touch: the CGs up to the last subset */
        int bb_y = 0;
        for (int si = scan_pos_last >> log2_cg; si >= 0; si--) {
            int gy = scan_cg[si] / w_groups;
            if (gy > bb_y) bb_y = gy;
        }
        int clear_rows = w_min(h, ((bb_y + 1) << lg_ch) + 2);
        memset(coeff_abs, 0, sizeof(int32_t) * (size_t)clear_rows * w);
        memset(tplw, 0, sizeof(int32_t) * (size_t)clear_rows * w);
    }
    static _Thread_local int32_t sub_positions[4096];
    static _Thread_local int32_t sub_meta[1024][4];
    int n_subsets_out = 0, pos_fill = 0;

    uint8_t sig_cg[64 * 64 / 16 + 64 + 1];
    memset(sig_cg, 0, (size_t)(w_groups * h_groups + w_groups + 1));
    int state = 0;
    int reg_bin_limit = ((w_clip * h_clip) * 28) >> 4;
    int max_cg_x = 0, max_cg_y = 0;
    int sign_hiding = WPAR(ws, WP_SDH);
    /* SBT + MTS zero-out: skip sub-blocks in the zeroed region
     * (CABACReader.cpp:2414-2425 skipBlkPreCond) */
    int skip_pre = comp == 0 && WPAR(ws, WP_MTS_EN) && cu[CU_SBT_INFO]
                   && w <= 32 && h <= 32;

    for (int subset_id = scan_pos_last >> log2_cg; subset_id >= 0;
         subset_id--) {
        int cg_pos = scan_cg[subset_id];
        int cg_y = cg_pos / w_groups;
        int cg_x = cg_pos - cg_y * w_groups;
        if (skip_pre
            && ((h == 32 && cg_y >= (16 >> lg_ch))
                || (w == 32 && cg_x >= (16 >> lg_cw))))
            continue;
        int min_sub_pos = subset_id << log2_cg;
        int max_sub_pos = min_sub_pos + (1 << log2_cg) - 1;
        int is_last_cg = (scan_pos_last >> log2_cg) == subset_id;

        int sig_group = is_last_cg || min_sub_pos == 0;
        if (!sig_group) {
            int sig_right = (cg_x + 1 < w_groups) && sig_cg[cg_pos + 1];
            int sig_lower = (cg_y + 1 < h_groups) && sig_cg[cg_pos + w_groups];
            sig_group = e_dec_bin(
                &e, d->cm
                + (size_t)(sig_grp_b + (sig_right || sig_lower)) * 8);
        }
        if (!sig_group) continue;
        sig_cg[cg_pos] = 1;
        if (cg_x > max_cg_x) max_cg_x = cg_x;
        if (cg_y > max_cg_y) max_cg_y = cg_y;
        if (ch == 0 && (cg_x > 3 || cg_y > 3)) ws->viol_mts = 1;

        int first_sig_pos = is_last_cg ? scan_pos_last : max_sub_pos;
        int next_sig_pos = first_sig_pos;
        int infer_sig_pos = (next_sig_pos == scan_pos_last)
                                ? next_sig_pos
                                : (subset_id != 0 ? min_sub_pos : -1);
        int num_nonzero = 0;
        int32_t *positions = sub_positions + pos_fill;
        uint32_t sub1_pattern = 0;
        int gt1_positions[64];
        uint32_t gt2_mask = 0;
        int num_gt1 = 0;
        int first_nz = next_sig_pos, last_nz = -1;
        int tmpl_cp_diag = -1, tmpl_cp_sum1 = -1;

        while (next_sig_pos >= min_sub_pos && reg_bin_limit >= 4) {
            int blk_pos = scan[next_sig_pos];
            int sig_flag = (num_nonzero == 0 && next_sig_pos == infer_sig_pos);
            if (!sig_flag) {
                int py = blk_pos >> log2_w;
                int px = blk_pos & (w - 1);
                int diag = px + py;
                int tpl_val = tplw[blk_pos];
                int num_pos = tpl_val >> 5;
                int sum_abs = tpl_val & 31;
                int ctx_ofs = (sum_abs + 1) >> 1;
                if (ctx_ofs > 3) ctx_ofs = 3;
                ctx_ofs += (diag < 2) ? 4 : 0;
                if (ch == 0) ctx_ofs += (diag < 5) ? 4 : 0;
                tmpl_cp_diag = diag;
                tmpl_cp_sum1 = sum_abs - num_pos;
                int st = state - 1;
                if (st < 0) st = 0;
                sig_flag = e_dec_bin(&e, d->cm + (size_t)(sig_base[st] + ctx_ofs) * 8);
                reg_bin_limit -= 1;
            }
            if (sig_flag) {
                int off;
                if (tmpl_cp_diag != -1) {
                    off = (tmpl_cp_sum1 < 4 ? tmpl_cp_sum1 : 4) + 1;
                    if (tmpl_cp_diag == 0)
                        off += (ch == 0) ? 15 : 5;
                    else if (ch == 0)
                        off += (tmpl_cp_diag < 3)
                                   ? 10
                                   : ((tmpl_cp_diag < 10) ? 5 : 0);
                } else {
                    off = 0;
                }
                sub1_pattern = ((state >> 1) & 1) | (sub1_pattern << 1);
                positions[num_nonzero++] = blk_pos;
                first_nz = next_sig_pos;
                if (next_sig_pos > last_nz) last_nz = next_sig_pos;
                int gt1 = e_dec_bin(&e, d->cm + (size_t)(gt1_b + off) * 8);
                reg_bin_limit -= 1;
                int abs_val;
                if (gt1) {
                    int par = e_dec_bin(&e, d->cm + (size_t)(par_b + off) * 8);
                    num_gt1 += 1;
                    reg_bin_limit -= 1;
                    int gt2 = e_dec_bin(&e, d->cm + (size_t)(gt2_b + off) * 8);
                    gt2_mask |= (uint32_t)gt2 << (num_gt1 - 1);
                    reg_bin_limit -= 1;
                    gt1_positions[num_gt1 - 1] = blk_pos;
                    abs_val = 2 + par + (gt2 << 1);
                    state = (int)((state_trans >> ((state << 2) + (par << 1)))
                                  & 3);
                } else {
                    abs_val = 1;
                    state = (int)((state_trans >> ((state << 2) + 2)) & 3);
                }
                coeff_abs[blk_pos] = abs_val;
                int py = blk_pos >> log2_w;
                int px = blk_pos & (w - 1);
                int upd = 32 + abs_val;
                if (py > 1) tplw[blk_pos - 2 * w] += upd;
                if (py > 0 && px > 0) tplw[blk_pos - w - 1] += upd;
                if (py > 0) tplw[blk_pos - w] += upd;
                if (px > 1) tplw[blk_pos - 2] += upd;
                if (px > 0) tplw[blk_pos - 1] += upd;
            } else {
                state = (int)((state_trans >> (state << 2)) & 3);
            }
            next_sig_pos -= 1;
        }

        uint32_t gmask = gt2_mask;
        for (int k = 0; k < num_gt1; k++) {
            if (gmask & 1) {
                int bp = gt1_positions[k];
                int sum_all = tmpl_abs_sum(bp, coeff_abs, w, h, log2_w, 4);
                int rice = GO_RICE_PARS_T[sum_all];
                int rem = e_dec_rem_abs(&e, rice, COEF_REMAIN_BIN_REDUCTION,
                                        max_log2_tr);
                coeff_abs[bp] += rem << 1;
            }
            gmask >>= 1;
        }

        while (next_sig_pos >= min_sub_pos) {
            int sub1 = (state >> 1) & 1;
            int blk_pos = scan[next_sig_pos];
            int sum_all = tmpl_abs_sum(blk_pos, coeff_abs, w, h, log2_w, 0);
            int rice = GO_RICE_PARS_T[sum_all];
            int pos0 = (state < 2 ? 1 : 2) << rice;
            int rem = e_dec_rem_abs(&e, rice, COEF_REMAIN_BIN_REDUCTION,
                                    max_log2_tr);
            int tcoeff = (rem == pos0) ? 0 : (rem < pos0 ? rem + 1 : rem);
            state = (int)((state_trans >> ((state << 2) + ((tcoeff & 1) << 1)))
                          & 3);
            if (tcoeff) {
                coeff_abs[blk_pos] = tcoeff;
                sub1_pattern = sub1 | (sub1_pattern << 1);
                positions[num_nonzero++] = blk_pos;
                first_nz = next_sig_pos;
                if (next_sig_pos > last_nz) last_nz = next_sig_pos;
            }
            next_sig_pos -= 1;
        }

        int hide = sign_hiding && (last_nz - first_nz >= SBH_THRESHOLD)
                   && !bdpcm;
        int num_signs = (hide && num_nonzero > 0) ? num_nonzero - 1
                                                  : num_nonzero;
        uint32_t sign_pattern = e_dec_bins_ep(&e, num_signs);
        if (num_nonzero > num_signs) {
            int sum_abs_cg = 0;
            for (int k = 0; k < num_nonzero; k++)
                sum_abs_cg += coeff_abs[positions[k]];
            sign_pattern = (sign_pattern << 1) + (sum_abs_cg & 1);
        }
        if (num_nonzero > 0) {
            sub_meta[n_subsets_out][0] = num_nonzero;
            sub_meta[n_subsets_out][1] = (int32_t)sign_pattern;
            sub_meta[n_subsets_out][2] = (int32_t)sub1_pattern;
            sub_meta[n_subsets_out][3] = pos_fill;
            n_subsets_out += 1;
            pos_fill += num_nonzero;
        }
    }
    eng_store(d, &e);

    int max_x_px, max_y_px;
    if (bdpcm) {
        max_x_px = w; max_y_px = h;
    } else {
        max_x_px = (max_cg_x + 1) << lg_cw;
        max_y_px = (max_cg_y + 1) << lg_ch;
    }
    /* reference parity: depQuant writeback gated on mts != SKIP
     * (CABACReader.cpp:2460) */
    int dep_quant = WPAR(ws, WP_DEP_QUANT) && mts != W_MTS_SKIP;
    int32_t *plane = ws->coef[comp];
    int stride = ws->coefw[comp];
    for (int yy = 0; yy < max_y_px; yy++)
        memset(plane + (size_t)(y0 + yy) * stride + x0, 0,
               sizeof(int32_t) * max_x_px);
    for (int si = n_subsets_out - 1; si >= 0; si--) {
        int nnz = sub_meta[si][0];
        uint32_t sign_pattern = (uint32_t)sub_meta[si][1];
        uint32_t sub1_pattern = (uint32_t)sub_meta[si][2];
        const int32_t *positions = sub_positions + sub_meta[si][3];
        for (int k = nnz - 1; k >= 0; k--) {
            int bp = positions[k];
            int px = bp & (w - 1);
            int py = bp >> log2_w;
            int abs_c = coeff_abs[bp];
            if (dep_quant) abs_c = 2 * abs_c - (int)(sub1_pattern & 1);
            plane[(size_t)(y0 + py) * stride + x0 + px] =
                (sign_pattern & 1) ? -abs_c : abs_c;
            sign_pattern >>= 1;
            sub1_pattern >>= 1;
        }
    }
    if (scan_pos_last == 0) {
        tu[TUF_MSX0 + comp] = 0;
        tu[TUF_MSY0 + comp] = 0;
    } else {
        tu[TUF_MSX0 + comp] = max_x_px - 1;
        tu[TUF_MSY0 + comp] = max_y_px - 1;
    }
}

/* ---------------- residual coding (transform skip) ---------------- */
static void w_residual_ts(Walk *ws, int32_t *tu, const int32_t *cu, int comp)
{
    Decoder *d = ws->dec;
    EngSt e;
    eng_load(&e, d);
    int x0 = tu[TUF_BX0 + comp * 4], y0 = tu[TUF_BY0 + comp * 4];
    int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
    int log2_w = w_ilog2(w), log2_h = w_ilog2(h);
    int lg_cw = SBB_W[log2_w][log2_h], lg_ch = SBB_H[log2_w][log2_h];
    int log2_cg = lg_cw + lg_ch;
    int w_groups = w >> lg_cw, h_groups = h >> lg_ch;
    const int32_t *scan = g_wscan[log2_w][log2_h];
    const int32_t *scan_cg = g_wscan_cg[log2_w][log2_h];
    int max_num_coeff = w * h;
    int bdpcm = comp == 0 ? cu[CU_BDPCM] : cu[CU_BDPCM_C];
    int max_log2_tr = WPAR(ws, WP_MAX_LOG2_TR_RANGE);

    static int64_t coeff[64 * 64];
    memset(coeff, 0, sizeof(int64_t) * max_num_coeff);
    int num_ctx_bins = (max_num_coeff * 7) >> 2;
    int max_x = 0, max_y = 0;
    uint8_t sig_cg[64 * 64 / 16 + 64 + 1];
    memset(sig_cg, 0, (size_t)(w_groups * h_groups + w_groups + 1));
    int any_sig_group = 0;
    int last_subset = (max_num_coeff - 1) >> log2_cg;

    int32_t *plane = ws->coef[comp];
    int stride = ws->coefw[comp];
    for (int yy = 0; yy < h; yy++)
        memset(plane + (size_t)(y0 + yy) * stride + x0, 0,
               sizeof(int32_t) * w);

    for (int subset_id = 0; subset_id <= last_subset; subset_id++) {
        int cg_pos = scan_cg[subset_id];
        int cg_y = cg_pos / w_groups;
        int cg_x = cg_pos - cg_y * w_groups;
        int min_pos = subset_id << log2_cg;
        int max_pos = min_pos + (1 << log2_cg) - 1;

        int sig_group = (subset_id == last_subset) && !any_sig_group;
        if (!sig_group) {
            int sig_left = cg_x > 0 && sig_cg[cg_pos - 1];
            int sig_above = cg_y > 0 && sig_cg[cg_pos - w_groups];
            sig_group = e_dec_bin(&e, d->cm + (size_t)(CTX_TsSigCoeffGroup + sig_left + sig_above) * 8);
        }
        if (!sig_group) continue;
        sig_cg[cg_pos] = 1;
        any_sig_group = 1;

        int infer_sig_pos = max_pos;
        int num_nonzero = 0;
        int sig_blk_pos[64];
        uint64_t sign_pattern = 0;
        int last_pass1 = -1, last_pass2 = -1;

        int next_pos = min_pos;
        while (next_pos <= max_pos && num_ctx_bins >= 4) {
            int blk = scan[next_pos];
            int py = blk >> log2_w, px = blk & (w - 1);
            int sig = (num_nonzero == 0 && next_pos == infer_sig_pos);
            if (!sig) {
                int npos = (px > 0 && coeff[blk - 1] != 0)
                           + (py > 0 && coeff[blk - w] != 0);
                sig = e_dec_bin(&e, d->cm + (size_t)(CTX_TsSigFlag + npos) * 8);
                num_ctx_bins -= 1;
            }
            if (sig) {
                int64_t right = px > 0 ? coeff[blk - 1] : 0;
                int64_t below = py > 0 ? coeff[blk - w] : 0;
                int sctx;
                if ((right == 0 && below == 0) || right * below < 0)
                    sctx = 0;
                else if (right >= 0 && below >= 0)
                    sctx = 1;
                else
                    sctx = 2;
                if (bdpcm) sctx += 3;
                int sign = e_dec_bin(&e, d->cm + (size_t)(CTX_TsResidualSign + sctx) * 8);
                num_ctx_bins -= 1;
                sign_pattern += (uint64_t)sign << num_nonzero;
                sig_blk_pos[num_nonzero++] = blk;
                int nlrg;
                if (bdpcm)
                    nlrg = 3;
                else
                    nlrg = (px > 0 && coeff[blk - 1] != 0)
                           + (py > 0 && coeff[blk - w] != 0);
                int gt1 = e_dec_bin(&e, d->cm + (size_t)(CTX_TsLrg1Flag + nlrg) * 8);
                num_ctx_bins -= 1;
                int par = 0;
                if (gt1) {
                    par = e_dec_bin(&e, d->cm + (size_t)(CTX_TsParFlag) * 8);
                    num_ctx_bins -= 1;
                }
                coeff[blk] = (int64_t)(sign ? -1 : 1) * (1 + par + gt1);
            }
            last_pass1 = next_pos;
            next_pos += 1;
        }

        /* pass 2: greater-x bins */
        int pos = min_pos;
        while (pos <= max_pos && num_ctx_bins >= 4) {
            int blk = scan[pos];
            int cutoff = 2;
            if (coeff[blk] < 0) coeff[blk] = -coeff[blk];
            for (int i = 0; i < 4; i++) {
                if (coeff[blk] >= cutoff) {
                    int g = e_dec_bin(&e, d->cm + (size_t)(CTX_TsGtxFlag + (cutoff >> 1)) * 8);
                    coeff[blk] += (int64_t)g << 1;
                    num_ctx_bins -= 1;
                }
                cutoff += 2;
            }
            last_pass2 = pos;
            pos += 1;
        }

        /* pass 3: remainders */
        for (pos = min_pos; pos <= max_pos; pos++) {
            int blk = scan[pos];
            int cutoff = pos <= last_pass2 ? 10 : (pos <= last_pass1 ? 2 : 0);
            if (coeff[blk] < 0) coeff[blk] = -coeff[blk];
            if (coeff[blk] >= cutoff) {
                int rem = e_dec_rem_abs(&e, 1, COEF_REMAIN_BIN_REDUCTION,
                                      max_log2_tr);
                coeff[blk] += pos <= last_pass1 ? ((int64_t)rem << 1)
                                                : (int64_t)rem;
                if (coeff[blk] && pos > last_pass1) {
                    int sign = e_dec_bin_ep(&e);
                    sign_pattern += (uint64_t)sign << num_nonzero;
                    sig_blk_pos[num_nonzero++] = blk;
                }
            }
            if (!bdpcm && cutoff) {
                if (coeff[blk] > 0) {
                    int py = blk >> log2_w, px = blk & (w - 1);
                    int64_t right = px > 0 ? (coeff[blk - 1] < 0
                                                  ? -coeff[blk - 1]
                                                  : coeff[blk - 1])
                                           : 0;
                    int64_t below = py > 0 ? (coeff[blk - w] < 0
                                                  ? -coeff[blk - w]
                                                  : coeff[blk - w])
                                           : 0;
                    int64_t pred1 = right > below ? right : below;
                    int64_t v = coeff[blk];
                    if (v == 1 && pred1 > 0)
                        coeff[blk] = pred1;
                    else
                        coeff[blk] = v - (v <= pred1);
                }
            }
        }

        /* final signs */
        for (int k = 0; k < num_nonzero; k++) {
            int blk = sig_blk_pos[k];
            int64_t val = coeff[blk];
            if ((sign_pattern >> k) & 1) val = -val;
            coeff[blk] = val;
            int py = blk >> log2_w, px = blk & (w - 1);
            if (px > max_x) max_x = px;
            if (py > max_y) max_y = py;
            plane[(size_t)(y0 + py) * stride + x0 + px] = (int32_t)val;
        }
    }

    eng_store(d, &e);
    if (bdpcm) {
        tu[TUF_MSX0 + comp] = w;
        tu[TUF_MSY0 + comp] = h;
    } else {
        tu[TUF_MSX0 + comp] = max_x;
        tu[TUF_MSY0 + comp] = max_y;
    }
}
