/* Native intra fast-path descriptor build.
 *
 * C port of NativeFastPath.__init__'s per-TU descriptor loop
 * (vvdec_tpu/frame/recon_native.py) operating on the syntax walk's flat
 * CU/TU records: fills the TD tensor (stride 42, layout documented there)
 * and the per-CU meta table consumed by the C intra recon engine
 * (native/recon.c).  Mode resolution / reference-filter decisions are
 * parity with recon_np.final_mode / use_filtered_refs
 * (getFinalIntraMode UnitTools.cpp:595, useFilteredIntraRefSamples
 * IntraPrediction.cpp:1299) and TrQuant::getTrTypes (TrQuant.cpp:330).
 *
 * #included by cabac.c after walk4.c.
 */

#define TD_STRIDE 54
#define TD_COMP_BASE 6
#define TD_COMP_STRIDE 16
#define TD_F_ELIG 1
#define TD_F_COMP0 2
#define TD_F_CHROMA 4
#define TD_F_DEPQ 8

/* g_chroma422IntraAngleMappingTable (Rom.cpp:392) */
static const int8_t CHROMA422_MAP_T[67] = {
    0, 1, 61, 62, 63, 64, 65, 66, 2, 3, 5, 6, 8, 10, 12, 13, 14, 16,
    18, 20, 22, 23, 24, 26, 28, 30, 31, 33, 34, 35, 36, 37, 38, 39,
    40, 41, 41, 42, 43, 43, 44, 44, 45, 45, 46, 47, 48, 48, 49, 49,
    50, 51, 51, 52, 52, 53, 54, 55, 55, 56, 56, 57, 57, 58, 59, 59, 60};
static const int16_t ANG_TABLE_T[32] = {
    0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32, 35, 39, 45,
    51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512, 1024};
static const int8_t IF_THRESH_LUMA[8] = {24, 24, 24, 14, 2, 0, 0, 0};

/* g_lfnstLut (intra mode incl. extended wide-angle -> transform set) */
static const int8_t LFNST_LUT_T[97] = {
    0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 0, 0};

/* LFNST kernel-bank offset + meta for one component, or -1 when LFNST
 * does not apply (lfnst_params, TrQuant::xInvLfnst mode derivation).
 * intra_mode: the LFNST mode basis (planar for MIP luma, co-located
 * luma for LM chroma, final 422-mapped mode otherwise). */
static int td_lfnst(int lfnst_idx, int intra_mode, int w, int h,
                    int *meta_out)
{
    int wide = intra_mode;
    if (intra_mode >= 2) {
        static const int mode_shift[6] = {0, 6, 10, 12, 14, 15};
        int delta = w_ilog2(w) - w_ilog2(h);
        if (delta < 0) delta = -delta;
        if (w > h && intra_mode < 2 + mode_shift[delta])
            wide = intra_mode + (W_VDIA - 1);
        else if (h > w && intra_mode > W_VDIA - mode_shift[delta])
            wide = intra_mode - (W_VDIA + 1);
    }
    int lfnst_mode;
    if (wide < 0)
        lfnst_mode = wide + 14 + 67;
    else if (wide >= 67)
        lfnst_mode = wide + 14;
    else
        lfnst_mode = wide;
    int transpose = (lfnst_mode >= 81) || (lfnst_mode > 34 && lfnst_mode < 67);
    int sb8 = (w >= 8 && h >= 8);
    int zero16 = !((w == 4 && h == 4) || (w == 8 && h == 8));
    int set = LFNST_LUT_T[lfnst_mode];
    int off = sb8 ? 2048 + (set * 2 + lfnst_idx - 1) * 768
                  : (set * 2 + lfnst_idx - 1) * 256;
    *meta_out = transpose | (sb8 << 1) | (zero16 << 2);
    return off;
}

static int td_wide_angle(int w, int h, int mode)
{
    if (mode > W_DC && mode <= W_VDIA) {
        static const int mode_shift[6] = {0, 6, 10, 12, 14, 15};
        int delta = w_ilog2(w) - w_ilog2(h);
        if (delta < 0) delta = -delta;
        if (w > h && mode < 2 + mode_shift[delta])
            mode += W_VDIA - 1;
        else if (h > w && mode > W_VDIA - mode_shift[delta])
            mode -= W_VDIA - 1;
    }
    return mode;
}

static int td_use_filtered(int w, int h, int mode)
{
    /* gate set: no mrl/bdpcm/isp/mip (excluded by the TU eligibility) */
    if (mode == W_DC) return 0;
    if (mode == W_PLANAR) return w * h > 32;
    int pm = td_wide_angle(w, h, mode);
    int d1 = pm - W_HOR, d2 = pm - W_VER;
    if (d1 < 0) d1 = -d1;
    if (d2 < 0) d2 = -d2;
    int diff = d1 < d2 ? d1 : d2;
    int log2_size = (w_ilog2(w) + w_ilog2(h)) >> 1;
    int ang = pm >= 34 ? pm - W_VER : -(pm - W_HOR);
    if (ang < 0) ang = -ang;
    int abs_ang = ANG_TABLE_T[ang];
    return diff > IF_THRESH_LUMA[log2_size] && (abs_ang & 0x1F) == 0;
}

/* transform-matrix bank id (recon_native._matrix_bank ordering) */
static int td_tr_id(int kind /*0 DCT2, 1 DST7, 2 DCT8*/, int n)
{
    if (kind == 0) return w_ilog2(n) - 1;        /* 2..64 -> 0..5 */
    if (kind == 1) return 6 + w_ilog2(n) - 2;    /* 4..32 -> 6..9 */
    return 10 + w_ilog2(n) - 2;                  /* 4..32 -> 10..13 */
}

/* build_intra_td(td w* i32[n_tus*42], cu_meta w* i32[n_cus*6],
 *   cu_rec y*, tu_rec y*, n_cus, n_tus, sl_dq y* u8, n_slices,
 *   cu_map y* i32, chroma_fmt, pic_w, pic_h, sub_w, sub_h, num_comp,
 *   mts_enabled, explicit_mts_intra, qp_bd_offset) */
static PyObject *mod_build_intra_td(PyObject *self, PyObject *args)
{
    Py_buffer b_td, b_meta, b_cu, b_tu, b_dq, b_cum;
    int n_cus, n_tus, n_slices, fmt, pic_w, pic_h, sub_w, sub_h, num_comp;
    int mts_en, mts_intra, qp_bd;
    if (!PyArg_ParseTuple(args, "w*w*y*y*iiy*iy*iiiiiiiii",
                          &b_td, &b_meta, &b_cu, &b_tu, &n_cus, &n_tus,
                          &b_dq, &n_slices, &b_cum, &fmt, &pic_w, &pic_h,
                          &sub_w, &sub_h, &num_comp, &mts_en, &mts_intra,
                          &qp_bd))
        return NULL;
    int32_t *td = (int32_t *)b_td.buf;
    int32_t *meta = (int32_t *)b_meta.buf;
    const int32_t *cu_rec = (const int32_t *)b_cu.buf;
    const int32_t *tu_rec = (const int32_t *)b_tu.buf;
    const uint8_t *sl_dq = (const uint8_t *)b_dq.buf;
    const int32_t *cu_map = (const int32_t *)b_cum.buf;
    int w4 = pic_w >> 2;

    memset(td, 0, (size_t)n_tus * TD_STRIDE * sizeof(int32_t));
    for (int i = 0; i < n_cus; i++) {
        const int32_t *cu = cu_rec + (size_t)i * CU_NF;
        int32_t *m = meta + (size_t)i * 6;
        m[0] = cu[CU_X]; m[1] = cu[CU_Y];
        m[2] = cu[CU_CX]; m[3] = cu[CU_CY];
        m[4] = cu[CU_SLICE_IDX]; m[5] = cu[CU_TILE_IDX];
    }

    for (int i = 0; i < n_tus; i++) {
        const int32_t *tu = tu_rec + (size_t)i * TUF_NF;
        const int32_t *cu = cu_rec + (size_t)tu[TUF_CU_IDX] * CU_NF;
        int32_t *d = td + (size_t)i * TD_STRIDE;
        d[1] = tu[TUF_CU_IDX];
        if (tu[TUF_BW0] != 0) {
            d[2] = tu[TUF_BX0]; d[3] = tu[TUF_BY0];
            d[4] = tu[TUF_BW0]; d[5] = tu[TUF_BH0];
        } else {
            d[2] = tu[TUF_BX1] * sub_w; d[3] = tu[TUF_BY1] * sub_h;
            d[4] = tu[TUF_BW1] * sub_w; d[5] = tu[TUF_BH1] * sub_h;
        }
        if (cu[CU_PRED_MODE] != W_MODE_INTRA
            || cu[CU_ISP] || cu[CU_MULTI_REF] || cu[CU_BDPCM]
            || cu[CU_BDPCM_C] || tu[TUF_JOINT_CBCR])
            continue;
        int flags = TD_F_ELIG;
        int sl = cu[CU_SLICE_IDX];
        if (sl >= 0 && sl < n_slices && sl_dq[sl])
            flags |= TD_F_DEPQ;
        int comps[3];
        int n_comps = 0;
        if (tu[TUF_BW0] != 0 && cu[CU_HAS_LUMA]) {
            comps[n_comps++] = 0;
            flags |= TD_F_COMP0;
        }
        if (tu[TUF_BW1] != 0 && cu[CU_HAS_CHROMA] && num_comp > 1) {
            comps[n_comps++] = 1;
            comps[n_comps++] = 2;
            flags |= TD_F_CHROMA;
        }
        int ok = n_comps > 0;
        for (int k = 0; k < n_comps && ok; k++) {
            int comp = comps[k];
            int x = tu[TUF_BX0 + comp * 4], y = tu[TUF_BY0 + comp * 4];
            int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
            if (w < 2 || h < 2 || w > 64 || h > 64) {
                ok = 0;
                break;
            }
            /* final_mode */
            int mode;
            int colocated_luma = -1; /* co-located luma mode (LM/DM) */
            if (comp == 0) {
                mode = cu[CU_INTRA_DIR0];
            } else {
                mode = cu[CU_INTRA_DIR1];
                if (mode == W_DM) {
                    const int32_t *src = cu;
                    if (cu[CU_TREE_TYPE] == W_TREE_C || !cu[CU_HAS_LUMA]) {
                        int lx = (cu[CU_CX] + (cu[CU_CW] >> 1)) * sub_w;
                        int ly = (cu[CU_CY] + (cu[CU_CH] >> 1)) * sub_h;
                        int li = (lx >= 0 && ly >= 0 && lx < pic_w
                                  && ly < pic_h)
                                     ? cu_map[(size_t)(ly >> 2) * w4
                                              + (lx >> 2)]
                                     : -1;
                        src = li >= 0 ? cu_rec + (size_t)li * CU_NF : NULL;
                    }
                    mode = (src == NULL || src[CU_MIP_FLAG])
                               ? W_PLANAR : src[CU_INTRA_DIR0];
                }
                /* co-located luma mode before the 422 remap: the LFNST
                 * mode basis for LM chroma (lfnst_params) */
                {
                    const int32_t *src2 = cu;
                    if (cu[CU_TREE_TYPE] == W_TREE_C || !cu[CU_HAS_LUMA]) {
                        int lx = (cu[CU_CX] + (cu[CU_CW] >> 1)) * sub_w;
                        int ly = (cu[CU_CY] + (cu[CU_CH] >> 1)) * sub_h;
                        int li = (lx >= 0 && ly >= 0 && lx < pic_w
                                  && ly < pic_h)
                                     ? cu_map[(size_t)(ly >> 2) * w4
                                              + (lx >> 2)]
                                     : -1;
                        src2 = li >= 0 ? cu_rec + (size_t)li * CU_NF : NULL;
                    }
                    colocated_luma = (src2 == NULL || src2[CU_MIP_FLAG])
                                         ? W_PLANAR : src2[CU_INTRA_DIR0];
                }
                if (fmt == 2 && mode < W_NUM_LUMA)
                    mode = CHROMA422_MAP_T[mode];
            }
            int special = 0; /* SP_NONE */
            int is_mip = comp == 0 && cu[CU_MIP_FLAG];
            int is_cclm = 0;
            if (is_mip) {
                special = 2; /* SP_MIP */
                mode = cu[CU_INTRA_DIR0];
            } else if (mode >= W_NUM_LUMA) {
                if (mode > 69) { /* DM already resolved; 67..69 = CCLM */
                    ok = 0;
                    break;
                }
                special = 3; /* SP_CCLM */
                is_cclm = 1;
            }
            int cbf = tu[TUF_CBF0 + comp];
            int is_ts = cbf && tu[TUF_MTS0 + comp] == W_MTS_SKIP;
            if (is_ts)
                special |= 16; /* TS residual, pred kind unchanged */
            int32_t *cd = d + TD_COMP_BASE + comp * TD_COMP_STRIDE;
            cd[0] = x; cd[1] = y; cd[2] = w; cd[3] = h;
            cd[4] = cbf;
            cd[5] = mode;
            cd[6] = (comp == 0 && !is_mip) ? td_use_filtered(w, h, mode)
                                           : 0;
            cd[7] = comp == 0 ? tu[TUF_QP] + qp_bd : tu[TUF_CQP0 + comp - 1];
            cd[8] = tu[TUF_MSX0 + comp];
            cd[9] = tu[TUF_MSY0 + comp];
            cd[12] = special;
            cd[13] = -1;
            cd[15] = is_mip
                         ? (cu[CU_MIP_TRANSPOSE] != 0)
                               | ((w == 4 && h == 4            ? 0
                                   : (w == 4 || h == 4
                                      || (w == 8 && h == 8))   ? 1
                                                               : 2)
                                  << 1)
                         : 0;
            if (cbf && !is_ts) {
                /* getTrTypes under this gate set (no isp/sbt) */
                int hk = 0, vk = 0; /* DCT2 */
                if (mts_en && comp == 0) {
                    int mts = tu[TUF_MTS0];
                    if (!mts_intra) {
                        /* implicit MTS (not for LFNST / MIP blocks) */
                        if (!cu[CU_LFNST] && !is_mip) {
                            hk = (w >= 4 && w <= 16) ? 1 : 0;
                            vk = (h >= 4 && h <= 16) ? 1 : 0;
                        }
                    } else if (mts >= 2) {
                        hk = (mts == 2 || mts == 4) ? 1 : 2;
                        vk = (mts == 2 || mts == 3) ? 1 : 2;
                    }
                }
                cd[10] = td_tr_id(hk, w);
                cd[11] = td_tr_id(vk, h);
                if (cu[CU_LFNST]) {
                    int sep_tree = cu[CU_TREE_TYPE] != 0;
                    if (sep_tree || comp == 0) {
                        int basis;
                        if (is_mip)
                            basis = W_PLANAR;
                        else if (is_cclm)
                            basis = colocated_luma;
                        else
                            basis = mode;
                        int meta = 0;
                        cd[13] = td_lfnst(cu[CU_LFNST], basis, w, h,
                                          &meta);
                        cd[14] = meta;
                    }
                }
            }
        }
        if (ok)
            d[0] = flags;
    }

    PyBuffer_Release(&b_td);
    PyBuffer_Release(&b_meta);
    PyBuffer_Release(&b_cu);
    PyBuffer_Release(&b_tu);
    PyBuffer_Release(&b_dq);
    PyBuffer_Release(&b_cum);
    Py_RETURN_NONE;
}
