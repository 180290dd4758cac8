#!/usr/bin/env python3
"""Dev-time extraction of the MC interpolation filter coefficients (ITU-T
H.266 Tables 27/28/29/33).  Standard numeric constants parsed from the
reference decoder's data file — no code extracted.
Run: python tools/extract_if_tables.py"""

import re

import numpy as np

SRC = "/root/reference/source/Lib/CommonLib/InterpolationFilter.cpp"
DST = "vvdec_tpu/ops/tables_if.npz"


def grab(text, name, shape):
    m = re.search(re.escape(name) + r"[^=]*=\s*\{(.*?)\};", text, re.S)
    body = re.sub(r"//[^\n]*", "", m.group(1))
    nums = [int(v) for v in re.findall(r"-?\d+", body)]
    return np.array(nums, dtype=np.int32).reshape(shape)


def main():
    text = open(SRC).read()
    out = {
        "LUMA_IF": grab(text, "InterpolationFilter::m_lumaFilter[", (16, 8)),
        "CHROMA_IF": grab(text, "InterpolationFilter::m_chromaFilter[", (32, 4)),
        # 6-tap filter used for 4x4 (affine) luma blocks (H.266 Table 30)
        "LUMA_IF_4X4": grab(text, "InterpolationFilter::m_lumaFilter4x4[", (16, 8)),
        # bilinear filter for DMVR pre-search (H.266 Table 31), 4-bit precision
        "BILINEAR_IF": grab(text, "InterpolationFilter::m_bilinearFilterPrec4[", (16, 2)),
    }
    for k, v in out.items():
        print(k, v.shape, "rowsum0", v[0].sum(), "rowsum1", v[1].sum())
        assert np.all(v.sum(axis=1) == (16 if k == "BILINEAR_IF" else 64))
    np.savez_compressed(DST, **out)
    print("wrote", DST)


if __name__ == "__main__":
    main()
