#!/usr/bin/env python3
"""Dev-time extraction of the RPR (reference picture resampling) MC filter
coefficients (ITU-T H.266 Tables 27-29 downsampling variants).  Standard
numeric constants parsed from the reference decoder's data file — no code
extracted.  Run: python tools/extract_rpr_tables.py"""

import re

import numpy as np

SRC = "/root/reference/source/Lib/CommonLib/InterpolationFilter.cpp"
DST = "vvdec_tpu/ops/tables_rpr.npz"


def grab(text, name, shape):
    m = re.search(re.escape(name) + r"[^=]*=\s*\{(.*?)\};", text, re.S)
    body = re.sub(r"//[^\n]*", "", m.group(1))
    nums = [int(v) for v in re.findall(r"-?\d+", body)]
    return np.array(nums, dtype=np.int32).reshape(shape)


def main():
    text = open(SRC).read()
    out = {
        "LUMA_RPR1": grab(text, "InterpolationFilter::m_lumaFilterRPR1[", (16, 8)),
        "LUMA_RPR2": grab(text, "InterpolationFilter::m_lumaFilterRPR2[", (16, 8)),
        "CHROMA_RPR1": grab(text, "InterpolationFilter::m_chromaFilterRPR1[", (32, 4)),
        "CHROMA_RPR2": grab(text, "InterpolationFilter::m_chromaFilterRPR2[", (32, 4)),
        "AFF_LUMA_RPR1": grab(text, "InterpolationFilter::m_affineLumaFilterRPR1[", (16, 8)),
        "AFF_LUMA_RPR2": grab(text, "InterpolationFilter::m_affineLumaFilterRPR2[", (16, 8)),
    }
    for k, v in out.items():
        assert np.all(v.sum(axis=1) == 64), k
    np.savez_compressed(DST, **out)
    print("wrote", DST)


if __name__ == "__main__":
    main()
