#!/usr/bin/env python3
"""Dev-time extraction of the ALF constant tables (ITU-T H.266 Tables 43/44:
fixed filter coefficients and class-to-filter mapping) from the reference
decoder's data file.  Run: python tools/extract_alf_tables.py"""

import re

import numpy as np

SRC = "/root/reference/source/Lib/CommonLib/AdaptiveLoopFilter.cpp"
DST = "vvdec_tpu/ops/tables_alf.npz"


def grab(text, name, shape):
    m = re.search(re.escape(name) + r"[^=]*=\s*\{(.*?)\n\};", text, re.S)
    body = re.sub(r"//[^\n]*", "", m.group(1))
    nums = [int(v) for v in re.findall(r"-?\d+", body)]
    return np.array(nums, dtype=np.int32).reshape(shape)


def main():
    text = open(SRC).read()
    out = {
        "FIXED_FILTER_COEFF": grab(
            text, "AdaptiveLoopFilter::m_fixedFilterSetCoeff[", (64, 13)),
        "CLASS_TO_FILTER": grab(
            text, "AdaptiveLoopFilter::m_classToFilterMapping[", (16, 25)),
        "CLIP_VALUES": grab(text, "AdaptiveLoopFilter::m_alfClippVls[", (3, 4)),
    }
    for k, v in out.items():
        print(k, v.shape, v.flat[:6])
    assert out["CLASS_TO_FILTER"].max() == 63
    assert out["CLIP_VALUES"][2, 0] == 1024
    np.savez_compressed(DST, **out)
    print("wrote", DST)


if __name__ == "__main__":
    main()
