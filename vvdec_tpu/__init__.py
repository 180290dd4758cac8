"""vvdec_tpu — a TPU-native VVC (H.266) Main10 decoder.

Brand-new framework with the capabilities of fraunhoferhhi/vvdec, re-designed
for TPU hardware:

- **Host plane** (Python / C-extension, scalar): Annex-B / NAL / RBSP handling,
  high-level syntax (HLS) parsing, CABAC entropy decoding, and motion / partition
  derivation.  The host plane emits *batched per-frame tensors*: dense CTU-tiled
  coefficient planes, per-4x4 mode / MV / QP / boundary-strength maps, and
  per-CTU filter parameters.
- **Device plane** (JAX / XLA / Pallas, batched): a whole-frame stage pipeline —
  dequant + inverse transform -> inter MC -> intra wavefront -> LMCS ->
  deblock -> SAO -> ALF — all fixed-point int16/int32 for bit-exactness with
  the VVC conformance suite.

Reference behavioral blueprint: /root/reference (vvdec), see SURVEY.md.
"""

__version__ = "0.1.0"

import os as _os

# The host plane's numpy work is all small strided views; BLAS worker
# threads only spin (blas_thread_server showed up at ~15% of decode CPU
# in profiles) and steal cores from the parse/recon overlap.  Pin BLAS
# to one thread unless the user chose otherwise, BEFORE numpy loads.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

from vvdec_tpu.api import Decoder, DecoderParams, Frame  # noqa: F401
