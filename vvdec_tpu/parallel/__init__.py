"""Parallel decode: device-mesh sharding + host GOP parallelism.

TPU-native counterparts of the reference's parallelism inventory
(SURVEY.md §2.6): row sharding with halo exchange (P3), frame-axis data
parallelism (P2), and IRAP-segment parallel decode across workers/hosts
(distributed P2, BASELINE config 5).
"""

from vvdec_tpu.parallel.gop import (  # noqa: F401
    decode_annexb_parallel,
    make_worker_pool,
    split_irap_segments,
)
from vvdec_tpu.parallel.sharding import (  # noqa: F401
    frame_parallel,
    halo_map_rows,
    make_decode_mesh,
    vertical_121,
)
