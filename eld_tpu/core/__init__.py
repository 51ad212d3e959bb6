"""Core raw-domain math: CFA packing, ISP pipeline, EMoR CRF.

Pure functions over arrays (host NumPy or device jax.numpy) with no I/O.
"""

from eld_tpu.core.packing import (  # noqa: F401
    pack_bayer,
    unpack_bayer,
    pack_xtrans,
    unpack_xtrans,
    normalize_bayer,
    crop_center,
)
from eld_tpu.core import isp  # noqa: F401
from eld_tpu.core import emor  # noqa: F401
