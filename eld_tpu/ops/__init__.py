from eld_tpu.ops.metrics import psnr, ssim, quality_assess  # noqa: F401
from eld_tpu.ops.correct import illuminance_correct  # noqa: F401
from eld_tpu.ops.chop import forward_chop  # noqa: F401
